"""CDC merge / slowly-changing-dimension type-2 upsert (SURVEY §2.8
extended surface).

The warehouse-side half of an ingest pipeline: apply a batch of change
records (upserts + deletes) to a versioned dimension snapshot, closing
superseded versions and opening new ones. The reference's warehouse
keeps append-only bronze + recomputed views; SCD2 is the standard
generalization when history must be queryable (``AS OF`` semantics).

Scale shape: ONE equi-join on the business key between the *open*
slice of the dimension and the change batch, then unions of narrow
projections — no window, no secondary shuffle. History rows pass
through untouched (at rest they'd live in closed partitions the merge
never rewrites — partition the stored table by ``is_current`` /
``valid_to IS NULL`` so the merge reads only the open slice). The
join side sizes are data-dependent: change batches are usually tiny
relative to the dimension, and AQE picks broadcast at runtime; no
explicit hint so a backfill-sized batch degrades to a shuffle join
instead of OOMing the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: Change-record operation codes.
OP_UPSERT = "U"
OP_DELETE = "D"


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: Sequence[str],
    change_ts: Column,
) -> DataFrame:
    """Apply one change batch to an SCD2 table.

    ``current`` — the dimension with ``key``, ``tracked`` columns, and
    SCD2 bookkeeping (``valid_from``, ``valid_to``, ``is_current``).
    ``changes`` — one row per changed key: ``key``, ``tracked``, and
    ``op`` (``'U'`` upsert / ``'D'`` delete). ``change_ts`` — the
    batch's effective timestamp (becomes ``valid_to`` of closed rows
    and ``valid_from`` of opened ones).

    Semantics per open row / change pair (NULL-safe value compare):

    - upsert with any tracked value changed → close old + open new
    - upsert with identical values → keep (idempotent replay)
    - delete → close old, open nothing
    - upsert for an unknown key → open new (first version)
    - delete for an unknown key → no-op
    - history (non-current) rows → untouched pass-through
    """
    cur_open = current.filter(F.col("is_current"))
    history = current.filter(~F.col("is_current"))

    chg = changes.select(
        F.col(key).alias("_k"),
        *[F.col(t).alias(f"_c_{t}") for t in tracked],
        "op",
    )
    j = cur_open.join(chg, cur_open[key] == chg["_k"], "full_outer")

    old_vals = F.struct(*[F.col(t) for t in tracked])
    new_vals = F.struct(*[F.col(f"_c_{t}") for t in tracked])
    differs = ~old_vals.eqNullSafe(new_vals)
    has_cur = F.col(key).isNotNull()
    has_chg = F.col("_k").isNotNull()

    closed = j.filter(
        has_cur
        & has_chg
        & (
            (F.col("op") == OP_DELETE)
            | ((F.col("op") == OP_UPSERT) & differs)
        )
    ).select(
        F.col(key),
        *[F.col(t) for t in tracked],
        F.col("valid_from"),
        change_ts.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    kept_open = j.filter(
        has_cur
        & (~has_chg | ((F.col("op") == OP_UPSERT) & ~differs))
    ).select(
        F.col(key),
        *[F.col(t) for t in tracked],
        F.col("valid_from"),
        F.col("valid_to"),
        F.col("is_current"),
    )
    opened = j.filter(
        (F.col("op") == OP_UPSERT) & (~has_cur | differs)
    ).select(
        F.col("_k").alias(key),
        *[F.col(f"_c_{t}").alias(t) for t in tracked],
        change_ts.alias("valid_from"),
        F.lit(None).cast(cur_open.schema["valid_to"].dataType).alias(
            "valid_to"
        ),
        F.lit(True).alias("is_current"),
    )
    return history.select(*closed.columns).unionByName(closed).unionByName(
        kept_open
    ).unionByName(opened)


def scd2_as_of(dim: DataFrame, ts: Column) -> DataFrame:
    """Point-in-time (``AS OF``) read over an SCD2 table: the version of
    each key whose validity interval contains ``ts`` —
    ``valid_from <= ts < valid_to`` with an open ``valid_to`` meaning
    "still current". Keys deleted before ``ts`` (or first seen after)
    produce no row.

    One narrow filter over the dimension scan — with the table stored
    partitioned on ``is_current`` / bucketed on the key, the common
    "as of now" case prunes to the open slice and a historical read
    scans only closed partitions. Never a window: SCD2 validity
    intervals are disjoint per key by construction, so the filter
    alone picks at most one version per key.
    """
    return dim.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (ts < F.col("valid_to")))
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols=None,
) -> DataFrame:
    """Snapshot diff between two versions of a keyed table: which keys
    were ADDED, REMOVED, or CHANGED (payload differs) — the reviewable
    changelog behind an SCD2 merge (``scd2_apply`` consumes changes;
    this PRODUCES them from two full snapshots, the pattern for
    sources that cannot emit a change stream).

    Scale shape: both sides project to (key, payload-hash) BEFORE the
    join — one narrow md5 over the JSON encoding of the compare-column
    struct — so the full-outer join moves two hash columns, never the
    payloads; the single exchange pair is key-partitioned and
    AQE-sized. Unchanged keys are filtered out (the overwhelming
    majority between adjacent snapshots), so the output is
    changes-sized, not table-sized. Hashing ``to_json(struct(...))``
    instead of a delimited concat makes the fingerprint structurally
    collision-safe: field names separate columns (no ("a","b") vs
    ("ab","") shift) and a NULL column is OMITTED from the JSON, so no
    sentinel string a real value could equal exists at all.

    Side presence is tested on the HASH columns (md5 output is never
    NULL), so rows whose key itself is NULL still classify by
    presence instead of being misread as added.

    Output: (key, change_type), change_type in added|removed|changed.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != key_col]

    def fp(df: DataFrame) -> DataFrame:
        payload = F.struct(*[F.col(c) for c in compare_cols])
        return df.select(
            F.col(key_col).alias("key"),
            F.md5(F.to_json(payload)).alias("h"),
        )

    o = fp(old).alias("o")
    n = fp(new).alias("n")
    joined = o.join(n, F.col("o.key").eqNullSafe(F.col("n.key")), "full_outer")
    change = (
        F.when(F.col("o.h").isNull(), F.lit("added"))
        .when(F.col("n.h").isNull(), F.lit("removed"))
        .when(F.col("o.h") != F.col("n.h"), F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col("n.key"), F.col("o.key")).alias("key"),
        change.alias("change_type"),
    ).filter(F.col("change_type").isNotNull())

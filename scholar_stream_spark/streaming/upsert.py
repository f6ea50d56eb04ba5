"""Streaming CDC upsert: maintain an SCD2 dimension table from a
change stream (SURVEY §2.8 CDC surface, streaming half).

Structured Streaming cannot express a keyed merge as a native sink
(that needs a table format with transactional rewrite), so the
Spark-idiomatic shape is ``foreachBatch`` + ``cdc.scd2_apply``: each
micro-batch of change records is merged into the current dimension
snapshot and the snapshot is atomically swapped. This is exactly the
pattern Delta/Iceberg ``MERGE INTO`` runs under the hood — here the
table format is plain parquet, so the swap is a versioned-directory
flip (write v{n+1}, then repoint), which keeps readers consistent and
makes replay idempotent (``scd2_apply`` is a no-op on an
already-applied batch).

Scale notes: the per-batch merge is one equi-join of the open slice
vs the batch (AQE broadcasts small batches); the dimension rewrite is
the real cost at scale — with a transactional table format you'd
rewrite only matched files. The versioned flip is the honest parquet
analog, and the operator's contract (one merged SCD2 snapshot per
batch, idempotent on replay) is format-independent.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import StreamingQuery

from scholar_stream_spark.operators.cdc import scd2_apply

_VERSION_FILE = "_CURRENT_VERSION"


def current_version(dim_path: str) -> int:
    """Resolve the version pointer (one read — callers that need the
    snapshot AND its number must not re-read the pointer, or a
    concurrent advance could make the two disagree)."""
    with open(os.path.join(dim_path, _VERSION_FILE)) as fh:
        return int(fh.read().strip())


def read_dim(
    spark: SparkSession, dim_path: str, version: int | None = None
) -> DataFrame:
    """Read an SCD2 snapshot: the current one (follows the version
    pointer) or, for time travel, any still-retained ``version`` —
    merged snapshots are immutable once written, so an old version is
    a consistent table, not a best-effort reconstruction."""
    if version is None:
        version = current_version(dim_path)
    return spark.read.parquet(os.path.join(dim_path, f"v{version}"))


def init_dim(dim: DataFrame, dim_path: str) -> None:
    """Materialize the initial snapshot as version 0."""
    os.makedirs(dim_path, exist_ok=True)
    dim.write.mode("overwrite").parquet(os.path.join(dim_path, "v0"))
    _write_version(dim_path, 0)


def _write_version(dim_path: str, version: int) -> None:
    tmp = os.path.join(dim_path, _VERSION_FILE + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(dim_path, _VERSION_FILE))  # atomic flip


def start_scd2_upsert(
    changes_stream: DataFrame,
    dim_path: str,
    checkpoint_path: str,
    key: str,
    tracked: Sequence[str],
    ts_col: str = "change_ts",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Merge a change stream into the SCD2 dimension at ``dim_path``.

    ``changes_stream`` carries ``key``, ``tracked``, ``op`` ('U'/'D')
    and ``ts_col`` (the change's effective timestamp; the batch's MAX
    stamps the merged versions, so replays of the same data produce
    the same timestamps — never wall clock). A micro-batch holding
    several changes for one key (slow trigger, redelivery folding
    logical batches together) is collapsed per key to the max-``ts_col``
    change before merging — ``scd2_apply`` requires one row per key.
    The checkpoint makes delivery at-least-once; the idempotent merge
    upgrades that to effectively-once for the table state.
    """
    spark = changes_stream.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # collapse to ONE change per key (last writer by change_ts wins):
        # scd2_apply's contract is one row per key, and a redelivery or a
        # slow trigger can legitimately fold several logical batches into
        # one micro-batch — without this, a twice-changed key would merge
        # as two simultaneous opens (two is_current rows: corruption)
        w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc("op"))
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        batch_ts = batch_df.agg(F.max(ts_col)).first()[0]
        # resolve the pointer ONCE: the snapshot read and the version we
        # advance to must come from the same observation
        version = current_version(dim_path)
        current = read_dim(spark, dim_path, version=version)
        merged = scd2_apply(
            current,
            batch_df.drop(ts_col),
            key=key,
            tracked=list(tracked),
            change_ts=F.lit(batch_ts).cast(current.schema["valid_from"].dataType),
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(dim_path, f"v{version + 1}")
        )
        _write_version(dim_path, version + 1)

    writer = changes_stream.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vacuum_dim(dim_path: str, keep_last: int = 2) -> list[int]:
    """Retention for the versioned dimension: delete snapshot
    directories older than the ``keep_last`` most recent (the current
    version is always retained). Returns the removed version numbers.

    Safe by construction: the pointer is read once, only versions
    strictly below ``current - keep_last + 1`` are touched, and
    readers that resolved the pointer before the vacuum still see a
    fully-written (immutable) snapshot unless they raced the retention
    window itself — the same contract as Delta's VACUUM horizon.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    import shutil  # noqa: PLC0415

    cur = current_version(dim_path)
    versions = sorted(
        int(name[1:])
        for name in os.listdir(dim_path)
        if name.startswith("v") and name[1:].isdigit()
    )
    removed = []
    for version in versions:  # numeric order (lexicographic puts v10 < v2)
        if version <= cur - keep_last:
            shutil.rmtree(os.path.join(dim_path, f"v{version}"))
            removed.append(version)
    return removed

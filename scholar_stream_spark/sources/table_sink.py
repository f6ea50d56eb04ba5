"""Partitioned table writes — the silver/gold sink discipline
(SURVEY §2.1 sink surface, generalized beyond the NDJSON wire).

At 100 TB the WRITE layout decides later read cost, and the default
``df.write.partitionBy(...)`` has a trap: every task holds an open file
per partition value it sees, so T tasks × P partitions = T×P small
files (and T×P open file handles). The fix is structural, not a config:
repartition BY the partition columns first, so each partition value
lands in few tasks, then cap rows per file for bounded memory at read
time. ``sortWithinPartitions`` adds clustering (e.g. by a join/filter
key) so min/max parquet stats actually prune.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    max_records_per_file: int | None = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partitioned parquet table with small-file
    discipline: shuffle rows to their partition first (bounded file
    count), optionally cluster within files, cap rows per file.

    AQE's coalescing keeps the pre-write shuffle from producing tiny
    tasks; a skewed partition value still splits across tasks (and
    therefore files), which is correct — one giant file would serialize
    the read instead.
    """
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_cols).parquet(path)

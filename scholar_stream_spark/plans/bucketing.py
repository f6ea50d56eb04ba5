"""Bucketed tables: shuffle-free co-located joins and aggregations.

The single biggest shuffle lever at 100 TB: a fact table that is
repeatedly joined or aggregated on one key (orders⋈customer on
custkey, events grouped by user) should be *stored* pre-partitioned on
that key. Spark's bucketing (`bucketBy` on a saved table) records the
hash-partitioning in the catalog; later joins between two tables
bucketed on the same key with compatible bucket counts — and
aggregations on the bucket key — reuse the stored distribution and
plan with NO Exchange on the bucketed side. The shuffle is paid once
at write time, amortized over every downstream read.

Mechanics that matter (and are asserted in tests):

- both sides bucketed on the join key, bucket counts equal (or one a
  divisor of the other with ``spark.sql.bucketing.coalesceBucketsInJoin
  .enabled``) → SortMergeJoin with zero Exchange;
- ``sortBy`` within buckets additionally drops the per-task Sort for
  SMJ at read time when one bucket maps to one file;
- bucket pruning: an equality filter on the bucket key scans 1/N of
  the files (``spark.sql.sources.bucketing.enabled`` on by default).

Bucketed tables require the session catalog (``saveAsTable``) — plain
``.parquet(path)`` writes lose the bucket spec.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) catalog table.

    One shuffle now (repartition by the bucket column so each bucket is
    written by one task — without it every task writes a file per
    bucket: T×N small files), zero shuffles later for joins/aggs on
    ``bucket_col``.
    """
    writer = (
        df.repartition(n_buckets, df[bucket_col])
        .write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-key bucketed tables — plans with no Exchange on
    either side (asserted in ``tests/test_bucketing.py``)."""
    return spark.table(left_table).join(spark.table(right_table), on)

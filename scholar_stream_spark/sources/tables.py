"""Type-adaptive loaders for the benchmark parquet tables.

The generated ``events.parquet`` has shipped with two different ``ts``
physical types across testdata generations: TIMESTAMP(NANOS) (which
Spark's reader only surfaces as int64 via the ``nanosAsLong`` legacy
conf) and plain ``timestamp[us]``. ``load_events`` sniffs the landed
dtype after the read and floor-converts nanos→micros only when the
column actually arrived as ``bigint`` — matching DuckDB's ns→µs
truncation on its view — so the same code path works against either
generation. All other tables are plain parquet reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read ``{sf_dir}/events.parquet`` with a normalized timestamp ``ts``.

    Works whether the file carries int64 nanos (legacy TIMESTAMP(NANOS))
    or a plain parquet timestamp; the output ``ts`` is always
    ``timestamp`` at microsecond precision.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # Streaming watermarks require TIMESTAMP (not NTZ); the session
        # timezone is pinned UTC (session.py), so this cast relabels the
        # type without shifting any wall-clock value.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read any benchmark table; routes ``events`` through ``load_events``."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

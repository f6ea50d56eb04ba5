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
    # The legacy conf is a session-global: set it only for this read and
    # restore the prior value so later TIMESTAMP(NANOS) parquet reads in
    # the same session keep whatever behavior the caller configured.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # force schema resolution while the conf is active; the physical
        # scan re-reads the footer lazily but the resolved schema (and
        # our dtype branch below) is what the plan locks in
        dtype = dict(df.dtypes).get("ts")
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
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

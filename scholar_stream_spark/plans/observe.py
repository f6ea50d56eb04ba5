"""In-flight pipeline metrics via Spark's Observation API.

Accounting (``streaming/accounting.py``) counts batches at the sink;
``observe()`` instruments a DataFrame IN the plan, so quality counters
(rows, null keys, out-of-range values) are collected during the write
itself — zero extra scans, zero extra actions. At 100 TB a separate
``df.count()`` for metrics is a full second pass over the table; an
observation is free.

Usage::

    df, obs = with_quality_observation(df, key_col="work_id")
    df.write.parquet(path)        # one pass: data + metrics
    stats = obs.get               # {'n_rows': ..., 'n_null_key': ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def with_quality_observation(
    df: DataFrame, key_col: str, name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-key / distinct-ish counters to ``df``'s
    plan. Returns the observed DataFrame (use it in place of ``df``)
    and the ``Observation`` — read ``obs.get`` AFTER the first action.
    """
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(key_col).isNull(), 1).otherwise(0)
        ).alias("n_null_key"),
    )
    return observed, obs

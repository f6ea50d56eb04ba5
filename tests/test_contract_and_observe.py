"""Driver-contract self-consistency + Observation metrics.

The contract test guards the failure mode the driver can't report
nicely: an ``oracle_sql()`` key with no matching query (dead oracle),
or an undocumented rows-only query silently diluting the checked set.
"""

from __future__ import annotations

import os
import re

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

from scholar_stream_spark.plans.observe import with_quality_observation

#: Queries deliberately without an oracle — must match the module
#: docstring's documented list (see __spark_entry__.py header).
DOCUMENTED_ROWS_ONLY = {
    "synthetic_email",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_lsh_recall",
    "ann_ivf_recall",
    "value_percentiles_sketch",
    "distinct_users_sketch",
    "cluster_embeddings",
    "semantic_prune",
}


def test_contract_consistency():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # every oracle has a query (no dead oracle entries)
    assert set(oracles) <= set(queries), set(oracles) - set(queries)
    # every oracle-less query is a documented exception
    rows_only = set(queries) - set(oracles)
    assert rows_only == DOCUMENTED_ROWS_ONLY, (
        f"undocumented rows-only queries: {rows_only ^ DOCUMENTED_ROWS_ONLY}"
    )
    # documented exceptions appear in the module docstring
    doc = entry_mod.__doc__
    for name in DOCUMENTED_ROWS_ONLY:
        assert name in doc, f"{name} missing from the docstring rationale"
    # no duplicate-ish aliases: every oracle is non-empty SQL
    for name, sql in oracles.items():
        assert re.search(r"SELECT", sql, re.IGNORECASE), name


def test_observation_collects_during_single_pass(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (None, "d")], "k long, v string"
    )
    observed, obs = with_quality_observation(df, key_col="k")
    observed.write.mode("overwrite").parquet(str(tmp_path / "obs_out"))
    stats = obs.get
    assert stats["n_rows"] == 4
    assert stats["n_null_key"] == 1
    # data written intact alongside the metrics
    assert spark.read.parquet(str(tmp_path / "obs_out")).count() == 4

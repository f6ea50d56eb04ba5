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

def documented_rows_only() -> set[str]:
    """The rows-only allowlist, parsed from the ``__spark_entry__``
    module docstring's "Deliberately WITHOUT oracle entries" section —
    the single source of truth. Each section bullet names the excepted
    queries in double backticks before its em-dash rationale, so adding
    a rows-only query without documenting it (or vice versa) fails the
    contract test with no second constant to hand-sync (the round-6 red
    test was exactly that drift)."""
    section = entry_mod.__doc__.split("Deliberately WITHOUT oracle entries")[1]
    names: set[str] = set()
    for line in section.splitlines():
        if not line.startswith("- "):
            continue
        head = line.split("—")[0]
        names.update(re.findall(r"``([a-z0-9_]+)``", head))
    return names


def test_contract_consistency():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # every oracle has a query (no dead oracle entries)
    assert set(oracles) <= set(queries), set(oracles) - set(queries)
    # every oracle-less query is a documented exception
    rows_only = set(queries) - set(oracles)
    documented = documented_rows_only()
    assert documented, "docstring rows-only section parsed to nothing"
    assert rows_only == documented, (
        f"rows-only queries out of sync with the docstring rationale: "
        f"{rows_only ^ documented}"
    )
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

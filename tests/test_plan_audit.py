"""Fleet-wide physical-plan audit over EVERY entry query.

The per-operator tests pin specific plan shapes (broadcasts, zero-Exchange
bucketed joins, no-cartesian fuzzy dedup). This audit is the blanket
scale gate: no query in ``queries()`` may plan an unconditioned
``CartesianProduct`` — the one join shape that is always corpus² at
100 TB. BroadcastNestedLoopJoin is allowed only because every occurrence
in this codebase is a deliberate 1-row-aggregate broadcast (corpus total,
min/max bounds, mixture budget); a *large* BNLJ would first show up as a
CartesianProduct under AQE when the estimate flips, which this test
catches.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMALL

QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_product(name, spark):
    df = QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"

"""Fleet-wide physical-plan audit over EVERY entry query.

The per-operator tests pin specific plan shapes (broadcasts, zero-Exchange
bucketed joins, no-cartesian fuzzy dedup). This audit is the blanket
scale gate, two rules over all of ``queries()``:

1. no ``CartesianProduct`` — the one join shape that is always corpus²
   at 100 TB;
2. no UNBOUNDED ``BroadcastNestedLoopJoin`` — a BNLJ is fine exactly
   when its build side is provably tiny (every legitimate occurrence in
   this codebase is a 1-row global aggregate — corpus total, min/max
   bounds, mixture budget — or a LIMIT-bounded top-K). A BNLJ whose
   build side is an arbitrary scan would broadcast an unbounded
   relation and nested-loop the corpus against it: the audit walks the
   plan tree to the build subtree and fails unless a boundedness marker
   (keys=[] HashAggregate or a Limit) is present.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMALL

QUERIES = entry_mod.queries()

#: Build-side operators that prove the broadcast relation is bounded:
#: a global (keys=[]) HashAggregate is exactly one row; the Limit family
#: is at most its literal k rows.
_BOUNDED_BUILD_MARKERS = (
    "HashAggregate(keys=[]",
    "SortAggregate(key=[]",
    "GlobalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
)


def _children(jnode):
    seq = jnode.children()
    kids = [seq.apply(i) for i in range(seq.size())]
    if not kids:
        cls = jnode.getClass().getSimpleName()
        # wrappers that hide their subtree from children()
        if cls == "AdaptiveSparkPlanExec":
            kids = [jnode.inputPlan()]
        elif cls.endswith("QueryStageExec"):
            kids = [jnode.plan()]
    return kids


def unbounded_bnlj_builds(df) -> list[str]:
    """Build-side subtree strings of every BroadcastNestedLoopJoin in
    ``df``'s physical plan whose boundedness cannot be proven."""
    bad: list[str] = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "BroadcastNestedLoopJoinExec":
            build = (
                node.right()
                if "BuildRight" in node.buildSide().toString()
                else node.left()
            )
            s = build.toString()
            if not any(m in s for m in _BOUNDED_BUILD_MARKERS):
                bad.append(s)
        stack.extend(_children(node))
    return bad


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_unbounded_bnlj(name, spark):
    df = QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"
    bad = unbounded_bnlj_builds(df)
    assert not bad, (
        f"{name} plans a BroadcastNestedLoopJoin whose build side is not "
        f"provably bounded:\n" + "\n---\n".join(bad)
    )


def test_audit_flags_synthetic_unbounded_bnlj(spark):
    """Red test: a non-equi join against a plain (un-aggregated,
    un-limited) broadcast scan must be caught by the audit helper."""
    left = spark.range(0, 1000)
    right = spark.range(0, 50).withColumnRenamed("id", "rid")
    sneaky = left.join(right, left["id"] < right["rid"])
    assert unbounded_bnlj_builds(sneaky), (
        "audit helper failed to flag a plain-scan BNLJ build side:\n"
        + sneaky._jdf.queryExecution().executedPlan().toString()
    )


def test_audit_accepts_one_row_aggregate_bnlj(spark):
    """Green twin: the 1-row-aggregate broadcast the codebase actually
    uses (corpus total / bounds / budget) must pass."""
    from pyspark.sql import functions as F

    left = spark.range(0, 1000)
    total = spark.range(0, 50).agg(F.count(F.lit(1)).alias("n"))
    bounded = left.join(F.broadcast(total), left["id"] < total["n"])
    assert unbounded_bnlj_builds(bounded) == []

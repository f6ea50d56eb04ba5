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
3. no UNBOUNDED single-task Window (r13 verdict item 6) — a Window
   with an EMPTY partition spec serializes its whole input through one
   task, which is fine exactly when that input is a rollup (months,
   histogram buckets, dimension grids — every legitimate global window
   here runs over an aggregate) or Limit-bounded. The audit walks to
   each global Window's input subtree and fails unless an aggregate /
   Limit marker is present. Honesty limit (stated): a grouped
   aggregate on a corpus-cardinality key would pass the marker check —
   the rule is the tripwire for the WORST shape (a global window
   directly over scan/join density), the per-op scale profiles carry
   the finer guarantees.
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


#: Window-input operators that prove a single-task (empty partition
#: spec) Window runs over a rollup, not the corpus: any aggregate
#: collapses density before the window; the Limit family bounds rows.
_BOUNDED_WINDOW_MARKERS = (
    "HashAggregate(",
    "ObjectHashAggregate(",
    "SortAggregate(",
    "GlobalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
)


def unbounded_global_windows(df) -> list[str]:
    """Input subtree strings of every empty-partition-spec Window in
    ``df``'s physical plan whose input is not provably a rollup."""
    bad: list[str] = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().size() == 0:
                child_s = node.child().toString()
                if not any(
                    m in child_s for m in _BOUNDED_WINDOW_MARKERS
                ):
                    bad.append(child_s)
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
    bad_w = unbounded_global_windows(df)
    assert not bad_w, (
        f"{name} plans a single-task Window whose input is not "
        f"provably a rollup:\n" + "\n---\n".join(bad_w)
    )


def test_audit_flags_synthetic_unbounded_global_window(spark):
    """Red test: a global (no-partition) window directly over a scan
    must be caught by the audit helper."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).withColumn(
        "c", F.sum("id").over(Window.orderBy("id"))
    )
    assert unbounded_global_windows(df), (
        "audit helper failed to flag a scan-fed global window:\n"
        + df._jdf.queryExecution().executedPlan().toString()
    )


def test_audit_accepts_rollup_fed_global_window(spark):
    """Green twin: the rollup-then-window shape the codebase actually
    uses (months / histogram buckets / dimension grids) must pass."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    grid = (
        spark.range(0, 1000)
        .groupBy((F.col("id") % 10).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df = grid.withColumn("c", F.sum("n").over(Window.orderBy("k")))
    assert unbounded_global_windows(df) == []


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

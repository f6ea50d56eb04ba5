"""Data-quality profiling + constraint checks (operators/profiling.py)."""

from __future__ import annotations

import pytest

from scholar_stream_spark.operators import profiling


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 5.0), (4, "b", 7.0)],
        "k long, s string, v double",
    )
    rows = {r["col_name"]: r for r in profiling.profile_columns(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert (rows["s"]["n_nonnull"], rows["s"]["n_null"]) == (3, 1)
    assert rows["s"]["n_distinct"] == 2
    assert rows["v"]["n_distinct"] == 2
    assert rows["k"]["n_null"] == 0 and rows["k"]["n_distinct"] == 4


def test_check_constraints_null_predicate_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None)], "k long, price double"
    )
    rows = {
        r["rule"]: r
        for r in profiling.check_constraints(
            df,
            [
                ("price_nonnegative", "price >= 0"),
                ("key_positive", "k > 0"),
            ],
        ).collect()
    }
    # NULL price fails the >= 0 rule (dbt-test convention)
    assert rows["price_nonnegative"]["n_violations"] == 2
    assert not rows["price_nonnegative"]["passed"]
    assert rows["key_positive"]["n_violations"] == 0
    assert rows["key_positive"]["passed"]


def test_check_constraints_requires_rules(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="at least one rule"):
        profiling.check_constraints(df, [])


def test_profiling_is_one_pass(spark):
    """N columns / N rules must never mean N scans: exactly one scan
    node and no joins in either plan."""
    df = spark.createDataFrame(
        [(i, float(i), str(i)) for i in range(10)],
        "k long, v double, s string",
    )
    for out in (
        profiling.profile_columns(df),
        profiling.check_constraints(df, [("a", "k > 0"), ("b", "v >= 0")]),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, plan
        assert plan.count("LocalTableScan") + plan.count("Scan") <= 2, plan


def test_profiling_edge_cases(spark):
    """Empty table -> 0 violations / passed=True (not NULL/NULL), and
    non-identifier column names (spaces, quotes) must profile fine —
    names are data, not SQL identifiers."""
    empty = spark.createDataFrame([], "k long, v double")
    rows = {
        r["rule"]: r
        for r in profiling.check_constraints(
            empty, [("v_nonneg", "v >= 0")]
        ).collect()
    }
    assert rows["v_nonneg"]["n_violations"] == 0
    assert rows["v_nonneg"]["passed"] is True

    odd = spark.createDataFrame(
        [(1, 2.0)], "k long, `unit price` double"
    ).withColumnRenamed("unit price", "o'brien price")
    prof = {
        r["col_name"]: r for r in profiling.profile_columns(odd).collect()
    }
    assert set(prof) == {"k", "o'brien price"}
    assert prof["o'brien price"]["n_distinct"] == 1

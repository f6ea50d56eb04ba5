"""Data-quality profiling + constraint checking (the Deequ/dbt-test
surface a warehouse pipeline runs before publishing a table — the
batch-wide complement of ``plans/observe.py``'s in-flight counters).

Both operators are ONE map-side-combined pass over the table no matter
how many columns/rules they cover: metrics are computed as a single
wide aggregate row and unpivoted driver-free with ``stack``. At 100 TB
that property is the whole design — N rules must never mean N scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Per-column completeness/cardinality profile: row count,
    non-null count, null count, and exact distinct count for each
    requested column (default: all) — the first table a data reviewer
    asks for, and the inputs to completeness/uniqueness checks.

    ONE aggregation pass computes every column's metrics side by side
    (count/count_distinct partials combine map-side); the wide result
    row is unpivoted to (column, ...) rows with ``stack`` — a pure
    projection, no shuffle, no driver loop. Exact distinct keeps the
    profile oracle-checkable; at extreme cardinality swap
    ``approx_count_distinct`` (the ``value_percentiles`` trade).

    Output: (col_name, n_rows, n_nonnull, n_null, n_distinct), one row
    per profiled column, in the requested column order.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        # an empty list would generate malformed `stack(0, )` SQL and
        # die with an opaque parse error — fail loudly instead (the
        # check_constraints empty-rules guard, same contract)
        raise ValueError("profile_columns: need at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    # index-based aliases + escaped name literals: column names are
    # data here, not identifiers — "unit price" or "o'brien" must not
    # break the generated stack expression
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{i}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __nn_{}, __nd_{}".format(c.replace("'", "\\'"), i, i)
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, n_nonnull, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        "n_nonnull",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        "n_distinct",
    )


def check_constraints(
    df: DataFrame, rules: Sequence[tuple[str, str]]
) -> DataFrame:
    """Declarative table constraints: each rule is (name, SQL predicate
    every row must satisfy); the result reports per-rule violation
    counts and a pass verdict. A NULL predicate counts as a violation
    (``o_totalprice >= 0`` is NOT satisfied by a NULL price — the
    dbt-test convention), via ``NOT coalesce(pred, FALSE)``.

    All rules fold into ONE aggregate pass (conditional sums combine
    map-side) and unpivot with ``stack`` — adding a rule never adds a
    scan. Returns (rule, n_rows, n_violations, passed) in rule order.
    """
    if not rules:
        raise ValueError("check_constraints: need at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(rules):
        aggs.append(
            # outer coalesce: sum over ZERO rows is NULL, and an empty
            # table must report 0 violations / passed, not NULL / NULL
            F.coalesce(
                F.sum(
                    F.when(
                        ~F.coalesce(F.expr(pred), F.lit(False)), F.lit(1)
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__v_{i}")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __v_{}".format(name.replace("'", "\\'"), i)
        for i, (name, _) in enumerate(rules)
    )
    return row.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )

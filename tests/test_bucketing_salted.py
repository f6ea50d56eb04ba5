"""Bucketed co-located joins + skew-salted join equivalence.

The bucketing test asserts the PLAN, not just the result: two tables
bucketed on the join key must sort-merge-join with zero shuffle
Exchange — the stored distribution is the point. The salted-join test
pins observational equivalence with the plain join (the oracle does
the same at sf0.01; here we also check it on a constructed hot key).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators.relational import salted_join_revenue
from scholar_stream_spark.plans.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    write_bucketed(
        orders, f"{bucket_db}.orders_b", "o_custkey", 4, sort_cols=["o_custkey"]
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        f"{bucket_db}.customer_b",
        "o_custkey",
        4,
        sort_cols=["o_custkey"],
    )
    # suppress broadcast so the test exercises the co-located SMJ path
    # (at scale neither side broadcasts; locally customer is tiny)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, f"{bucket_db}.orders_b", f"{bucket_db}.customer_b", "o_custkey"
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must reuse the stored distribution"
        )
        # and the result matches the plain (shuffled) join
        plain = orders.join(
            customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_pruning_scans_subset(spark, bucket_db):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    write_bucketed(orders, f"{bucket_db}.orders_p", "o_custkey", 8)
    # autoBucketedScan turns OFF bucketed reading when no operator needs
    # the distribution — which also forfeits bucket pruning; force it on
    # for the pruning check (a real key-lookup workload would keep it on)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(f"{bucket_db}.orders_p").filter(
            F.col("o_custkey") == 7
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        # bucket pruning: the scan reads 1 of the 8 bucket files
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_salted_join_matches_plain_join_on_hot_key(spark):
    # one customer owns 80% of orders: the exact case salting exists for
    orders = spark.createDataFrame(
        [(i, 1 if i % 5 else 2, "O", float(i), None, "P") for i in range(500)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(1, "hot", 0, 0.0, "SEG_A"), (2, "cold", 0, 0.0, "SEG_B")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    salted = {
        r["c_mktsegment"]: (r["n_orders"], r["revenue"])
        for r in salted_join_revenue(orders, customer, n_salts=4).collect()
    }
    plain = {
        r["c_mktsegment"]: (r["n_orders"], r["revenue"])
        for r in (
            orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_totalprice").alias("revenue"),
            )
        ).collect()
    }
    assert salted == plain


def test_key_skew_profile_hand_computed(spark):
    """Known distribution: keys with counts 1, 1, 2, 6 -> exact
    summary row (percentiles over the per-key count multiset)."""
    from scholar_stream_spark.operators import relational

    rows = (
        [(1, "a")] + [(2, "b")] + [(3, "c")] * 2 + [(4, "d")] * 6
    )
    df = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(rows)], "row_id long, k long"
    )
    r = relational.key_skew_profile(df, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (10, 4, 6)
    # counts multiset {1,1,2,6}: p50 = 1.5 (interpolated), p90 = 4.8
    assert r["p50_count"] == 1.5
    assert r["p90_count"] == 4.8
    assert r["skew_ratio"] == round(6 * 4 / 10, 4)


def test_detect_outliers_flags_planted_anomaly(spark):
    """A planted extreme value is flagged with the right sign; the
    tight cluster around the mean is not; constant-valued types
    (sigma = 0) produce no division blowup and no rows."""
    from scholar_stream_spark.operators import relational

    rows = (
        [(i, "a", 10.0 + (i % 5) * 0.1) for i in range(40)]
        + [(100, "a", 500.0)]            # planted outlier
        + [(200 + i, "b", 7.0) for i in range(10)]  # constant type
    )
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = relational.detect_outliers(events).collect()
    assert [r["event_id"] for r in got] == [100]
    assert got[0]["z_score"] > relational.OUTLIER_Z_THRESHOLD

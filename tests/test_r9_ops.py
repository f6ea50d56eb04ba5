"""Round-9 operators: TPC-H Q17/Q21 shapes (decorrelated scalar
subquery, EXISTS/NOT-EXISTS cascade), BPE merge-pair counting,
per-source share caps, and anomaly-monitor counts compaction."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta
from decimal import Decimal

from pyspark.sql import functions as F

from scholar_stream_spark.operators import relational, sampling, textops
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: avg_quantity_gate
# ---------------------------------------------------------------------------


def test_avg_quantity_gate_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    got = relational.avg_quantity_gate(li, pt).collect()[0]["avg_yearly"]

    brand_keys = {
        r["p_partkey"]
        for r in pt.filter(F.col("p_brand") == relational.AVG_QTY_BRAND)
        .select("p_partkey")
        .collect()
    }
    rows = [
        (r["l_partkey"], int(r["l_quantity"]), r["l_extendedprice"])
        for r in li.select(
            "l_partkey", "l_quantity", "l_extendedprice"
        ).collect()
        if r["l_partkey"] in brand_keys
    ]
    sums: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for pk, q, _ in rows:
        sums[pk][0] += q
        sums[pk][1] += 1
    kept = Decimal(0)
    for pk, q, price in rows:
        s, c = sums[pk]
        if 5 * q * c < s:  # q < 0.2 * avg(q), integer-exact
            kept += Decimal(f"{price:.2f}")
    want = round(float(kept) / 7.0, 4)
    assert got == want


def test_avg_quantity_gate_plan_single_scan_no_cartesian(spark):
    """The decorrelation contract: ONE lineitem scan feeds both the
    per-part average and the gated rows (a window, not a re-scan or a
    per-row subquery); the brand key set broadcasts; no cartesian."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    plan = _plan(relational.avg_quantity_gate(li, pt))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: waiting_supplier
# ---------------------------------------------------------------------------


def _waiting_bruteforce(spark, late_days):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    odate = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in od.filter(F.col("o_orderstatus") == "F").collect()
    }
    late: dict[tuple, bool] = {}
    for r in li.select("l_orderkey", "l_suppkey", "l_shipdate").collect():
        if r["l_orderkey"] not in odate:
            continue
        key = (r["l_orderkey"], r["l_suppkey"])
        is_late = r["l_shipdate"] > odate[r["l_orderkey"]] + timedelta(
            days=late_days
        )
        late[key] = late.get(key, False) or is_late
    by_order: dict[int, list] = defaultdict(list)
    for (ok, sk), lt in late.items():
        by_order[ok].append((sk, lt))
    names = {r["s_suppkey"]: r["s_name"] for r in sp.collect()}
    numwait: dict[str, int] = defaultdict(int)
    for ok, members in by_order.items():
        for sk, lt in members:
            if not lt:
                continue
            others = [m for m in members if m[0] != sk]
            if others and not any(l for _, l in others):
                numwait[names[sk]] += 1
    ranked = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[: relational.WAITING_TOPN]


def test_waiting_supplier_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    got = [
        (r["s_name"], r["numwait"])
        for r in relational.waiting_supplier(li, od, sp).collect()
    ]
    want = _waiting_bruteforce(spark, relational.WAITING_LATE_DAYS)
    assert got == want and len(got) > 0


def test_waiting_supplier_plan_semi_anti_no_count_distinct(spark):
    """The cascade contract: EXISTS as a left-semi join, NOT EXISTS as
    a left-anti join (different-supplier condition inside the join
    predicate), no per-order count-distinct re-aggregation of
    lineitem, no cartesian."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    df = relational.waiting_supplier(li, od, sp)
    df.collect()  # materialize the lazy localCheckpoint
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "count(distinct" not in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# BPE merge pairs
# ---------------------------------------------------------------------------


def test_bpe_merge_pairs_hand_counts(spark):
    """Pair counts must equal exploding the raw corpus: weighting the
    distinct-word table by frequency is an exact refactor."""
    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab x yz")], "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["pair_count"]
        for r in textops.bpe_merge_pairs(docs).collect()
    }
    # ab x3, abc x1 -> (a,b): 4; abc -> (b,c): 1; yz -> (y,z): 1
    assert got == {("a", "b"): 4, ("b", "c"): 1, ("y", "z"): 1}


def test_bpe_merge_pairs_topn_order(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rows = textops.bpe_merge_pairs(docs, top_n=10).collect()
    assert len(rows) == 10
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # deterministic tiebreak: equal counts are (a, b)-ascending
    for prev, cur in zip(rows, rows[1:]):
        if prev["pair_count"] == cur["pair_count"]:
            assert (prev["a"], prev["b"]) < (cur["a"], cur["b"])


# ---------------------------------------------------------------------------
# Per-source share cap
# ---------------------------------------------------------------------------


def test_source_share_cap_monotone_and_binding(spark):
    """Raising the cap only ADDS documents (monotone keep-set), sources
    under the cap pass whole, and over-cap sources are thinned to
    ~cap of the total token mass."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    total = docs.select(
        F.sum(
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + F.lit(1)
        )
    ).collect()[0][0]
    lo = sampling.source_share_cap(docs, cap=0.03)
    hi = sampling.source_share_cap(docs, cap=0.06)
    lo_ids = {r["doc_id"] for r in lo.collect()}
    hi_rows = hi.collect()
    hi_ids = {r["doc_id"] for r in hi_rows}
    assert lo_ids < hi_ids  # strictly monotone on this corpus
    # 20 uniform sources at 5% each: cap=0.06 keeps everything whole,
    # cap=0.03 must thin every source
    assert len(hi_ids) == docs.count()
    per_src = defaultdict(int)
    for r in sampling.source_share_cap(docs, cap=0.03).collect():
        per_src[r["source"]] += r["n_tokens"]
    assert per_src and all(
        v <= 0.03 * total * 1.5 for v in per_src.values()
    )  # hash thinning lands near the cap (loose stochastic bound)
    assert all(v < 0.05 * total for v in per_src.values())


# ---------------------------------------------------------------------------
# Anomaly-monitor counts compaction
# ---------------------------------------------------------------------------


def test_compact_monitor_counts_preserves_state(spark, tmp_path):
    """Compaction must keep hourly totals (and hence alerts) identical,
    shrink the batch-dir count, keep the tail batch intact, and leave
    a tail-batch replay a no-op against the compacted layout."""
    from scholar_stream_spark.streaming.anomaly_monitor import (
        compact_monitor_counts,
        monitor_batch,
        read_hourly_counts,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    counts, alerts = tmp_path / "counts", tmp_path / "alerts"
    for i in range(3):
        monitor_batch(
            events.filter(F.col("event_id") % 3 == i),
            i,
            str(counts),
            str(alerts),
        )
    before_hours = sorted(
        map(tuple, read_hourly_counts(spark, str(counts)).collect())
    )
    before_alerts = sorted(
        map(tuple, spark.read.parquet(str(alerts)).collect())
    )

    compacted = tmp_path / "counts_compacted"
    compact_monitor_counts(spark, str(counts), str(compacted), keep_last=1)
    after_hours = sorted(
        map(tuple, read_hourly_counts(spark, str(compacted)).collect())
    )
    assert after_hours == before_hours
    dirs = {
        p.name for p in compacted.iterdir() if p.name.startswith("batch=")
    }
    assert dirs == {"batch=1", "batch=2"}  # 0+1 folded under 1, tail kept

    # tail-batch replay against the compacted layout: self-exclusion
    # still works (batch=2 kept its identity), alerts unchanged
    alerts2 = tmp_path / "alerts2"
    monitor_batch(
        events.filter(F.col("event_id") % 3 == 2),
        2,
        str(compacted),
        str(alerts2),
    )
    assert sorted(
        map(tuple, spark.read.parquet(str(alerts2)).collect())
    ) == before_alerts
    assert sorted(
        map(tuple, read_hourly_counts(spark, str(compacted)).collect())
    ) == before_hours

"""Round-9 second wave: TPC-H Q22/Q11/Q2 shapes (scalar-subquery +
anti-join cascade, HAVING-vs-total, argmin-payload min), iterative BPE
training, and the PSI population-drift screen."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from scholar_stream_spark.operators import profiling, relational, textops
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: idle_customers
# ---------------------------------------------------------------------------


def test_idle_customers_matches_bruteforce(spark):
    cu = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    got = [
        (r["c_mktsegment"], r["n_custs"], r["total_acctbal"])
        for r in relational.idle_customers(cu, od).collect()
    ]

    rows = cu.collect()
    pos = [Decimal(f"{r['c_acctbal']:.2f}") for r in rows if r["c_acctbal"] > 0]
    sm, n = sum(pos), len(pos)
    urgent = {
        r["o_custkey"]
        for r in od.filter(
            F.col("o_orderpriority") == relational.IDLE_EXCLUDED_PRIORITY
        ).collect()
    }
    seg: dict[str, list] = defaultdict(lambda: [0, Decimal(0)])
    for r in rows:
        if (
            Decimal(f"{r['c_acctbal']:.2f}") * n > sm
            and r["c_custkey"] not in urgent
        ):
            seg[r["c_mktsegment"]][0] += 1
            seg[r["c_mktsegment"]][1] += Decimal(f"{r['c_acctbal']:.2f}")
    want = [(s, c, float(t)) for s, (c, t) in sorted(seg.items())]
    assert got == want and len(got) > 0


def test_idle_customers_plan_anti_join_no_subquery(spark):
    """The decorrelation contract: scalar avg as a broadcast (no
    per-row subquery), NOT EXISTS as a left-anti join."""
    cu = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    plan = _plan(relational.idle_customers(cu, od))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: nation_revenue_share
# ---------------------------------------------------------------------------


def test_nation_revenue_share_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    got = [
        (r["n_name"], r["revenue"], r["share"])
        for r in relational.nation_revenue_share(li, sp, na).collect()
    ]

    nat = {r["s_suppkey"]: r["s_nationkey"] for r in sp.collect()}
    names = {r["n_nationkey"]: r["n_name"] for r in na.collect()}
    rev: dict[str, Decimal] = defaultdict(Decimal)
    cent = Decimal("0.01")
    for r in li.select("l_suppkey", "l_extendedprice", "l_discount").collect():
        # the boundary-safe money idiom: cast EACH operand to
        # DECIMAL(18,2) first (Spark's double→DECIMAL cast goes through
        # the double's shortest decimal string — repr() — then rounds
        # HALF_UP), multiply the exact decimals; never cast the double
        # product
        price = Decimal(repr(r["l_extendedprice"])).quantize(
            cent, rounding=ROUND_HALF_UP
        )
        disc = Decimal(repr(r["l_discount"])).quantize(
            cent, rounding=ROUND_HALF_UP
        )
        rev[names[nat[r["l_suppkey"]]]] += price * (1 - disc)
    total = sum(rev.values())
    micro = Decimal("0.000001")
    want = sorted(
        (
            (
                nm,
                float(v),
                float(
                    Decimal(repr(float(v) / float(total))).quantize(
                        micro, rounding=ROUND_HALF_UP
                    )
                ),
            )
            for nm, v in rev.items()
            if v * relational.SHARE_DENOM > total * relational.SHARE_NUM
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want and len(got) > 0
    # a tighter cut binds: above-average-share nations only (at this
    # tiny SF every one of the ~10 supplier nations clears 5%)
    tight = relational.nation_revenue_share(li, sp, na, num=1, denom=10)
    n_tight = tight.count()
    assert 0 < n_tight < len(rev)


def test_nation_revenue_share_plan_single_fact_scan(spark):
    """The grand total re-aggregates the ≤|nations|-row group table —
    the fact table must appear exactly once in the plan."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    plan = _plan(relational.nation_revenue_share(li, sp, na))
    # the single fact scan lives INSIDE the localCheckpointed by_nation
    # table, which the executed plan shows as `Scan ExistingRDD`: zero
    # lineitem.parquet scans remain in the outer plan (the checkpoint
    # pays the scan once), and both consumers read the checkpointed RDD
    assert plan.count("lineitem.parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: min_cost_supplier
# ---------------------------------------------------------------------------


def test_min_cost_supplier_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    rg = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    got = [
        tuple(r)
        for r in relational.min_cost_supplier(li, sp, na, rg, pt).collect()
    ]

    rk = {
        r["r_regionkey"]
        for r in rg.filter(
            F.col("r_name") == relational.MIN_COST_REGION
        ).collect()
    }
    nk = {
        r["n_nationkey"]: r["n_name"]
        for r in na.collect()
        if r["n_regionkey"] in rk
    }
    sups = {
        r["s_suppkey"]: (r["s_name"], nk[r["s_nationkey"]])
        for r in sp.collect()
        if r["s_nationkey"] in nk
    }
    best: dict[int, tuple] = {}
    for r in li.collect():
        if r["l_suppkey"] not in sups:
            continue
        cand = (r["l_extendedprice"] / r["l_quantity"], r["l_suppkey"])
        if r["l_partkey"] not in best or cand < best[r["l_partkey"]]:
            best[r["l_partkey"]] = cand
    pnames = {r["p_partkey"]: r["p_name"] for r in pt.collect()}
    # Spark F.round on a double is BigDecimal.valueOf (shortest decimal
    # string) + setScale(4, HALF_UP) — Python round() is half-even and
    # diverges on 4-decimal boundaries, so quantize HALF_UP instead
    def _r4(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )

    rows = [
        (pk, pnames[pk], *sups[sk], _r4(price))
        for pk, (price, sk) in best.items()
    ]
    rows.sort(key=lambda t: (-t[4], t[0]))
    assert got == rows[: relational.MIN_COST_TOPN] and len(got) > 0


def test_min_cost_supplier_plan_broadcasts_dims(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    rg = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    plan = _plan(relational.min_cost_supplier(li, sp, na, rg, pt))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # one lineitem scan: the argmin payload rides the min, no join-back
    assert plan.count("lineitem.parquet") == 1, plan


# ---------------------------------------------------------------------------
# Iterative BPE training
# ---------------------------------------------------------------------------


def _bpe_reference(texts: list[str], n_merges: int):
    """Pure-Python reference BPE trainer (Sennrich et al. 2016
    semantics: leftmost-nonoverlapping merge of the best pair each
    round, ties broken (count desc, pair asc), stop below count 2)."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((rank, a, b, n))
        new_vocab: Counter = Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in textops.bpe_train(docs, n_merges=6).collect()]
    want = _bpe_reference(texts, 6)
    assert got == want and len(got) == 6


def test_bpe_train_fold_is_leftmost_nonoverlapping(spark):
    """'aaaa' under merge (a,a) must become ('aa','aa') — the fold's
    tail-fuse gives reference BPE's leftmost-nonoverlapping scan, not
    a chain-merge ('aa'+'a'...)."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "aaaa")], "doc_id long, text string"
    )
    got = [tuple(r) for r in textops.bpe_train(docs, n_merges=2).collect()]
    want = _bpe_reference(["aaaa aaaa", "aaaa"], 2)
    assert got == want
    # round 1 merges (a,a) seen 3x per 'aaaa' occurrence = 9
    assert got[0][1:] == ("a", "a", 9)
    # round 2 sees ('aa','aa') 3 times — NOT ('aa','a')
    assert got[1][1:] == ("aa", "aa", 3)


def test_bpe_train_stops_when_dry(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair count is 1 (< 2): training stops before any merge
    assert textops.bpe_train(docs, n_merges=5).count() == 0


# ---------------------------------------------------------------------------
# PSI population-stability screen
# ---------------------------------------------------------------------------


def _psi_reference(rows, cutoff, n_bins):
    by_type: dict[str, dict[str, list]] = defaultdict(
        lambda: {"ref": [], "cur": []}
    )
    for ts, t, v in rows:
        if v is None:
            continue
        by_type[t]["ref" if ts < cutoff else "cur"].append(v)
    out = []
    for t, d in by_type.items():
        if not d["ref"]:
            continue  # no baseline
        vmin, vmax = min(d["ref"]), max(d["ref"])
        width = (vmax - vmin) / n_bins

        def bin_of(v):
            if width == 0:
                return 0
            return int(min(max(math.floor((v - vmin) / width), 0), n_bins - 1))

        nr, nc = [0] * n_bins, [0] * n_bins
        for v in d["ref"]:
            nr[bin_of(v)] += 1
        for v in d["cur"]:
            nc[bin_of(v)] += 1
        tr, tc = sum(nr), sum(nc)
        acc = 0
        for i in range(n_bins):
            p = (nr[i] + 1) / (tr + n_bins)
            q = (nc[i] + 1) / (tc + n_bins)
            acc += round((p - q) * math.log(p / q) * 1e9)
        out.append((t, tr, tc, round(acc / 1e9, 6)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out


def test_population_stability_matches_reference(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    got = [tuple(r) for r in profiling.population_stability(ev).collect()]
    import datetime

    cutoff = datetime.datetime.fromisoformat(profiling.PSI_CUTOFF)
    rows = [
        (r["ts"], r["event_type"], r["value"])
        for r in ev.select("ts", "event_type", "value").collect()
    ]
    want = _psi_reference(rows, cutoff, profiling.PSI_BINS)
    assert got == want and len(got) > 0


def test_population_stability_detects_planted_shift(spark):
    """A type whose current distribution shifts must score a higher
    PSI than a type drawn identically on both sides."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    cut = datetime.datetime(2024, 1, 16)
    rows = []
    for i in range(400):
        # decouple value from the time index: rows 0..199 land before
        # the cutoff, 200..399 after, and BOTH sides cover the full
        # 0..99 value grid twice — so 'stable' is genuinely identical
        # across the cut; 'shifted' moves its current half up by 50
        current = i >= 200
        ts = base + datetime.timedelta(hours=400 if current else 0)
        assert (ts >= cut) == current
        rows.append((ts, "stable", float(i % 100)))
        rows.append((ts, "shifted", float(i % 100) + (50.0 if current else 0.0)))
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    res = {
        r["event_type"]: r["psi"]
        for r in profiling.population_stability(ev).collect()
    }
    assert res["shifted"] > 0.25  # conventional alert line
    assert res["stable"] < 0.1  # conventional stable line
    assert res["shifted"] > res["stable"]


def test_population_stability_type_missing_from_reference_excluded(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [(base, "old", 1.0), (datetime.datetime(2024, 1, 20), "new", 2.0)]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    got = {r["event_type"] for r in profiling.population_stability(ev).collect()}
    assert got == {"old"}

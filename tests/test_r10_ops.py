"""Round-10 ops: BPE encode under a frozen merge table (the corpus-
scale tokenize step) and the TPC-H Q20 shape (nested IN + correlated
scalar agg, decorrelated)."""

from __future__ import annotations

import collections
import re

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from scholar_stream_spark.operators import relational, textops
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# pure-Python reference encoder (the bpe_train/bpe_word_tokens fold)
# ---------------------------------------------------------------------------


def _py_encode(word: str, merges=textops.BPE_FROZEN_MERGES) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def _py_census(texts, merges=textops.BPE_FROZEN_MERGES):
    tf: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                for tok in _py_encode(w, merges):
                    tf[tok] += 1
    return tf


#: Adversarial words: overlapping merge sites (leftmost-nonoverlap
#: boundary), multi-char merge components (scan/colum chains), merges
#: whose rank order changes the result (or before at), and words no
#: merge touches.
ADVERSARIAL_WORDS = (
    "ererer", "rrr", "atat", "ator", "sscan", "columm",
    "scancolumn", "e", "er", "partner", "lulu", "atan",
)


def test_bpe_encode_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = {
        r["token"]: r["tf"] for r in textops.bpe_encode(docs).collect()
    }
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _py_census(texts)
    assert got == dict(want) and len(got) > 0
    # output is bounded by |alphabet| + |merges| by construction
    assert len(got) <= 26 + len(textops.BPE_FROZEN_MERGES)


def test_bpe_word_tokens_adversarial(spark):
    df = spark.createDataFrame([(w,) for w in ADVERSARIAL_WORDS], "word string")
    rows = df.select(
        "word", textops.bpe_word_tokens(F.col("word")).alias("toks")
    ).collect()
    for r in rows:
        assert list(r["toks"]) == _py_encode(r["word"]), r["word"]


def test_bpe_oracle_separator_trick_equals_fold(spark):
    """The DuckDB oracle's separator-rewrite must equal the Spark fold
    on adversarial words — run the REAL oracle SQL over a crafted
    documents view and the REAL operator over the same rows."""
    texts = [" ".join(ADVERSARIAL_WORDS), "ererer sscan", "atan  ator "]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["token"]: r["tf"] for r in textops.bpe_encode(docs).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    want = dict(con.execute(entry_mod._bpe_encode_sql()).fetchall())
    assert got == want and len(got) > 0


def test_corpus_is_separator_free():
    """The oracle's chr(1) separator must not occur in the corpus at
    any SF the driver compares on."""
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet("
            f"'/root/testdata/{sf}/documents.parquet')"
            " WHERE contains(text, chr(1))"
        ).fetchone()[0]
        assert n == 0, sf


def test_bpe_encode_docs_order_and_census(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    out = textops.bpe_encode_docs(docs).collect()
    by_id = {r["doc_id"]: r for r in out}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(by_id) == set(texts)
    for did, text in texts.items():
        want: list[str] = []
        for w in re.split(r"\s+", text.strip()):
            if w:
                want.extend(_py_encode(w))
        assert list(by_id[did]["tokens"]) == want, did
        assert by_id[did]["n_tokens"] == len(want)


def test_frozen_merges_are_bpe_train_output(spark):
    """Round-trip pin: the frozen encode table IS what ``bpe_train``
    learns on the demo corpus — the first 8 frozen merges must equal an
    8-round training run (the frozen table extends it to 16)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    learned = [
        (r["a"], r["b"])
        for r in textops.bpe_train(docs, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert learned == list(textops.BPE_FROZEN_MERGES[:8])


def test_bpe_encode_plan_no_udf_no_cartesian(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(textops.bpe_encode(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the fold runs AFTER the word-frequency aggregate (vocab-sized),
    # never over raw corpus rows: the aggregate-over-words shuffle
    # exists and the explode of token arrays consumes the agg output
    assert "HashAggregate" in plan


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: surplus_suppliers
# ---------------------------------------------------------------------------


def test_surplus_suppliers_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    import datetime

    lo = datetime.datetime(relational.SURPLUS_YEAR, 1, 1)
    hi = datetime.datetime(relational.SURPLUS_YEAR + 1, 1, 1)
    avail = {
        r["p_partkey"]: r["p_size"] % relational.AVAIL_MOD
        for r in pt.collect()
        if relational.SURPLUS_PART_TOKEN in r["p_name"]
    }
    sums: dict[tuple, float] = collections.defaultdict(float)
    for r in li.collect():
        if r["l_partkey"] in avail and lo <= r["l_shipdate"] < hi:
            # quantities are integer-valued doubles; float sum is exact
            sums[(r["l_partkey"], r["l_suppkey"])] += r["l_quantity"]
    qual = {
        sk for (pk, sk), sq in sums.items() if 2 * avail[pk] > sq
    }
    nk = {
        r["n_nationkey"]
        for r in na.collect()
        if r["n_name"] == relational.SURPLUS_NATION
    }
    want = sorted(
        (r["s_suppkey"], r["s_name"])
        for r in sp.collect()
        if r["s_nationkey"] in nk and r["s_suppkey"] in qual
    )
    want.sort(key=lambda t: (t[1], t[0]))
    got = [
        (r["s_suppkey"], r["s_name"])
        for r in relational.surplus_suppliers(li, pt, sp, na).collect()
    ]
    assert got == want


def test_surplus_suppliers_nonempty_at_oracle_sf(spark):
    """The driver compares at sf0.01 — the default knobs must produce a
    non-trivial result there (not all, not none of the nation's
    suppliers), so the boundary genuinely discriminates."""
    d = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    pt = spark.read.parquet(f"{d}/part.parquet")
    sp = spark.read.parquet(f"{d}/supplier.parquet")
    na = spark.read.parquet(f"{d}/nation.parquet")
    n = relational.surplus_suppliers(li, pt, sp, na).count()
    nation_total = (
        sp.join(
            na.filter(F.col("n_name") == relational.SURPLUS_NATION),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).count()
    )
    assert 0 < n < nation_total


def test_surplus_suppliers_plan_single_scan_semi_joins(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    plan = _plan(relational.surplus_suppliers(li, pt, sp, na))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the part-name filter must be pushed to the part scan
    assert "PushedFilters" in plan


# ---------------------------------------------------------------------------
# TPC-H Q5 / Q6 / Q10 / Q16 shapes + tokenizer fertility
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402

_CENT = Decimal("0.01")


def _dec2(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(_CENT, rounding=ROUND_HALF_UP)


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def test_local_supplier_revenue_matches_bruteforce(spark):
    import datetime

    tbl = {
        t: spark.read.parquet(f"{SF_SMALL}/{t}.parquet")
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    }
    got = [
        (r["n_name"], r["revenue"])
        for r in relational.local_supplier_revenue(
            tbl["customer"], tbl["orders"], tbl["lineitem"],
            tbl["supplier"], tbl["nation"], tbl["region"],
        ).collect()
    ]
    rk = {
        r["r_regionkey"]
        for r in tbl["region"].collect()
        if r["r_name"] == relational.LOCAL_REGION
    }
    nk = {
        r["n_nationkey"]: r["n_name"]
        for r in tbl["nation"].collect()
        if r["n_regionkey"] in rk
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in tbl["customer"].collect()
        if r["c_nationkey"] in nk
    }
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in tbl["supplier"].collect()
        if r["s_nationkey"] in nk
    }
    lo = datetime.datetime(relational.LOCAL_YEAR, 1, 1)
    hi = datetime.datetime(relational.LOCAL_YEAR + 1, 1, 1)
    ords = {
        r["o_orderkey"]: r["o_custkey"]
        for r in tbl["orders"].collect()
        if lo <= r["o_orderdate"] < hi and r["o_custkey"] in cust
    }
    rev: dict[str, Decimal] = collections.defaultdict(Decimal)
    for r in tbl["lineitem"].collect():
        ck = ords.get(r["l_orderkey"])
        if ck is None or r["l_suppkey"] not in sup:
            continue
        if cust[ck] != sup[r["l_suppkey"]]:
            continue
        rev[nk[sup[r["l_suppkey"]]]] += _dec2(r["l_extendedprice"]) * (
            1 - _dec2(r["l_discount"])
        )
    want = sorted(
        ((n, float(v)) for n, v in rev.items()), key=lambda t: (-t[1], t[0])
    )
    assert got == want and len(got) > 0


def test_local_supplier_revenue_plan(spark):
    tbl = {
        t: spark.read.parquet(f"{SF_SMALL}/{t}.parquet")
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    }
    plan = _plan(
        relational.local_supplier_revenue(
            tbl["customer"], tbl["orders"], tbl["lineitem"],
            tbl["supplier"], tbl["nation"], tbl["region"],
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1


def test_forecast_revenue_matches_bruteforce(spark):
    import datetime

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    row = relational.forecast_revenue(li).first()
    lo = datetime.datetime(relational.FORECAST_YEAR, 1, 1)
    hi = datetime.datetime(relational.FORECAST_YEAR + 1, 1, 1)
    dlo = Decimal(relational.FORECAST_DISC_LO)
    dhi = Decimal(relational.FORECAST_DISC_HI)
    tot, n = Decimal(0), 0
    for r in li.collect():
        d = _dec2(r["l_discount"])
        if (
            lo <= r["l_shipdate"] < hi
            and r["l_quantity"] < relational.FORECAST_MAX_QTY
            and dlo <= d <= dhi
        ):
            tot += _dec2(r["l_extendedprice"]) * d
            n += 1
    assert row["n_lines"] == n and n > 0
    assert row["revenue"] == float(tot)


def test_forecast_revenue_plan_no_join_no_wide_shuffle(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plan = _plan(relational.forecast_revenue(li))
    assert "Join" not in plan, plan
    # partial+final global aggregate over a pruned 4-column scan
    assert "HashAggregate" in plan
    assert "PushedFilters" in plan


def test_returned_top_customers_matches_bruteforce(spark):
    import datetime

    cu = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    got = [tuple(r) for r in
           relational.returned_top_customers(cu, od, li, na).collect()]
    q0 = datetime.datetime.fromisoformat(relational.RETURNED_QUARTER)
    q1 = datetime.datetime(q0.year + (q0.month + 2) // 12,
                           (q0.month + 2) % 12 + 1, q0.day)
    ords = {
        r["o_orderkey"]: r["o_custkey"]
        for r in od.collect()
        if q0 <= r["o_orderdate"] < q1
    }
    rev: dict[int, Decimal] = collections.defaultdict(Decimal)
    for r in li.collect():
        if r["l_returnflag"] == "R" and r["l_orderkey"] in ords:
            rev[ords[r["l_orderkey"]]] += _dec2(r["l_extendedprice"]) * (
                1 - _dec2(r["l_discount"])
            )
    names = {r["n_nationkey"]: r["n_name"] for r in na.collect()}
    want = []
    for r in cu.collect():
        if r["c_custkey"] in rev:
            want.append((
                r["c_custkey"], r["c_name"], float(rev[r["c_custkey"]]),
                r["c_acctbal"], names[r["c_nationkey"]],
            ))
    want.sort(key=lambda t: (-t[2], t[0]))
    assert got == want[: relational.RETURNED_TOPN] and len(got) > 0


def test_returned_top_customers_plan_take_ordered(spark):
    cu = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    na = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    plan = _plan(relational.returned_top_customers(cu, od, li, na))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_part_supplier_variety_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    sp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    got = [tuple(r) for r in
           relational.part_supplier_variety(li, pt, sp).collect()]
    cls = {
        r["p_partkey"]: (r["p_brand"], r["p_type"], r["p_size"])
        for r in pt.collect()
        if r["p_brand"] != relational.VARIETY_EXCL_BRAND
        and not r["p_type"].startswith(relational.VARIETY_EXCL_TYPE_PREFIX)
        and r["p_size"] in relational.VARIETY_SIZES
    }
    flagged = {
        r["s_suppkey"]
        for r in sp.collect()
        if r["s_suppkey"] % relational.VARIETY_FLAG_MOD == 0
    }
    sets: dict[tuple, set] = collections.defaultdict(set)
    for r in li.select("l_partkey", "l_suppkey").collect():
        if r["l_partkey"] in cls and r["l_suppkey"] not in flagged:
            sets[cls[r["l_partkey"]]].add(r["l_suppkey"])
    want = sorted(
        ((b, t, s, len(v)) for (b, t, s), v in sets.items()),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )
    assert got == want and len(got) > 0


def test_bpe_fertility_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = {r["source"]: tuple(r)[1:] for r in
           textops.bpe_fertility(docs).collect()}
    agg: dict[str, list[int]] = collections.defaultdict(lambda: [0, 0, 0])
    for r in docs.select("source", "text").collect():
        for w in re.split(r"\s+", r["text"].strip()):
            if w:
                a = agg[r["source"]]
                a[0] += 1
                a[1] += len(_py_encode(w))
                a[2] += len(w)
    want = {
        s: (nw, nt, nc, _r6(nt / nw), _r6(nc / nt))
        for s, (nw, nt, nc) in agg.items()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# TPC-H Q7 / Q8 / Q9 / Q12 shapes
# ---------------------------------------------------------------------------


def _tbls(spark, *names):
    return tuple(
        spark.read.parquet(f"{SF_SMALL}/{t}.parquet") for t in names
    )


def test_nation_trade_flows_matches_bruteforce(spark):
    import datetime

    cu, od, li, sp, na = _tbls(
        spark, "customer", "orders", "lineitem", "supplier", "nation"
    )
    got = [tuple(r) for r in
           relational.nation_trade_flows(cu, od, li, sp, na).collect()]
    names = {r["n_nationkey"]: r["n_name"] for r in na.collect()}
    pair = {relational.TRADE_NATION_A, relational.TRADE_NATION_B}
    sup = {r["s_suppkey"]: names[r["s_nationkey"]] for r in sp.collect()
           if names[r["s_nationkey"]] in pair}
    cust = {r["c_custkey"]: names[r["c_nationkey"]] for r in cu.collect()
            if names[r["c_nationkey"]] in pair}
    ords = {r["o_orderkey"]: r["o_custkey"] for r in od.collect()
            if r["o_custkey"] in cust}
    lo = datetime.datetime(relational.TRADE_YEAR_LO, 1, 1)
    hi = datetime.datetime(relational.TRADE_YEAR_HI + 1, 1, 1)
    rev: dict[tuple, Decimal] = collections.defaultdict(Decimal)
    for r in li.collect():
        sn = sup.get(r["l_suppkey"])
        ck = ords.get(r["l_orderkey"])
        if sn is None or ck is None or not (lo <= r["l_shipdate"] < hi):
            continue
        cn = cust[ck]
        if sn == cn:
            continue
        rev[(sn, cn, r["l_shipdate"].year)] += _dec2(
            r["l_extendedprice"]
        ) * (1 - _dec2(r["l_discount"]))
    want = sorted((sn, cn, y, float(v)) for (sn, cn, y), v in rev.items())
    assert got == want and len(got) > 0


def test_nation_trade_flows_plan(spark):
    cu, od, li, sp, na = _tbls(
        spark, "customer", "orders", "lineitem", "supplier", "nation"
    )
    plan = _plan(relational.nation_trade_flows(cu, od, li, sp, na))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1
    # the ship-year window must reach the fact scan
    assert "PushedFilters" in plan


def test_market_share_matches_bruteforce(spark):
    import datetime

    cu, od, li, sp, na, rg, pt = _tbls(
        spark, "customer", "orders", "lineitem", "supplier",
        "nation", "region", "part",
    )
    got = [tuple(r) for r in
           relational.market_share(cu, od, li, sp, na, rg, pt).collect()]
    rk = {r["r_regionkey"] for r in rg.collect()
          if r["r_name"] == relational.SHARE_REGION}
    region_nk = {r["n_nationkey"] for r in na.collect()
                 if r["n_regionkey"] in rk}
    names = {r["n_nationkey"]: r["n_name"] for r in na.collect()}
    parts = {r["p_partkey"] for r in pt.collect()
             if r["p_type"] == relational.SHARE_PART_TYPE}
    sup = {r["s_suppkey"]: names[r["s_nationkey"]] for r in sp.collect()}
    cust = {r["c_custkey"] for r in cu.collect()
            if r["c_nationkey"] in region_nk}
    lo = datetime.datetime(relational.SHARE_YEAR_LO, 1, 1)
    hi = datetime.datetime(relational.SHARE_YEAR_HI + 1, 1, 1)
    ords = {r["o_orderkey"]: r["o_orderdate"].year for r in od.collect()
            if lo <= r["o_orderdate"] < hi and r["o_custkey"] in cust}
    num: dict[int, Decimal] = collections.defaultdict(Decimal)
    den: dict[int, Decimal] = collections.defaultdict(Decimal)
    for r in li.collect():
        y = ords.get(r["l_orderkey"])
        if y is None or r["l_partkey"] not in parts:
            continue
        vol = _dec2(r["l_extendedprice"]) * (1 - _dec2(r["l_discount"]))
        den[y] += vol
        if sup[r["l_suppkey"]] == relational.SHARE_NATION:
            num[y] += vol
    want = [
        (y, float(num[y]), float(den[y]), float(num[y]) / float(den[y]))
        for y in sorted(den)
    ]
    assert got == want and len(got) > 0
    for _, n, d, s in got:
        assert 0.0 <= s <= 1.0 and n <= d


def test_product_profit_matches_bruteforce(spark):
    od, li, sp, na, pt = _tbls(
        spark, "orders", "lineitem", "supplier", "nation", "part"
    )
    got = [tuple(r) for r in
           relational.product_profit(od, li, sp, na, pt).collect()]
    cost = {
        r["p_partkey"]: _dec2(r["p_retailprice"])
        * Decimal(relational.PROFIT_COST_FACTOR)
        for r in pt.collect()
        if relational.PROFIT_PART_TOKEN in r["p_name"]
    }
    names = {r["n_nationkey"]: r["n_name"] for r in na.collect()}
    sup = {r["s_suppkey"]: names[r["s_nationkey"]] for r in sp.collect()}
    years = {r["o_orderkey"]: r["o_orderdate"].year for r in od.collect()}
    rev: dict[tuple, Decimal] = collections.defaultdict(Decimal)
    cst: dict[tuple, Decimal] = collections.defaultdict(Decimal)
    for r in li.collect():
        c = cost.get(r["l_partkey"])
        if c is None:
            continue
        key = (sup[r["l_suppkey"]], years[r["l_orderkey"]])
        rev[key] += _dec2(r["l_extendedprice"]) * (1 - _dec2(r["l_discount"]))
        cst[key] += c * _dec2(r["l_quantity"])
    want = sorted(
        ((n, y, float(rev[(n, y)]) - float(cst[(n, y)]))
         for (n, y) in rev),
        key=lambda t: (t[0], -t[1]),
    )
    assert got == want and len(got) > 0


def test_product_profit_plan_broadcast_part_slice(spark):
    od, li, sp, na, pt = _tbls(
        spark, "orders", "lineitem", "supplier", "nation", "part"
    )
    plan = _plan(relational.product_profit(od, li, sp, na, pt))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1


def test_shipmode_priority_counts_matches_bruteforce(spark):
    import datetime

    od, li = _tbls(spark, "orders", "lineitem")
    got = [tuple(r) for r in
           relational.shipmode_priority_counts(od, li).collect()]
    ords = {r["o_orderkey"]: (r["o_orderdate"], r["o_orderpriority"])
            for r in od.collect()}
    lo = datetime.datetime(relational.SHIPMODE_YEAR, 1, 1)
    hi = datetime.datetime(relational.SHIPMODE_YEAR + 1, 1, 1)
    lag = datetime.timedelta(days=relational.SHIPMODE_LATE_DAYS)
    counts: dict[str, list[int]] = collections.defaultdict(lambda: [0, 0])
    for r in li.collect():
        mode = relational.SHIPMODE_NAMES[
            r["l_linenumber"] % len(relational.SHIPMODE_NAMES)
        ]
        if mode not in relational.SHIPMODE_AUDITED:
            continue
        if not (lo <= r["l_shipdate"] < hi):
            continue
        odate, prio = ords[r["l_orderkey"]]
        if r["l_shipdate"] <= odate + lag:
            continue
        counts[mode][0 if prio in relational.SHIPMODE_HIGH_PRIO else 1] += 1
    want = [(m, counts[m][0], counts[m][1]) for m in sorted(counts)]
    assert got == want and len(got) > 0


def test_shipmode_priority_counts_plan(spark):
    od, li = _tbls(spark, "orders", "lineitem")
    plan = _plan(relational.shipmode_priority_counts(od, li))
    assert "CartesianProduct" not in plan
    # the ship-year window reaches the lineitem scan
    assert "PushedFilters" in plan


# ---------------------------------------------------------------------------
# cross-source near-duplication matrix
# ---------------------------------------------------------------------------


def test_neardup_source_matrix_matches_pair_pipeline(spark):
    from scholar_stream_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = [tuple(r) for r in dedup.neardup_source_matrix(docs).collect()]
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    pairs = dedup.ngram_jaccard_pairs(docs).collect()
    cells: dict[tuple, int] = collections.defaultdict(int)
    for r in pairs:
        a, b = sorted((src[r["d1"]], src[r["d2"]]))
        cells[(a, b)] += 1
    total = sum(cells.values())
    want = sorted(
        (a, b, n, n / float(total)) for (a, b), n in cells.items()
    )
    assert got == want and len(got) > 0
    assert abs(sum(r[3] for r in got) - 1.0) < 1e-9


def test_neardup_source_matrix_plan_no_cartesian(spark):
    from scholar_stream_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(dedup.neardup_source_matrix(docs))
    assert "CartesianProduct" not in plan
    # the share denominator is a window over the ≤|sources|² cell
    # table, not a second aggregate pass over the pair pipeline
    assert plan.count("Window") == 1, plan


# ---------------------------------------------------------------------------
# embedding-centroid drift screen
# ---------------------------------------------------------------------------


def test_embedding_drift_matches_numpy_reference(spark):
    from scholar_stream_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got = [tuple(r) for r in similarity.embedding_drift(emb).collect()]
    Q = similarity.DRIFT_QUANT
    sums: dict[tuple, list] = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in emb.collect():
        ref = r["vec_id"] % 2 == 0
        for d, v in enumerate(r["embedding"]):
            qv = int(__import__("math").floor(float(v) * Q + 0.5))
            cell = sums[(r["label"], d)]
            if ref:
                cell[0] += qv
                cell[1] += 1
            else:
                cell[2] += qv
                cell[3] += 1
    per_label: dict[int, list] = collections.defaultdict(list)
    for (lbl, d), (sr, nr, sc, nc) in sums.items():
        mr = float(sr) / (float(Q) * float(nr))
        mc = float(sc) / (float(Q) * float(nc))
        per_label[lbl].append((d, mr, mc, abs(mr - mc)))
    want = []
    for lbl in sorted(per_label):
        dims = sorted(per_label[lbl], key=lambda t: (-t[3], t[0]))
        want.extend(
            (lbl, d, mr, mc, sh)
            for d, mr, mc, sh in dims[: similarity.DRIFT_TOP_DIMS]
        )
    assert got == want and len(got) > 0


def test_curation_funnel_agrees_with_curate_corpus(spark):
    """The funnel's final-stage count must equal what curate_corpus
    actually emits per source — same gates, not a reimplementation."""
    from scholar_stream_spark.operators import curation

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    fun = {r["source"]: tuple(r)[1:] for r in
           curation.curation_funnel(docs).collect()}
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    emitted = collections.Counter(
        src[r["doc_id"]]
        for r in curation.curate_corpus(docs, engine="expr").collect()
    )
    totals = collections.Counter(src.values())
    assert set(fun) == set(totals)
    for s, (n_total, n_q, n_l, n_u, n_f) in fun.items():
        assert n_total == totals[s]
        assert n_total >= n_q >= n_l >= n_u >= n_f >= 0
        assert n_f == emitted.get(s, 0), s
    assert sum(t[3] for t in fun.values()) == (
        curation.curate_corpus(
            docs, splits=("train", "val", "test"), engine="expr"
        ).count()
    )


def test_curation_funnel_plan_single_scan_one_window(spark):
    from scholar_stream_spark.operators import curation

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(curation.curation_funnel(docs))
    assert plan.count("documents.parquet") == 1, plan
    assert plan.count("Window") == 1, plan
    assert "CartesianProduct" not in plan


def test_embedding_drift_plan_grid_sized_shuffle(spark):
    from scholar_stream_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    plan = _plan(similarity.embedding_drift(emb))
    assert "CartesianProduct" not in plan
    # map-side combine must exist before the grid exchange: a partial
    # HashAggregate under the explode, a final one after
    assert plan.count("HashAggregate") >= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

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

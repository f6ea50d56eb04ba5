"""Round-12 operators: shipping-delay profile wiring, PQ recount
agreement, BM25 whitespace tokenization, and the rank-exact family's
distributed scale profile.

The shipping_delay_profile fixture is CONSTRUCTED (known lags, odd and
even strata sizes) so the rank-selection arithmetic — median at row
``(n+1) div 2``, p90 at row ``(9n+9) div 10`` — is verified against
hand-computed picks, not against a second implementation.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators import relational, similarity, textops
from tests.conftest import SF_SMALL


def _d(day: int) -> datetime.date:
    return datetime.date(2026, 1, 1) + datetime.timedelta(days=day)


@pytest.fixture(scope="module")
def ship_fixture(spark):
    """Two priorities with known lag multisets:

    - 1-URGENT: lags 1..10 (n=10) -> median row 5 => 5, p90 row 9 => 9,
      max 10;
    - 2-HIGH:   lags [2, 4, 6] (n=3) -> median row 2 => 4, p90 row 3
      => 6, max 6.
    """
    orders_rows = []
    line_rows = []
    for i, lag in enumerate(range(1, 11)):
        ok = 100 + i
        orders_rows.append((ok, _d(0), "1-URGENT"))
        line_rows.append((ok, 1, _d(lag)))
    for i, lag in enumerate([2, 4, 6]):
        ok = 200 + i
        orders_rows.append((ok, _d(0), "2-HIGH"))
        line_rows.append((ok, 1, _d(lag)))
    orders = spark.createDataFrame(
        orders_rows, "o_orderkey long, o_orderdate date, o_orderpriority string"
    )
    lineitem = spark.createDataFrame(
        line_rows, "l_orderkey long, l_linenumber int, l_shipdate date"
    )
    return orders, lineitem


def test_shipping_delay_profile_rank_exact_picks(ship_fixture):
    orders, lineitem = ship_fixture
    rows = {
        r["o_orderpriority"]: r
        for r in relational.shipping_delay_profile(orders, lineitem).collect()
    }
    assert set(rows) == {"1-URGENT", "2-HIGH"}
    u = rows["1-URGENT"]
    assert (u["n_lineitems"], u["median_lag_days"], u["p90_lag_days"],
            u["max_lag_days"]) == (10, 5, 9, 10)
    h = rows["2-HIGH"]
    assert (h["n_lineitems"], h["median_lag_days"], h["p90_lag_days"],
            h["max_lag_days"]) == (3, 4, 6, 6)


def test_shipping_delay_profile_single_fact_scan(ship_fixture):
    """The ``lags`` join feeds BOTH the percentile ranking and the
    max-lag aggregate; the localCheckpoint pin must keep the plan to
    one materialization — no second join subtree in the final plan."""
    orders, lineitem = ship_fixture
    plan = relational.shipping_delay_profile(
        orders, lineitem
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") <= 1, plan


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_pq_train_counts_match_encoded_occupancy(emb):
    """pq_train's cell_count is occupancy under the EMITTED centroids
    (final recount pass), so it must equal a recount of pq_codes'
    assignments — the agreement pq_index_stats relies on."""
    train = {
        (r["subspace"], r["code"]): r["cell_count"]
        for r in similarity.pq_train(emb).collect()
    }
    recount: dict = {}
    for r in similarity.pq_codes(emb).collect():
        for j, c in enumerate(r["codes"]):
            recount[(j, c)] = recount.get((j, c), 0) + 1
    assert {k: v for k, v in train.items() if v} == recount


def test_bm25_whitespace_edge_tokens(spark):
    """Leading/trailing tabs+newlines must not change dl: the collapse-
    then-trim tokenization gives the tab-padded doc the SAME score as
    the clean doc (one tokenization definition, shared with the
    oracle)."""
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join"),
            (2, "\t spark shuffle join \n"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    rows = textops.bm25_search(
        docs, queries=[("q1", ["spark", "shuffle"])], topk=3
    ).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert set(scores) == {1, 2}
    assert scores[1] == scores[2]

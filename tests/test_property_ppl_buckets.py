"""Property-based check of the CCNet perplexity-bucket thresholds at
tie boundaries: random corpora in which many documents share IDENTICAL
text (hence identical 4-decimal ppl under the corpus's own LM) force
the discrete-quantile cut ``cum >= ceil(q*n)`` to land inside tie runs
— exactly where an interpolated quantile or a rounding drift between
engines would flip every threshold-tied document's bucket. Spark's
``perplexity_buckets`` and the verbatim DuckDB oracle SQL must agree
doc-for-doc on (lang, ppl, bucket)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entry_mod
from scholar_stream_spark.operators import textops

#: Tiny text pool → massive cross-doc collisions: repeated draws of the
#: same string give runs of identical ppl, and drawing across two
#: languages exercises the per-language threshold partitioning.
TEXTS = (
    "alpha beta gamma",
    "alpha alpha alpha",
    "delta epsilon",
    "zeta zeta eta theta",
    "iota",
)
LANGS = ("en", "de")

corpus = st.lists(
    st.tuples(st.sampled_from(TEXTS), st.sampled_from(LANGS)),
    min_size=2,
    max_size=24,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus)
def test_perplexity_bucket_tie_boundaries_match_oracle(spark, rows):
    data = [(i, t, lang) for i, (t, lang) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["lang"], r["ppl"], r["bucket"])
        for r in textops.perplexity_buckets(df).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(data, columns=["doc_id", "text", "lang"])
    )
    want = {
        int(r[0]): (r[1], float(r[2]), r[3])
        for r in con.execute(
            entry_mod.oracle_sql()["perplexity_buckets"]
        ).fetchall()
    }
    assert got == want, data

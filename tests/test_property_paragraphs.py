"""Property-based check of paragraph-level dedup against a naive Python
reference: random small corpora whose paragraphs come from a tiny pool
(maximal cross-doc collision pressure) plus case/whitespace variants
(normalization pressure) and blank paragraphs (filter pressure)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scholar_stream_spark.operators import dedup

SEP = dedup.PARA_SEP

# small pool incl. variants that normalize to the same form, and blanks
para = st.sampled_from(
    [
        "alpha one",
        "Alpha  One",  # same normalized form as above
        "beta two",
        "gamma three three",
        "",
        "   ",
    ]
)
doc = st.lists(para, min_size=0, max_size=5).map(SEP.join)


def _norm(p: str) -> str:
    return re.sub(r"\s+", " ", p.lower()).strip()


def _reference(texts: dict[int, str]) -> dict[int, tuple[str, int, int]]:
    from collections import Counter

    counts: Counter = Counter()
    for t in texts.values():
        for p in t.split(SEP):
            if p.strip():
                counts[_norm(p)] += 1
    out = {}
    for did, t in texts.items():
        paras = [p for p in t.split(SEP) if p.strip()]
        kept = [p for p in paras if counts[_norm(p)] < dedup.PARA_MIN_COUNT]
        out[did] = (SEP.join(kept), len(paras), len(paras) - len(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(doc, min_size=1, max_size=6))
def test_remove_dup_paragraphs_matches_reference(spark, docs_texts):
    texts = {i: t for i, t in enumerate(docs_texts)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_paragraphs"],
            r["n_removed_paragraphs"],
        )
        for r in dedup.remove_dup_paragraphs(df).collect()
    }
    assert got == _reference(texts), texts

"""Property-based check of the ExactSubstr span finder against a naive
Python reference: random small corpora over a tiny vocabulary (maximal
window-collision pressure), windows of 3 tokens, adversarial doc sizes
(below/at/above the window), within-doc and cross-doc repeats."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scholar_stream_spark.operators import dedup

W = 3

doc = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
).map(" ".join)


def _reference_spans(texts: dict[int, str]) -> set[tuple[int, int, int]]:
    from collections import Counter

    counts: Counter = Counter()
    starts: dict[int, list[int]] = {}
    for did, t in texts.items():
        ws = t.split()
        starts[did] = []
        for s in range(len(ws) - W + 1):
            counts[tuple(ws[s : s + W])] += 1
    hits: dict[int, list[int]] = {}
    for did, t in texts.items():
        ws = t.split()
        for s in range(len(ws) - W + 1):
            if counts[tuple(ws[s : s + W])] >= 2:
                hits.setdefault(did, []).append(s)
    out = set()
    for did, ss in hits.items():
        ss.sort()
        cur_s, cur_e = ss[0], ss[0] + W
        for s in ss[1:]:
            if s > cur_e:
                out.add((did, cur_s, cur_e))
                cur_s = s
            cur_e = max(cur_e, s + W)
        out.add((did, cur_s, cur_e))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(doc, min_size=1, max_size=6))
def test_duplicate_spans_matches_reference(spark, docs_texts):
    texts = {i: t for i, t in enumerate(docs_texts)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, window=W).collect()
    }
    assert got == _reference_spans(texts), texts

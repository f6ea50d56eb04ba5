"""Property-based check of ``gopher_repetition`` against a naive
Python reference: random small docs drawn from a tiny token pool
(maximal n-gram collision pressure) with newlines injected between
random chunks (line-rule pressure). The 5-gram position-coverage union
is the code most worth an independent re-derivation — overlapping
duplicate windows must never double-count."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scholar_stream_spark.operators import textops


def _round4(x: float) -> float:
    """HALF_UP at 4 decimals over the EXACT binary double — what Spark's
    ``F.round`` (BigDecimal(double) + HALF_UP) and DuckDB's ``round``
    both do. Python's builtin ``round`` is banker's rounding and
    disagrees on exact ties like 13/32 = 0.40625 (the hypothesis
    counterexample that motivated this helper)."""
    return float(
        Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )

token = st.sampled_from(["go", "stop", "aa", "bbb", "x"])
chunk = st.lists(token, min_size=1, max_size=8).map(" ".join)
doc = st.lists(chunk, min_size=1, max_size=3).map("\n".join)


def _reference(text: str) -> dict[str, float]:
    lines = text.split("\n")
    ws = text.strip().split() if text.strip() else [""]
    line_counts = Counter(lines)
    dup_lines = sum(c for c in line_counts.values() if c >= 2)
    dup_line_chars = sum(
        c * len(g) for g, c in line_counts.items() if c >= 2
    )
    char_sum = sum(len(w) for w in ws)
    norm_chars = char_sum + len(ws) - 1

    def ngrams(n):
        return Counter(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )

    def top(n):
        cn = ngrams(n)
        return max((c * len(g) for g, c in cn.items()), default=0)

    covered = set()
    for g, c in ngrams(5).items():
        if c >= 2:
            for i in range(len(ws) - 4):
                if " ".join(ws[i : i + 5]) == g:
                    covered.update(range(i, i + 5))
    dup5_chars = sum(len(ws[p]) for p in covered)

    def frac(num, den):
        return _round4(min(1.0, num / den)) if den > 0 else 0.0

    return {
        "dup_line_frac": frac(dup_lines, len(lines)),
        "dup_line_char_frac": frac(
            dup_line_chars, sum(len(l) for l in lines)
        ),
        "top_2gram_char_frac": frac(top(2), norm_chars),
        "top_3gram_char_frac": frac(top(3), norm_chars),
        "dup_5gram_char_frac": frac(dup5_chars, char_sum),
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(doc, min_size=1, max_size=5))
def test_gopher_repetition_matches_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: {k: r[k] for k in _reference("x")}
        for r in textops.gopher_repetition(df).collect()
    }
    want = {i: _reference(t) for i, t in enumerate(texts)}
    assert got == want, texts

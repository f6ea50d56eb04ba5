"""Property-based check of the two distributed connected-components
kernels against a Python union-find reference.

The star kernel's correctness hinges on the large-star/small-star emit
rules and the convergence check; label propagation's on its per-hop min
and the stop condition. Hypothesis drives adversarial small graphs —
chains, cliques-with-bridges, self-contained stars, duplicate and
reversed edges — and both kernels must produce the exact union-find
labels (min member id per component) for every node that appears in an
edge.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scholar_stream_spark.operators import dedup

edge = st.tuples(
    st.integers(min_value=0, max_value=14),
    st.integers(min_value=0, max_value=14),
)


def _reference_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(edge, min_size=1, max_size=25))
def test_cc_kernels_match_union_find(spark, edges):
    # drop self-loops (a doc is trivially its own cluster; the pair
    # generators never emit them) and symmetrize like neardup_clusters
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "d1 long, d2 long")
    want = _reference_labels(edges)
    for kernel in dedup.CC_KERNELS:
        got = {
            r["node"]: r["lbl"]
            for r in dedup.connected_components(df, kernel=kernel).collect()
        }
        assert got == want, (kernel, edges)

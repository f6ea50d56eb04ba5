"""Property-based checks of the r14 second-batch operators against
naive Python references: random small inputs drawn from tiny pools
(maximal collision pressure on names/tokens/classes) so blocking,
tokenization, and histogram edge cases all get exercised — the same
reference-mirror discipline as test_property_paragraphs / _cc."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from scholar_stream_spark.operators import dedup, masking, textops

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# tiny name pool: shared prefixes (lev pressure) + exact dups
name = st.sampled_from(
    ["red bolt", "red bolt", "red belt", "red melt", "blue bolt",
     "blue tilt", "tan cog", "tan fog", "zz top"]
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _parts(spark, names):
    return spark.createDataFrame(
        [(i, n, "B", "t", 1, 1.0) for i, n in enumerate(names)],
        "p_partkey long, p_name string, p_brand string, "
        "p_type string, p_size int, p_retailprice double",
    )


@settings(**_SETTINGS)
@given(st.lists(name, min_size=1, max_size=12),
       st.integers(1, 4), st.integers(1, 5))
def test_snm_pairs_match_reference(spark, names, window, max_dist):
    counts = Counter(names)
    spine = sorted(counts)
    want = set()
    for i, na in enumerate(spine):
        for j in range(i + 1, min(i + window, len(spine) - 1) + 1):
            nb = spine[j]
            d = _lev(na, nb)
            if 1 <= d <= max_dist:
                want.add((na, nb, d, counts[na], counts[nb]))
    got = {
        (r["name_a"], r["name_b"], r["lev"], r["parts_a"], r["parts_b"])
        for r in dedup.snm_candidate_pairs(
            _parts(spark, names), window=window, max_dist=max_dist
        ).collect()
    }
    assert got == want


tok = st.sampled_from(["aa", "bb", "cc", "dd"])
doctext = st.lists(tok, min_size=0, max_size=6).map(" ".join)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )


@settings(**_SETTINGS)
@given(st.lists(doctext, min_size=1, max_size=8), st.integers(1, 4))
def test_vocab_growth_matches_reference(spark, texts, n_buckets):
    n = len(texts)
    per_bucket_grams: dict[int, list] = defaultdict(list)
    docs_per_bucket: Counter = Counter()
    for r, t in enumerate(texts, 1):  # rank by doc_id == index order
        bucket = (r - 1) * n_buckets // n + 1
        docs_per_bucket[bucket] += 1
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        per_bucket_grams[bucket].extend(
            f"{a} {b}" for a, b in zip(ws, ws[1:])
        )
    firsts: dict[str, int] = {}
    for b in sorted(per_bucket_grams):
        for g in per_bucket_grams[b]:
            firsts.setdefault(g, b)
    new_types = Counter(firsts.values())
    want, cum_t, cum_g = {}, 0, 0
    for b in sorted(docs_per_bucket):
        cum_t += new_types.get(b, 0)
        bucket_grams = len(per_bucket_grams.get(b, []))
        cum_g += bucket_grams
        ttr = cum_t / cum_g if cum_g else None
        want[b] = (docs_per_bucket[b], new_types.get(b, 0), cum_t,
                   bucket_grams, cum_g, ttr)
    got = {}
    for r in textops.vocab_growth(
        _docs(spark, texts), n_buckets=n_buckets
    ).collect():
        got[r["bucket"]] = (
            r["n_docs"], r["new_types"], r["cum_types"],
            r["bucket_grams"], r["cum_grams"], r["type_token_ratio"],
        )
    assert set(got) == set(want)
    for b in want:
        assert got[b][:5] == want[b][:5], (b, got[b], want[b])
        if want[b][5] is None:
            assert got[b][5] is None
        else:
            assert abs(got[b][5] - want[b][5]) < 2e-6


@settings(**_SETTINGS)
@given(st.lists(doctext, min_size=1, max_size=6),
       st.integers(1, 3), st.integers(1, 3))
def test_pmi_matches_reference(spark, texts, window, min_count):
    pair_counts: Counter = Counter()
    uni: Counter = Counter()
    for t in texts:
        ws = [w for w in re.split(r"\s+", t.lower().strip()) if w]
        uni.update(ws)
        for d in range(1, window + 1):
            for i in range(len(ws) - d):
                a, b = ws[i], ws[i + d]
                pair_counts[(min(a, b), max(a, b))] += 1
    n_tok, n_pair = sum(uni.values()), sum(pair_counts.values())
    want = {}
    for (a, b), c in pair_counts.items():
        if c >= min_count:
            pmi = math.log(((c * float(n_tok)) * n_tok)
                           / ((n_pair * float(uni[a])) * uni[b]))
            want[(a, b)] = (c, uni[a], uni[b], pmi)
    got = {
        (r["w_a"], r["w_b"]): (
            r["pair_count"], r["count_a"], r["count_b"], r["pmi"]
        )
        for r in textops.pmi_cooccurrence(
            _docs(spark, texts), window=window, min_count=min_count
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert abs(got[k][3] - want[k][3]) < 6e-5


@settings(**_SETTINGS)
@given(st.lists(st.sampled_from(["aab", "abc", "xxxy", "pq"]),
                min_size=1, max_size=6))
def test_char_entropy_matches_reference(spark, texts):
    want = {}
    for i, t in enumerate(texts):
        if not t:
            continue
        n = len(t)
        h = -sum((c / n) * math.log(c / n)
                 for c in Counter(t).values())
        want[i] = (n, h)
    got = {
        r["doc_id"]: (r["n_chars"], r["entropy"])
        for r in textops.char_entropy(_docs(spark, texts)).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 6e-5


cust_row = st.tuples(
    st.integers(1, 3),                       # nationkey
    st.sampled_from([None, 0.0, 500.0, 1500.0, -100.0]),  # acctbal
    st.sampled_from(["A", "B", None]),       # segment
)


@settings(**_SETTINGS)
@given(st.lists(cust_row, min_size=1, max_size=15),
       st.integers(1, 5), st.integers(1, 3))
def test_privacy_audits_match_reference(spark, rows, k, l_floor):
    df = spark.createDataFrame(
        [(i, "n", nk, bal, seg)
         for i, (nk, bal, seg) in enumerate(rows)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )

    def band(bal):
        return None if bal is None else math.floor(bal / 1000.0)

    k_classes: Counter = Counter()
    for nk, bal, seg in rows:
        k_classes[(nk, seg, band(bal))] += 1
    k_want: dict[int, list] = defaultdict(lambda: [0, 0])
    for size in k_classes.values():
        k_want[size][0] += 1
        k_want[size][1] += size
    got = {
        r["group_size"]: (r["n_groups"], r["n_customers"], r["at_risk"])
        for r in masking.k_anonymity_audit(df, k=k).collect()
    }
    assert got == {
        s: (g, c, s < k) for s, (g, c) in k_want.items()
    }

    l_cells: dict = defaultdict(set)
    l_sizes: Counter = Counter()
    for nk, bal, seg in rows:
        l_cells[(nk, band(bal))].add(seg)
        l_sizes[(nk, band(bal))] += 1
    l_want: dict[int, list] = defaultdict(lambda: [0, 0])
    for cls, segs in l_cells.items():
        l_want[len(segs)][0] += 1
        l_want[len(segs)][1] += l_sizes[cls]
    got_l = {
        r["l_distinct"]: (r["n_classes"], r["n_customers"], r["at_risk"])
        for r in masking.l_diversity_audit(df, l_floor=l_floor).collect()
    }
    assert got_l == {
        l: (g, c, l < l_floor) for l, (g, c) in l_want.items()
    }

    # t-closeness vs the direct variational-distance reference over
    # the same classes (NULL segments as the sentinel value)
    seg_of = lambda seg: "(null)" if seg is None else seg
    t_cells: dict = defaultdict(Counter)
    for nk, bal, seg in rows:
        t_cells[(nk, band(bal))][seg_of(seg)] += 1
    n_total = len(rows)
    g: Counter = Counter(seg_of(seg) for _, _, seg in rows)
    t_want: dict = defaultdict(lambda: [0, 0])
    for cls, dist in t_cells.items():
        n_c = sum(dist.values())
        # the ENGINE's zero-cell fold form, term by term — matching
        # its float recipe so bucket/flag agree; knife-edge classes
        # (t within 1e-9 of a bucket boundary or the 0.3 threshold,
        # where a last-ulp summation-order difference flips the
        # label) are excluded from the draw
        t = 0.5 * (sum(
            abs(m / n_c - g[sv] / n_total) - g[sv] / n_total
            for sv, m in dist.items()
        ) + 1.0)
        assume(abs(t - 0.3) > 1e-9)
        assume(abs(t * 10.0 - round(t * 10.0)) > 1e-9 or t == 0.0)
        key = (math.floor(t * 10.0), t > 0.3)
        t_want[key][0] += 1
        t_want[key][1] += n_c
    got_t = {
        (r["t_bucket"], r["at_risk"]): (r["n_classes"], r["n_customers"])
        for r in masking.t_closeness_audit(df).collect()
    }
    assert got_t == {k: tuple(v) for k, v in t_want.items()}

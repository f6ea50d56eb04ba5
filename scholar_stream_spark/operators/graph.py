"""Graph analytics over DataFrame edge lists (SURVEY §2.8 extension).

Connected components live in ``operators/dedup.py`` (they grew out of
the near-dup cluster step and share its kernels); this module holds the
ITERATIVE-NUMERIC graph family — fixpoint computations over float
state, where the engineering constraints differ from CC's integer
labels: no exact convergence checksum is possible (floats drift), so
rounds are a FIXED budget, and every iteration must checkpoint or the
lineage re-executes all prior rounds per action.
"""

from __future__ import annotations

import decimal as _dec

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from scholar_stream_spark.plans.partitioning import driver_rows_df

#: PageRank defaults: the canonical damping factor and a round budget
#: sized for small-diameter business graphs (power iteration converges
#: geometrically at rate ≤ damping; 20 rounds ⇒ residual ≲ 0.85^20 ≈ 4%
#: of the initial gap in the worst case). Unlike HITS_ITER — which the
#: r17 measurement cut 20 → 8 — this budget SURVIVED the same
#: measurement: the numpy mirror on the real trade graphs shows the
#: sparse sf0.001 graph reaching round-6 display convergence only at
#: round 16 (residual 1.4e-7; maxdev 6.8e-9 vs the 200-round limit),
#: while the denser sf0.01/0.1 graphs converge by round 2–4 — PageRank
#: mixes at the damping-bounded rate on sparse graphs where HITS's
#: squared singular-value ratio stays fast, so 20 keeps a 4-round
#: margin over the slowest measured case. The `with_residual` column
#: is the per-graph evidence, as always.
PAGERANK_DAMPING = 0.85
PAGERANK_ITER = 20


def pagerank(
    edges: DataFrame,
    damping: float = PAGERANK_DAMPING,
    n_iter: int = PAGERANK_ITER,
    with_residual: bool = False,
    max_driver_edges: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank over a (src, dst, weight) edge list — the
    Brin-Page random surfer with edge-weight-proportional transitions:
    ``pr ← (1−d)/n + d·(Pᵀpr + dangling_mass/n)``, run for a FIXED
    ``n_iter`` rounds (float fixpoints have no exact cross-engine
    convergence test — the CC kernels' checksum trick does not carry
    over, so the round budget is explicit and deterministic).

    Semantics: transition probability out of ``src`` is
    ``weight/Σweight(src)`` (weights must be positive — validated via
    a 1-row aggregate, not a silent filter); DANGLING nodes (no
    out-edges — they exist whenever dst-only nodes appear) spread
    their whole mass uniformly, the standard correction without which
    rank leaks and Σpr < 1; every node starts at 1/n; Σpr = 1 is a
    loop invariant (pinned ≈1 in pytest against float error).

    Scale shape: the normalized edge list is computed ONCE (one
    groupBy + one equi-join) and localCheckpointed — the iteration
    must not re-normalize per round; each round is ONE edge⋈rank
    equi-join + a map-side-combined groupBy(dst), a LEFT join back to
    the node spine (nodes with no in-edges keep the teleport floor),
    and two 1-row aggregates (dangling mass, and nothing else) — the
    same bounded-driver-state contract as the CC kernels; rank state
    checkpoints per round so lineage cannot grow. n (node count) is
    one driver scalar.

    Output: (node, pr) — pr DOUBLE, unrounded (consumers rank/slice;
    rounding is display policy). Deterministic given (graph, damping,
    n_iter): per-node contributions aggregate over the same multiset
    of doubles regardless of partitioning (float sums re-associate,
    but pytest pins partition invariance on the fixture graphs and
    values vs a numpy power-iteration reference at 1e-9).

    ``with_residual=True`` adds a constant ``residual`` column: the
    final-round L1 step ``Σ|pr_T − pr_{T−1}|`` — the MEASURED
    convergence evidence for the fixed round budget (r15 verdict: the
    "residual ≲ 0.85^20 of the initial gap" claim must be observable,
    not asserted, before anyone trusts rank VALUES on THEIR graph).
    Power iteration contracts L1 step size by ≥ the damping factor per
    round, so ``residual ≤ 2·dᵀ`` always; a consumer who sees a larger
    value than their tolerance simply re-runs with a bigger budget.
    Cost: one extra equi-join + 1-row aggregate on the LAST round only
    — the loop itself is unchanged.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(
            f"pagerank: damping must be in (0, 1), got {damping}"
        )
    if n_iter < 1:
        raise ValueError(f"pagerank: n_iter must be >= 1, got {n_iter}")
    # the edge plan may be expensive (nation_pagerank's is a full
    # fact-table star join) and feeds FOUR consumers below (validation,
    # node spine, out-weights, normalization) — checkpoint it once
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out_w = edges.groupBy("src").agg(
        F.sum(F.col("weight").cast("double")).alias("_wout")
    )
    norm = (
        edges.join(out_w, "src")
        .select(
            "src",
            "dst",
            (F.col("weight").cast("double") / F.col("_wout")).alias(
                "_p"
            ),
        )
        .localCheckpoint(eager=False)  # iteration must not re-normalize
    )
    # hybrid (r17 optimization round — the `kcore` driver-peel
    # precedent, applied after measurement: the distributed loop costs
    # ~0.2 s of stage latency PER ROUND on a grid-sized graph, ~4 s of
    # the 20-round budget, for state one numpy pass updates in
    # microseconds): below ``max_driver_edges`` the NORMALIZED edge
    # list is collected once (the limit(n+1) probe IS the size check —
    # bounded driver state by construction, the CC/kcore contract) and
    # the identical recurrence runs in numpy; above it, the
    # distributed loop below is unchanged. Same doubles up to
    # float-sum re-association (the indeterminacy the distributed
    # path itself already has across partitionings — pinned identical
    # at display grain both-paths in pytest, and vs the numpy
    # reference at 1e-9 as before).
    #
    # r18 (guide §1.2/§2.6 — the fleet is scheduling-floor-bound, so
    # CONSTRUCTION Spark jobs are the cost): below the cap, weight
    # validation, the node set, n and the dangling test all derive
    # EXACTLY from the raw edge probe itself (row-local comparisons and
    # set cardinalities — no float arithmetic), so the old four
    # sequential driver actions (stats aggregate, node count, norm
    # probe, node collect) collapse into TWO independent probes
    # submitted concurrently (one wall-clock round trip; the normalized
    # ``_p`` doubles still come from the SAME Spark plan as before —
    # driver-side re-summation of _wout could re-associate the float
    # sum, so it stays in-engine). Above the cap the full-scan
    # validation aggregate and node count run as before.
    if max_driver_edges > 0:
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_edges = pool.submit(
                edges.limit(max_driver_edges + 1).collect
            )
            f_norm = pool.submit(
                norm.limit(max_driver_edges + 1).collect
            )
            eprobe = f_edges.result()
            nprobe = f_norm.result()
        if len(eprobe) <= max_driver_edges:
            if any(
                r["weight"] is None or r["weight"] <= 0 for r in eprobe
            ):
                raise ValueError(
                    "pagerank: edge weights must be positive and "
                    "non-NULL (a zero/negative weight has no "
                    "transition-probability reading)"
                )
            node_set = {r["src"] for r in eprobe} | {
                r["dst"] for r in eprobe
            }
            n = len(node_set)
            if n == 0:
                raise ValueError(
                    "pagerank: empty edge list (no nodes — rank over "
                    "nothing has no reading; a bare ZeroDivisionError "
                    "from 1/n would hide the real problem)"
                )
            has_dangling = len({r["src"] for r in eprobe}) < n
            return _pagerank_driver(
                edges.sparkSession,
                nprobe,
                list(node_set),
                nodes.schema["node"].dataType,
                damping,
                n_iter,
                has_dangling=has_dangling,
                with_residual=with_residual,
            )
    # distributed path: ONE 1-row aggregate carries weight validation
    # and the distinct source count (the hits() consolidation, r16
    # ADVICE item 3): the dangling test below becomes arithmetic
    # (n_distinct_src < n) instead of its own driver job.
    stats = edges.agg(
        F.sum(
            (F.col("weight").isNull() | (F.col("weight") <= 0)).cast(
                "int"
            )
        ).alias("n_bad"),
        F.countDistinct("src").alias("n_src"),
    ).first()
    if stats["n_bad"]:
        raise ValueError(
            "pagerank: edge weights must be positive and non-NULL "
            "(a zero/negative weight has no transition-probability "
            "reading)"
        )
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "pagerank: empty edge list (no nodes — rank over nothing "
            "has no reading; a bare ZeroDivisionError from 1/n would "
            "hide the real problem)"
        )
    # decided ONCE (and for free — a node is dangling iff it never
    # appears as a src, so n_distinct_src < n IS the test): a
    # dangling-free graph (every node has out-edges — the common case
    # for flow graphs) skips the per-round mass aggregate entirely,
    # halving the job count of the loop
    has_dangling = stats["n_src"] < n
    # dangling spine: nodes with no out-edges (their rank mass
    # teleports uniformly each round)
    dangling_nodes = nodes.join(
        out_w.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=False)
    pr = nodes.select(
        "node", F.lit(1.0 / n).alias("pr")
    ).localCheckpoint(eager=False)
    teleport = (1.0 - damping) / n
    # nodes with NO in-edges never receive contribution mass: each
    # round they sit at the constant teleport-plus-dangling floor. The
    # old loop re-derived that per round with a LEFT join back to the
    # node spine (coalesce(NULL → 0)) — one broadcast exchange per
    # round for a set that never changes. Compute the set ONCE and
    # UNION the floor rows in per round instead (guide §2.4: remove
    # shuffles outright) — same doubles: teleport + damping·(0 +
    # d_mass/n) is exactly the literal below, and contribution nodes
    # keep the identical expression tree.
    no_in = nodes.join(
        norm.select(F.col("dst").alias("node")).distinct(),
        "node",
        "left_anti",
    ).localCheckpoint(eager=False)
    prev = pr
    for it in range(n_iter):
        if with_residual and it == n_iter - 1:
            prev = pr  # checkpointed — rereading it is cheap
        d_mass = (
            (
                dangling_nodes.join(pr, "node")
                .agg(F.sum("pr"))
                .first()[0]
                or 0.0
            )
            if has_dangling
            else 0.0
        )
        contrib = (
            norm.join(pr, norm["src"] == pr["node"])
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum(F.col("_p") * F.col("pr")).alias("_c"))
        )
        pr = (
            contrib.select(
                F.col("node2").alias("node"),
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.col("_c") + F.lit(d_mass / n))
                ).alias("pr"),
            )
            .unionByName(
                no_in.select(
                    "node",
                    F.lit(
                        teleport + damping * (d_mass / n)
                    ).alias("pr"),
                )
            )
            .localCheckpoint(eager=False)
        )
    if not with_residual:
        return pr
    l1 = (
        pr.join(
            prev.select("node", F.col("pr").alias("_prev")), "node"
        )
        .agg(F.sum(F.abs(F.col("pr") - F.col("_prev"))).alias("_r"))
        .first()[0]
        or 0.0
    )
    return pr.select("node", "pr", F.lit(float(l1)).alias("residual"))


def _pagerank_driver(
    spark,
    norm_rows,
    node_vals,
    node_type,
    damping: float,
    n_iter: int,
    has_dangling: bool,
    with_residual: bool,
) -> DataFrame:
    """Driver fast path of `pagerank` for graphs under the edge probe:
    the IDENTICAL recurrence (same normalized transition probabilities
    — the collected ``_p`` doubles are the ones the distributed join
    would consume; same teleport/dangling arithmetic, same float
    expression order per term) run as numpy passes over index arrays.
    Output sorted by node for determinism."""
    n = len(node_vals)
    idx = {v: i for i, v in enumerate(sorted(node_vals))}
    src = np.fromiter(
        (idx[r["src"]] for r in norm_rows), dtype=np.int64, count=len(norm_rows)
    )
    dst = np.fromiter(
        (idx[r["dst"]] for r in norm_rows), dtype=np.int64, count=len(norm_rows)
    )
    p = np.fromiter(
        (r["_p"] for r in norm_rows), dtype=np.float64, count=len(norm_rows)
    )
    dangling_mask = np.ones(n, dtype=bool)
    dangling_mask[src] = False
    pr = np.full(n, 1.0 / n)
    teleport = (1.0 - damping) / n
    prev = pr
    for it in range(n_iter):
        if with_residual and it == n_iter - 1:
            prev = pr
        d_mass = float(pr[dangling_mask].sum()) if has_dangling else 0.0
        contrib = np.zeros(n)
        np.add.at(contrib, dst, p * pr[src])
        pr = teleport + damping * (contrib + d_mass / n)
    fields = [
        T.StructField("node", node_type),
        T.StructField("pr", T.DoubleType()),
    ]
    if with_residual:
        residual = float(np.abs(pr - prev).sum())
        fields.append(T.StructField("residual", T.DoubleType()))
        rows = [
            (v, float(pr[i]), residual) for v, i in idx.items()
        ]
    else:
        rows = [(v, float(pr[i])) for v, i in idx.items()]
    return driver_rows_df(spark, rows, T.StructType(fields))


def _nation_revenue_edges(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Revenue-weighted nation trade edge grid (src = supplier nation,
    dst = customer nation, weight = exact-decimal revenue cast to
    double) — the star-join edge build shared by `nation_pagerank` and
    `nation_hits`; the shipment-COUNT twin for the oracle-backed
    combinatorial family is `trade_edge_counts`."""
    return (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .join(
            F.broadcast(
                supplier.select("s_suppkey", "s_nationkey")
            ),
            lineitem["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("s_nationkey").cast("long").alias("src"),
            F.col("c_nationkey").cast("long").alias("dst"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("weight")
        )
    )


def nation_pagerank(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    damping: float = PAGERANK_DAMPING,
    n_iter: int = PAGERANK_ITER,
    with_residual: bool = False,
) -> DataFrame:
    """PageRank over the nation-level trade graph — which nations sit
    at the CENTER of the supply network, not just which move the most
    revenue (`nation_trade_flows` answers volume for a nation PAIR;
    this ranks every nation by recursive importance: revenue from an
    important trading partner counts for more — the Brin-Page
    recursion on trade):
    edge (supplier nation → customer nation) weighted by total
    lineitem revenue shipped between them.

    Scale shape: the edge build is the star-join idiom — fact →
    broadcast supplier / customer key maps → ONE map-side-combined
    groupBy to the ≤|nations|² edge grid; `pagerank` then iterates on
    the grid-sized graph (25 nodes here; the operator itself holds at
    any node count). Rows-only correctness (float-iterative — no
    SQL-expressible oracle): pinned against a numpy power-iteration
    reference and Σpr = 1 in pytest.

    Output: (nation_key, pr) — pr DOUBLE round 6 (display grain; ties
    impossible on this graph, pinned by the reference comparison).
    ``with_residual=True`` appends the measured final-round L1 step
    (round 9 — it sits near 1e-5 at the default budget and rounding
    it to display grain would erase the evidence it exists to carry).
    """
    rev = _nation_revenue_edges(customer, orders, lineitem, supplier)
    pr = pagerank(
        rev, damping=damping, n_iter=n_iter, with_residual=with_residual
    )
    out = pr.select(
        F.col("node").alias("nation_key"),
        F.round("pr", 6).alias("pr"),
        *([F.round("residual", 9).alias("residual")]
          if with_residual else []),
    )
    return out


# -------------------------------------------------------------------
# Exactly-SQL-expressible graph analytics (r15 verdict item 3): the
# iterative-float family above is rows-only by nature; the combinatorial
# family below — degrees, reciprocity, triangles, clustering, common-
# neighbor link prediction — is pure joins + counts, so every operator
# carries a full DuckDB oracle. All run over the nation trade graph
# (supplier nation → customer nation), the same graph `nation_pagerank`
# ranks — the network-structure counterpart of the engine's pairwise
# trade rollups (`nation_trade_flows`, `neardup_source_matrix`).
# -------------------------------------------------------------------


def trade_edge_counts(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Directed nation trade graph with SHIPMENT-COUNT weights:
    (src, dst, cnt) — src = supplier nation, dst = customer nation,
    cnt = number of lineitems shipped between them. The integer weight
    is deliberate: the support-graph ops below threshold edges against
    the global mean, and ``cnt · n_edges ≥ total_cnt`` is exact 64-bit
    integer arithmetic — bit-identical in any engine, immune to the
    float-summation-order divergence a revenue mean would reintroduce
    (the revenue-weighted graph stays `nation_pagerank`'s concern).

    Scale shape: the star-join idiom — ONE pass over the fact,
    broadcast supplier key map, order-key equi-join for the customer
    side, map-side-combined groupBy to the ≤|nations|² grid.
    """
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("s_nationkey").cast("long").alias("src"),
            F.col("c_nationkey").cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _strong_directed(edge_counts: DataFrame) -> DataFrame:
    """Directed ABOVE-MEAN trade lanes: (src, dst) with src ≠ dst and
    ``cnt · n_lanes ≥ total_cnt`` — pure integer arithmetic on a
    broadcast 1-row aggregate (cnt ≤ ~1e12 lineitems × ~1e3 lanes
    stays far under the int64 ceiling), so the boundary decision is
    exact and engine-portable. Self-loops (domestic trade) are
    excluded from both the mean and the graph: a loop is not a network
    edge and every nation has one, so keeping them would only flatten
    the threshold. The ONE place the strong-edge semantics live —
    `trade_reciprocity` reads it directed, `_strong_support`
    canonicalizes it undirected."""
    lanes = edge_counts.filter(F.col("src") != F.col("dst"))
    tot = lanes.agg(
        F.count(F.lit(1)).alias("_n_lanes"),
        F.sum("cnt").alias("_total_cnt"),
    )
    return (
        lanes.join(F.broadcast(tot))
        .filter(F.col("cnt") * F.col("_n_lanes") >= F.col("_total_cnt"))
        .select("src", "dst")
    )


def _strong_support(edge_counts: DataFrame) -> DataFrame:
    """Undirected SUPPORT graph of the above-mean trade lanes:
    (a, b) with a < b, an edge iff SOME direction between the pair is
    strong (`_strong_directed`). On a complete business graph an
    unthresholded support is a clique and every structure metric
    degenerates to its maximum; above-mean keeps the metrics
    informative while staying parameter-free.
    """
    return (
        _strong_directed(edge_counts)
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def trade_degree_profile(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Per-nation degree/strength profile of the directed trade graph
    (self-loops excluded): how many distinct nations a nation supplies
    (out_degree) / buys from (in_degree), and the shipment volume on
    each side (out/in strength) — the first screen for hub nations
    before the recursive `nation_pagerank` view.

    Scale shape: edge grid built once (star join), then two grid-sized
    groupBys joined FULL OUTER over the node spine — no second fact
    scan; every aggregate is map-side-combinable.

    Output: (nation_key, out_degree, in_degree, out_shipments,
    in_shipments), zero-filled for one-sided nations, key asc.
    """
    lanes = trade_edge_counts(
        customer, orders, lineitem, supplier
    ).filter(F.col("src") != F.col("dst"))
    lanes = lanes.localCheckpoint(eager=False)  # two consumers
    outp = lanes.groupBy(F.col("src").alias("nation_key")).agg(
        F.count(F.lit(1)).cast("long").alias("out_degree"),
        F.sum("cnt").cast("long").alias("out_shipments"),
    )
    inp = lanes.groupBy(F.col("dst").alias("nation_key")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree"),
        F.sum("cnt").cast("long").alias("in_shipments"),
    )
    return (
        outp.join(inp, "nation_key", "full_outer")
        .select(
            "nation_key",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_shipments", F.lit(0)).alias("out_shipments"),
            F.coalesce("in_shipments", F.lit(0)).alias("in_shipments"),
        )
        .orderBy("nation_key")
    )


def trade_reciprocity(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Reciprocity of the STRONG trade graph — of the directed
    above-mean lanes, what fraction flow back above-mean in the other
    direction? (On the unthresholded graph every pair trades both ways
    and reciprocity is trivially 1 — the threshold is what makes the
    question real: heavy lanes are often one-sided.)

    Scale shape: the strong lane set is grid-sized; the reverse test
    is a self-equi-join on the swapped key pair (LEFT SEMI — no
    payload), then one global aggregate.

    Output: 1 row (n_strong_lanes, n_reciprocated, reciprocity
    round 6).
    """
    strong = _strong_directed(
        trade_edge_counts(customer, orders, lineitem, supplier)
    ).localCheckpoint(eager=False)  # read twice (probe + reverse)
    recip = strong.join(
        strong.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ),
        ["src", "dst"],
        "left_semi",
    )
    return (
        strong.agg(F.count(F.lit(1)).cast("long").alias("n_strong_lanes"))
        .crossJoin(
            recip.agg(
                F.count(F.lit(1)).cast("long").alias("n_reciprocated")
            )
        )
        .select(
            "n_strong_lanes",
            "n_reciprocated",
            F.round(
                F.col("n_reciprocated")
                / F.col("n_strong_lanes").cast("double"),
                6,
            ).alias("reciprocity"),
        )
    )


def trade_triangle_census(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Global triangle census of the strong trade support graph —
    node/edge counts, triangle count, and TRANSITIVITY (the
    probability that two strong partners of the same nation are
    themselves strong partners: 3·T / #wedges) — the one-row health
    card for how clique-like the above-mean trade web is.

    Scale shape (the Schank-Wagner / Cohen degree-ordered orientation,
    public knowledge): every undirected edge is oriented from its
    lower-(degree, id) endpoint to the higher, so each triangle is
    enumerated EXACTLY once at its minimum-order vertex and the
    per-vertex wedge work is C(outdeg, 2) with outdeg = O(√m) — the
    O(m^{3/2}) bound that makes distributed triangle counting viable;
    both joins (wedge self-join on the pivot, closure probe on the
    (v, w) pair) are EQUI-joins, never a band or cross join. Wedge
    count Σ C(deg, 2) is a grid-sized aggregate off the degree table.

    Output: 1 row (n_nodes, n_edges, n_triangles, transitivity
    round 6; transitivity NULL on a wedge-free graph — 0/0 is "no
    evidence", not "zero clustering").
    """
    return triangle_census(
        _strong_support(
            trade_edge_counts(customer, orders, lineitem, supplier)
        )
    )


#: Bounded probes for the dense-matmul triangle fast path (r17; the
#: kcore/pagerank driver-hybrid family). Below BOTH caps the triangle
#: kernels count on the driver via one exact 0/1-adjacency matmul —
#: common-neighbor counts are small integers (≤ node cap < 2^53), so
#: float64 BLAS is EXACT integer arithmetic, and the node cap bounds
#: the dense matrix at 4096² float64 = 134 MB and the matmul at
#: ~1.4e11 FLOP (seconds of BLAS). Above either cap the distributed
#: degree-ordered orientation kernel runs unchanged — that is the
#: O(m^{3/2}) shape that serves 100 TB.
TRIANGLE_DRIVER_EDGE_CAP = 1_000_000
TRIANGLE_DRIVER_NODE_CAP = 4096


def _triangle_probe(
    und: DataFrame,
    edge_cap: int = TRIANGLE_DRIVER_EDGE_CAP,
    node_cap: int = TRIANGLE_DRIVER_NODE_CAP,
):
    """Driver triangle counts under bounded probes, or ``None``.

    Returns ``(nodes, deg, tri_per_node, n_edges)`` where ``nodes`` is
    the sorted distinct node list (original values), ``deg`` the
    edge-row degree per node and ``tri_per_node`` the EXACT triangle
    count per node (int64) — ``((A·A) ∘ A)·1 / 2`` over the 0/1
    symmetric adjacency. ``und`` must be the kernels' documented
    contract: deduplicated canonical ``a < b`` pairs."""
    # Arrow collect (r17 opt): a 142k-edge probe costs ~1 s as py4j
    # Row deserialization and ~50 ms as an Arrow batch — same bounded
    # limit, same values (.tolist() yields plain Python scalars).
    pdf = und.select("a", "b").limit(edge_cap + 1).toPandas()
    if len(pdf) == 0 or len(pdf) > edge_cap:
        return None
    vals_a = pdf["a"].tolist()
    vals_b = pdf["b"].tolist()
    nodes = sorted(set(vals_a) | set(vals_b))
    n = len(nodes)
    if n > node_cap:
        return None
    idx = {v: i for i, v in enumerate(nodes)}
    ai = np.fromiter((idx[v] for v in vals_a), np.int64, len(vals_a))
    bi = np.fromiter((idx[v] for v in vals_b), np.int64, len(vals_b))
    deg = np.bincount(np.concatenate([ai, bi]), minlength=n)
    adj = np.zeros((n, n), dtype=np.float64)
    adj[ai, bi] = 1.0
    adj[bi, ai] = 1.0
    # (A·A) ∘ A row-sum = 2 × triangles at the node; all entries are
    # integers ≤ n < 2^53 ⇒ float64 matmul is exact
    tri = ((adj @ adj) * adj).sum(axis=1)
    tri_per_node = np.rint(tri / 2.0).astype(np.int64)
    return nodes, deg.astype(np.int64), tri_per_node, len(pdf)


def triangle_census(und: DataFrame) -> DataFrame:
    """Generic global triangle census over an undirected (a < b) edge
    list — node/edge counts, triangle count, transitivity (3·T /
    #wedges) — the kernel behind `trade_triangle_census` (25-node
    grid) and `user_triangles` (user-cardinality co-activity graph,
    where the degree-ordered orientation bound actually earns its
    keep). Scale shape and output contract per the trade wrapper's
    docstring; ``und`` must be deduplicated canonical a < b pairs.

    Under the bounded driver probes (``_triangle_probe``) the counts
    come from one exact driver matmul — identical integers, one edge
    build instead of the checkpoint + degree join + wedge self-join +
    closure semi-join pipeline; the final transitivity expression is
    the SAME Spark select either way."""
    probe = _triangle_probe(und)
    if probe is not None:
        nodes, deg, tri_per_node, n_edges = probe
        spark = und.sparkSession
        base = driver_rows_df(spark,
            [
                (
                    len(nodes),
                    n_edges,
                    int(tri_per_node.sum()) // 3,
                    int((deg * (deg - 1) // 2).sum()),
                )
            ],
            "n_nodes long, n_edges long, n_triangles long, _wedges long",
        )
    else:
        und = und.localCheckpoint(eager=False)
        deg = _support_degrees(und).localCheckpoint(eager=False)
        tri = _oriented_triangles(und, deg)
        counts = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        nodes_wedges = deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(
                F.col("deg") * (F.col("deg") - F.lit(1)) / F.lit(2)
            ).cast("long").alias("_wedges"),
        )
        ntri = tri.agg(
            F.count(F.lit(1)).cast("long").alias("n_triangles")
        )
        base = nodes_wedges.crossJoin(counts).crossJoin(ntri)
    return base.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.round(
            F.lit(3) * F.col("n_triangles")
            / F.when(F.col("_wedges") > 0, F.col("_wedges")),
            6,
        ).alias("transitivity"),
    )


def _support_degrees(und: DataFrame) -> DataFrame:
    """(node, deg) of the undirected support — the ONE degree
    computation every structure op shares (census, clustering,
    assortativity, and the orientation kernel itself; callers
    localCheckpoint it when several consumers read it)."""
    return (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def _oriented_triangles(und: DataFrame, deg: DataFrame = None) -> DataFrame:
    """Enumerate each triangle of the undirected (a < b) edge set
    EXACTLY once as (x, y, z) via degree-ordered orientation. Shared
    kernel of the census and the per-node clustering op; pass the
    caller's `_support_degrees` table to avoid recomputing it in the
    same plan."""
    if deg is None:
        deg = _support_degrees(und)
    # orient: u = lower (deg, id) endpoint, v = higher; carry v's key
    # so the wedge self-join can order u's out-neighbors consistently
    e = (
        und.join(deg.select(F.col("node").alias("a"),
                            F.col("deg").alias("_da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("deg").alias("_db")), "b")
    )
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dv"),
    ).localCheckpoint(eager=False)  # read three times below
    o2 = oriented.select(
        F.col("u").alias("u2"),
        F.col("v").alias("w"),
        F.col("_dv").alias("_dw"),
    )
    wedges = oriented.join(o2, F.col("u") == F.col("u2")).filter(
        (F.col("_dv") < F.col("_dw"))
        | ((F.col("_dv") == F.col("_dw")) & (F.col("v") < F.col("w")))
    )
    closure = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    return wedges.join(closure, ["v", "w"], "left_semi").select(
        F.col("u").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )


def trade_clustering(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Per-nation LOCAL clustering on the strong trade support graph:
    of the pairs of a nation's strong partners, what fraction trade
    strongly with each other (triangles_i / C(deg_i, 2))? High-degree
    low-clustering nations are BROKERS (they bridge communities);
    high-clustering ones sit inside a trading bloc.

    Scale shape: triangles come from the degree-ordered kernel
    (enumerated once each), then fan out to their three corners —
    3·T rows, never more — and aggregate per node; degrees are a
    grid-sized groupBy. One LEFT join zero-fills triangle-free nodes.

    Output: (nation_key, degree, n_triangles, clustering round 6 —
    NULL for degree-1 nodes: a single partner yields no pair to
    close), key asc.
    """
    return local_clustering(
        _strong_support(
            trade_edge_counts(customer, orders, lineitem, supplier)
        ),
        key_col="nation_key",
    )


def local_clustering(und: DataFrame, key_col: str = "node") -> DataFrame:
    """Generic per-node local clustering over an undirected (a < b)
    edge list (triangles_i / C(deg_i, 2)) — the kernel behind
    `trade_clustering` and `user_clustering`. Scale shape and output
    contract per the trade wrapper's docstring; output key column is
    named ``key_col``, ascending.

    Under the bounded driver probes (``_triangle_probe``) the per-node
    integer counts come from one exact driver matmul — the wedge
    self-join, closure semi-join and 3·T corner fan-out disappear; the
    rounding select and ordering are the SAME Spark expressions either
    way. Above either cap the distributed orientation kernel runs
    unchanged.
    """
    probe = _triangle_probe(und)
    if probe is not None:
        nodes, deg_arr, tri_per_node, _n_edges = probe
        spark = und.sparkSession
        key_type = und.schema["a"].dataType
        schema = T.StructType(
            [
                T.StructField("node", key_type),
                T.StructField("degree", T.LongType()),
                T.StructField("n_triangles", T.LongType()),
            ]
        )
        joined = driver_rows_df(spark,
            [
                (nodes[i], int(deg_arr[i]), int(tri_per_node[i]))
                for i in range(len(nodes))
            ],
            schema,
        )
        return joined.select(
            F.col("node").alias(key_col),
            "degree",
            F.col("n_triangles"),
            F.round(
                F.col("n_triangles")
                / F.when(
                    F.col("degree") > 1,
                    F.col("degree") * (F.col("degree") - 1) / F.lit(2),
                ),
                6,
            ).alias("clustering"),
        ).orderBy(key_col)
    und = und.localCheckpoint(eager=False)
    deg_nodes = _support_degrees(und).localCheckpoint(eager=False)
    tri = _oriented_triangles(und, deg_nodes)
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = deg_nodes.select("node", F.col("deg").alias("degree"))
    return (
        deg.join(per_node, "node", "left")
        .select(
            F.col("node").alias(key_col),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.round(
                F.coalesce(F.col("n_triangles"), F.lit(0))
                / F.when(
                    F.col("degree") > 1,
                    F.col("degree") * (F.col("degree") - 1) / F.lit(2),
                ),
                6,
            ).alias("clustering"),
        )
        .orderBy(key_col)
    )


def trade_link_prediction(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Common-neighbor link prediction over the strong trade support
    graph: for every NON-adjacent nation pair, how much shared strong
    partnership points to a future strong lane — common-neighbor
    count, Jaccard overlap of partner sets, and the Adamic-Adar score
    (Σ 1/ln deg(c) over common partners c: a shared RARE partner is
    stronger evidence than a shared hub — Adamic & Adar 2003, public
    knowledge).

    Scale shape: candidate pairs come from wedges (two edges sharing
    a pivot), so the pair space is Σ C(deg, 2) — never |V|²; the
    adjacency EXCLUSION is a left-anti equi-join on the canonical
    (a, b) key; per-pair scores are one map-side-combined groupBy, and
    the Jaccard denominator joins two broadcast-sized degree maps
    (|deg(a)| + |deg(b)| − common). ln(deg) is computed per PIVOT
    before aggregation — no per-pair recomputation.

    Output: (nation_a, nation_b, common_neighbors, jaccard round 6,
    adamic_adar round 6), pair asc — only pairs with ≥1 common
    neighbor (a zero-evidence pair predicts nothing).
    """
    und = _strong_support(
        trade_edge_counts(customer, orders, lineitem, supplier)
    ).localCheckpoint(eager=False)
    # symmetric adjacency (both directions) + degree per node
    adj = und.select("a", "b").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # wedges through pivot c: neighbors u < w of c form a candidate pair
    nb = adj.select(F.col("a").alias("c"), F.col("b").alias("u")).join(
        deg.select(F.col("node").alias("c"), F.col("deg").alias("_dc")),
        "c",
    )
    nb2 = nb.select(
        F.col("c"), F.col("u").alias("w"), F.col("_dc")
    )
    pairs = (
        nb.join(nb2.drop("_dc"), "c")
        .filter(F.col("u") < F.col("w"))
        .select(
            F.col("u").alias("nation_a"),
            F.col("w").alias("nation_b"),
            (F.lit(1.0) / F.log(F.col("_dc"))).alias("_aa"),
        )
    )
    # drop pairs already adjacent (canonical a<b key matches und)
    open_pairs = pairs.join(
        und.select(
            F.col("a").alias("nation_a"), F.col("b").alias("nation_b")
        ),
        ["nation_a", "nation_b"],
        "left_anti",
    )
    # Adamic-Adar is the ONE float column here whose value is a SUM of
    # several distinct doubles (1/ln deg per common neighbor) — double
    # addition is order-dependent, and a shuffle-order-dependent sum
    # compared against an oracle by hash parity can flake at a rounding
    # boundary (r16 ADVICE item 1). Canonicalize: collect the terms,
    # sort ascending, fold sequentially — the oracle mirrors with
    # list_reduce over list_sort, so both engines add the SAME doubles
    # in the SAME order and the result is bit-identical by IEEE
    # determinism, the same discipline trade_edge_counts buys with
    # integer weights.
    scored = open_pairs.groupBy("nation_a", "nation_b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.aggregate(
            F.sort_array(F.collect_list("_aa")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_aa_sum"),
    )
    return (
        scored.join(
            F.broadcast(deg.select(F.col("node").alias("nation_a"),
                                   F.col("deg").alias("_da"))),
            "nation_a",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("nation_b"),
                                   F.col("deg").alias("_db"))),
            "nation_b",
        )
        .select(
            "nation_a",
            "nation_b",
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (
                    F.col("_da") + F.col("_db")
                    - F.col("common_neighbors")
                ).cast("double"),
                6,
            ).alias("jaccard"),
            F.round("_aa_sum", 6).alias("adamic_adar"),
        )
        .orderBy("nation_a", "nation_b")
    )


def trade_assortativity(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Degree assortativity of the strong trade support graph — the
    Newman (PRL 2002) Pearson correlation of endpoint degrees over
    edges: r > 0 means hub nations trade with hubs (a rich club),
    r < 0 means hubs fan out to the periphery (the hub-and-spoke
    shape). Read next to `trade_clustering`: clustering says whether
    partners close triangles, assortativity says WHO partners with
    whom by degree.

    Exactness: every moment (Σjk, Σj, Σj², over both orientations of
    each edge so the correlation is symmetric) is an exact int64 sum
    of degree products — degrees are grid-bounded, no overflow; r is
    then four IEEE operations on identical doubles in any engine. NULL
    when the degree variance is 0 (a regular graph has no degree
    mixing to correlate — 0/0 is "undefined", not "neutral").

    Scale shape: degree table (grid-sized groupBy) broadcast-joined to
    both endpoints of the edge list, ONE global aggregate. Output:
    1 row (n_edges, assortativity round 6).
    """
    return assortativity(
        _strong_support(
            trade_edge_counts(customer, orders, lineitem, supplier)
        )
    )


def _assort_probe(und: DataFrame, edge_cap: int = TRIANGLE_DRIVER_EDGE_CAP):
    """Exact assortativity moments under a bounded edge probe, or
    ``None``. Returns ``(m2, sjk, sj, sj2)`` as plain Python ints —
    the SAME both-orientation stub moments the distributed aggregate
    sums (Σ1, Σj·k, Σj, Σj² over stubs): per edge both orientations
    contribute, so m2 = 2·|E|, sjk = 2·Σ_E deg_a·deg_b, and the j
    moments fold both endpoints. Python ints are arbitrary-precision,
    so exactness needs no width argument at all (the distributed path
    carries the same values as DECIMAL(38,0))."""
    pdf = und.select("a", "b").limit(edge_cap + 1).toPandas()
    if len(pdf) == 0 or len(pdf) > edge_cap:
        return None
    vals_a = pdf["a"].tolist()
    vals_b = pdf["b"].tolist()
    idx = {}
    for v in vals_a:
        idx.setdefault(v, len(idx))
    for v in vals_b:
        idx.setdefault(v, len(idx))
    ai = np.fromiter((idx[v] for v in vals_a), np.int64, len(vals_a))
    bi = np.fromiter((idx[v] for v in vals_b), np.int64, len(vals_b))
    deg = np.bincount(np.concatenate([ai, bi]), minlength=len(idx))
    # int64 is provably wide enough under the cap (deg ≤ 2m ≤ 2^21,
    # so Σ_E deg·deg ≤ 2^21·2^21·2^20 = 2^62 and Σ deg³ ≤ 2^62), but
    # the returned moments go through int() anyway — exact by
    # construction, same discipline as the triangle matmul.
    m2 = 2 * len(pdf)
    sjk = 2 * int(np.sum(deg[ai] * deg[bi], dtype=np.int64))
    sj = int(np.sum(deg * deg, dtype=np.int64))
    sj2 = int(np.sum(deg * deg * deg, dtype=np.int64))
    return m2, sjk, sj, sj2


def assortativity(und: DataFrame) -> DataFrame:
    """Generic Newman degree assortativity over an undirected (a < b)
    edge list — the kernel behind `trade_assortativity` and
    `user_assortativity`. Exact int64 moments over both edge
    orientations, one global aggregate; contract per the trade
    wrapper's docstring (NULL at zero degree variance).

    Under the bounded edge probe (``_assort_probe``) the four moments
    come from one driver pass — identical integers (exact in both
    engines), and the final r expression is the SAME Spark select
    either way, so the doubles are bit-identical by construction.
    """
    probe = _assort_probe(und)
    if probe is not None:
        m2, sjk, sj, sj2 = probe
        m = driver_rows_df(
            und.sparkSession,
            [(m2, _dec.Decimal(sjk), _dec.Decimal(sj), _dec.Decimal(sj2))],
            "_m2 long, _sjk decimal(38,0), _sj decimal(38,0), "
            "_sj2 decimal(38,0)",
        )
    else:
        m = _assort_moments_distributed(und)
    mean = F.col("_sj").cast("double") / F.col("_m2")
    cov = F.col("_sjk").cast("double") / F.col("_m2") - mean * mean
    var = F.col("_sj2").cast("double") / F.col("_m2") - mean * mean
    return m.select(
        (F.col("_m2") / F.lit(2)).cast("long").alias("n_edges"),
        F.round(cov / F.when(var > 0, var), 6).alias("assortativity"),
    )


def _assort_moments_distributed(und: DataFrame) -> DataFrame:
    """The 1-row both-orientation stub moments as a distributed plan —
    the above-cap path (and the probe's equivalence reference)."""
    und = und.localCheckpoint(eager=False)
    deg = _support_degrees(und)
    stubs = und.select("a", "b").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    joined = (
        stubs.join(
            F.broadcast(deg.select(F.col("node").alias("a"),
                                   F.col("deg").alias("_j"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("b"),
                                   F.col("deg").alias("_k"))),
            "b",
        )
    )
    # moments as DECIMAL(38,0), not int64 (the user_burstiness
    # discipline): on a |users|-node graph Σ(j·k) over 2m stubs can
    # pass 2^63 (deg ~1e6 squared × 1e12 stubs ≈ 1e24 — inside dec38),
    # while the 25-nation grid never could; exact either way, and the
    # final double division is identical in both engines
    _d = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("_m2"),
        F.sum((_d(F.col("_j")) * _d(F.col("_k"))).cast("decimal(38,0)"))
        .alias("_sjk"),
        F.sum(_d(F.col("_j")).cast("decimal(38,0)")).alias("_sj"),
        F.sum((_d(F.col("_j")) * _d(F.col("_j"))).cast("decimal(38,0)"))
        .alias("_sj2"),
    )


#: k-core round budget: coreness h-index iteration converges in at
#: most the graph's degeneracy-ordering depth — tiny for business
#: graphs; the cap only exists so a pathological input fails LOUDLY
#: (the CC kernels' round-cap discipline) instead of looping.
KCORE_MAX_ITER = 64


def trade_kcore(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    max_iter: int = KCORE_MAX_ITER,
    max_driver_edges: int = 1_000_000,
) -> DataFrame:
    """Coreness (k-core number) of every nation in the strong trade
    support graph — the robustness ladder peeling can't fake: a node
    of coreness k survives the removal of everything with fewer than
    k strong partners, so the max-core is the densely interlocked
    trading nucleus and low-coreness nations are peripheral even when
    their raw degree is high (a hub of leaves has coreness 1).

    Algorithm (Lü-Chen-Ren-Zhang-Zhang-Zhou, Nature Comms 2016,
    public knowledge): iterate per-node H-INDEX of neighbor values,
    seeded with degree — values are integers, MONOTONE non-increasing,
    and the fixpoint is exactly the coreness, so convergence is
    EXACT: the integer value-sum is strictly decreasing until the
    fixpoint, and one unchanged sum proves global convergence (the CC
    kernels' checksum discipline — no float residual, unlike
    `pagerank`). Raises loudly at the round cap.

    Scale shape: adjacency computed once and checkpointed; each round
    is ONE equi-join (neighbor values) + a per-NODE window whose
    partitions are degree-bounded (never corpus-wide — the h-index
    needs each node's own neighbor list sorted, nothing global) + one
    1-row exact checksum; value state checkpoints per round so lineage
    cannot grow.

    Output: (nation_key, coreness), key asc; rows-only (iterative —
    no SQL oracle), pinned against a brute-force peeling reference.
    """
    return kcore(
        _strong_support(
            trade_edge_counts(customer, orders, lineitem, supplier)
        ),
        max_iter=max_iter,
        key_col="nation_key",
        max_driver_edges=max_driver_edges,
    )


def _kcore_driver_peel(spark, edge_rows, key_col: str) -> DataFrame:
    """Exact coreness by Matula–Beck peeling over a collected (small,
    Arrow-probed pandas) edge list — repeatedly remove the
    minimum-current-degree node; a
    node's coreness is the running max of its degree at removal.
    O((n+m) log n) with a lazy heap; identical values to the h-index
    fixpoint (both compute the unique k-core number)."""
    import heapq

    adj: dict = {}
    for a, b in zip(
        edge_rows["a"].tolist(), edge_rows["b"].tolist()
    ):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed: set = set()
    core: dict = {}
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue  # stale heap entry (degree already decremented)
        k = max(k, d)
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return driver_rows_df(spark,
        sorted(core.items()), f"{key_col} long, coreness long"
    ).orderBy(key_col)


def kcore(
    und: DataFrame,
    max_iter: int = KCORE_MAX_ITER,
    key_col: str = "node",
    max_driver_edges: int = 1_000_000,
) -> DataFrame:
    """Generic coreness (k-core number) over an undirected (a < b)
    edge list — the kernel behind `trade_kcore` and `user_kcore`.

    Hybrid, like the dedup module's CC (`neardup_clusters` rationale,
    applied after r17 measurement — the distributed fixpoint spent
    10.8 s on a 142k-edge graph the driver peels in milliseconds,
    ~2 Spark jobs per round × a data-dependent round count): below
    ``max_driver_edges`` the edge list is collected ONCE (the
    limit(n+1) probe IS the size check) and exact Matula–Beck peeling
    runs on the driver; above it, the distributed h-index fixpoint
    (algorithm, exact-integer convergence checksum, loud round-cap,
    and scale shape per the trade wrapper's docstring) — identical
    values either way, pinned by a test that forces both paths.
    Output is (``key_col``, coreness), ascending.
    """
    if max_iter < 1:
        raise ValueError(
            f"kcore: max_iter must be >= 1, got {max_iter}"
        )
    if max_driver_edges > 0:
        # Arrow probe (r17 opt — the `_triangle_probe` rationale)
        probe = und.select("a", "b").limit(
            max_driver_edges + 1
        ).toPandas()
        if len(probe) <= max_driver_edges:
            return _kcore_driver_peel(
                und.sparkSession, probe, key_col
            )
        und = und.localCheckpoint()  # loop must not re-run the build
    adj = (
        und.select("a", "b")
        .unionAll(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .localCheckpoint(eager=False)
    )
    vals = (
        adj.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("u").orderBy(
        F.desc("_nv"), F.asc("v")
    )
    checksum = vals.agg(F.sum("value")).first()[0] or 0
    for _ in range(max_iter):
        nbr = adj.join(
            vals.select(F.col("node").alias("v"),
                        F.col("value").alias("_nv")),
            F.col("b") == F.col("v"),
        ).select(F.col("a").alias("u"), "v", "_nv")
        vals = (
            nbr.withColumn("_rn", F.row_number().over(w))
            .groupBy(F.col("u").alias("node"))
            .agg(
                F.max(F.least(F.col("_rn"), F.col("_nv")))
                .cast("long")
                .alias("value")
            )
            .localCheckpoint(eager=False)
        )
        new_sum = vals.agg(F.sum("value")).first()[0] or 0
        if new_sum == checksum:
            return vals.select(
                F.col("node").alias(key_col),
                F.col("value").alias("coreness"),
            ).orderBy(key_col)
        checksum = new_sum
    raise RuntimeError(
        f"kcore: did not converge within {max_iter} rounds — "
        "the h-index fixpoint is guaranteed finite, so this input "
        "(or a kernel bug) needs looking at, not silent wrong labels"
    )


#: HITS round budget — same fixed-budget rationale as PAGERANK_ITER
#: (float fixpoint, no exact convergence test), but TUNED against the
#: measured residual rather than inheriting PageRank's 20 (r16 verdict
#: item 2): hub/authority power iteration converges at the SQUARE of
#: the graph's singular-value ratio, and on the near-complete trade
#: graphs this engine builds the measured trajectory (numpy mirror of
#: the exact loop, sf0.001/0.01/0.1) hits machine epsilon long before
#: 8 rounds — residual 1.7e-11 / 1.0e-8 / 1.7e-11 at round 4, ≤ 5e-15
#: by round 8, and the round-6 DISPLAY values stop changing at round 3
#: on every tested graph. 8 keeps a ≥4-round margin over display-grain
#: convergence while halving the fleet's most expensive entry (20
#: rounds × two shuffle stages was the r16 cost ceiling); the measured
#: `with_residual` column is the per-graph evidence — a slow-mixing
#: graph that needs more shows a residual above tolerance, and the
#: caller raises the budget (`tests/test_r17_ops.py` pins the
#: trajectory claim on the real sf0.01 graph).
HITS_ITER = 8


def hits(
    edges: DataFrame,
    n_iter: int = HITS_ITER,
    with_residual: bool = False,
    max_driver_edges: int = 1_000_000,
) -> DataFrame:
    """Weighted HITS (Kleinberg JACM 1999) over a (src, dst, weight)
    edge list — the directed DUAL reading `pagerank` collapses: a HUB
    points at good authorities (``h ← Σ w·a(dst)``), an AUTHORITY is
    pointed at by good hubs (``a ← Σ w·h(src)``); on the trade graph
    hubs are the great BUYERS' suppliers-side mirror — a nation
    supplying many strong importers — while authorities are the great
    importers themselves, two rankings one scalar score cannot carry.

    Semantics: the standard alternating power iteration with L1
    normalization each half-step (Σh = Σa = 1 — a loop invariant like
    pagerank's Σpr; L1 keeps every value a share, directly readable),
    positive weights validated, scores seeded uniform over the
    relevant side (hubs: nodes with out-edges; authorities: nodes
    with in-edges — a node with neither role scores 0 on that side,
    the honest value, not a teleport floor: HITS has no damping).

    Scale shape: the pagerank contract — edge list checkpointed once;
    each round is TWO equi-joins + two map-side groupBys + two 1-row
    normalization aggregates; state checkpoints per round so lineage
    cannot grow. ``with_residual`` appends the measured final-round
    L1 step over the concatenated (h, a) state — the same
    evidence-not-assertion discipline as `pagerank` (NULL at
    ``n_iter=1``, where no previous authority state exists to
    difference against).

    Output: (node, hub, authority) DOUBLE, plus ``residual`` when
    requested; rows-only (float-iterative), numpy-pinned in pytest.
    """
    if n_iter < 1:
        raise ValueError(f"hits: n_iter must be >= 1, got {n_iter}")
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    w_edges = edges.select(
        "src", "dst", F.col("weight").cast("double").alias("_w")
    ).localCheckpoint(eager=False)
    # hybrid (r17 optimization round — `pagerank`'s driver fast path,
    # same rationale and bounded-probe contract): under the edge
    # probe, the alternating half-steps run as numpy passes on the
    # collected weighted edge list; identical recurrence, pinned
    # both-paths at display grain in pytest.
    #
    # r18 (guide §1.2 — construction jobs ARE the bench cost): below
    # the cap, the empty/weight validation, the hub count and the node
    # set all derive EXACTLY from the probe rows (``_w`` is the
    # per-row double cast — no aggregation, so the checks are
    # row-local and exact), collapsing the old three driver actions
    # (stats aggregate, node collect, probe) into ONE. Above the cap
    # the full-scan stats aggregate runs as before.
    if max_driver_edges > 0:
        probe = w_edges.limit(max_driver_edges + 1).collect()
        if len(probe) <= max_driver_edges:
            if not probe:
                raise ValueError("hits: empty edge list")
            if any(r["_w"] is None or r["_w"] <= 0 for r in probe):
                raise ValueError(
                    "hits: edge weights must be positive and non-NULL"
                )
            node_set = {r["src"] for r in probe} | {
                r["dst"] for r in probe
            }
            return _hits_driver(
                edges.sparkSession,
                probe,
                list(node_set),
                nodes.schema["node"].dataType,
                len({r["src"] for r in probe}),
                n_iter,
                with_residual=with_residual,
            )
    # distributed path: ONE eager action validates and sizes
    # everything the loop needs: empty-input check (n_edges), weight
    # validation (n_bad), and the hub-seed denominator (n_hubs) come
    # off a single 1-row aggregate instead of three separate driver
    # jobs (r16 ADVICE item 3).
    stats = edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            (F.col("weight").isNull() | (F.col("weight") <= 0)).cast(
                "int"
            )
        ).alias("n_bad"),
        F.countDistinct("src").alias("n_hubs"),
    ).first()
    if stats["n_edges"] == 0:
        raise ValueError("hits: empty edge list")
    if stats["n_bad"]:
        raise ValueError(
            "hits: edge weights must be positive and non-NULL"
        )
    hubs_spine = w_edges.select(F.col("src").alias("node")).distinct()
    n_hubs = stats["n_hubs"]
    h = hubs_spine.select(
        "node", F.lit(1.0 / n_hubs).alias("h")
    ).localCheckpoint(eager=False)
    a = None
    prev_h = h
    prev_a = a
    for it in range(n_iter):
        if with_residual and it == n_iter - 1:
            prev_h, prev_a = h, a
        # Normalization stays IN-PLAN: the L1 total rides back in as a
        # broadcast 1-row aggregate (the audit-blessed bounded-BNLJ
        # shape) instead of a per-half-step driver `.first()` — no
        # blocking driver round-trips inside the loop. Measured at
        # sf0.1 in-block: 11.9 s with the collects → 7.0 s without;
        # the remaining ~1.5x over `nation_pagerank` is round-count ×
        # STAGE-count bound (two shuffle stages per round vs
        # PageRank's one — the honest price of the dual ranking).
        # Same doubles either way: identical sum, identical IEEE
        # division.
        # authority update: mass flows along edges from hubs
        a_raw = (
            w_edges.join(h, w_edges["src"] == h["node"])
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum(F.col("_w") * F.col("h")).alias("_a"))
            .localCheckpoint(eager=False)  # two consumers below
        )
        a = a_raw.crossJoin(
            F.broadcast(a_raw.agg(F.sum("_a").alias("_at")))
        ).select(
            F.col("node2").alias("node"),
            (F.col("_a") / F.col("_at")).alias("a"),
        )
        # hub update: mass flows against edges from authorities
        h_raw = (
            w_edges.join(a, w_edges["dst"] == a["node"])
            .groupBy(F.col("src").alias("node2"))
            .agg(F.sum(F.col("_w") * F.col("a")).alias("_h"))
            .localCheckpoint(eager=False)
        )
        h = h_raw.crossJoin(
            F.broadcast(h_raw.agg(F.sum("_h").alias("_ht")))
        ).select(
            F.col("node2").alias("node"),
            (F.col("_h") / F.col("_ht")).alias("h"),
        )
    out = (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
            F.coalesce("a", F.lit(0.0)).alias("authority"),
        )
    )
    if not with_residual:
        return out
    def _l1(cur, prev, col):
        return (
            cur.join(
                prev.select("node", F.col(col).alias("_p")), "node"
            )
            .agg(F.sum(F.abs(F.col(col) - F.col("_p"))))
            .first()[0]
            or 0.0
        )
    if prev_a is None:
        # n_iter=1: there is no previous authority state to difference
        # against (a starts undefined), so the L1 step over the full
        # (h, a) state is UNDEFINED — report NULL, not a silently
        # halved hub-only number (r16 verdict item 6: a defined output
        # contract at every reachable signature).
        return out.select(
            "node",
            "hub",
            "authority",
            F.lit(None).cast("double").alias("residual"),
        )
    res = (_l1(h, prev_h, "h") or 0.0) + (_l1(a, prev_a, "a") or 0.0)
    return out.select(
        "node", "hub", "authority", F.lit(float(res)).alias("residual")
    )


def _hits_driver(
    spark,
    edge_rows,
    node_vals,
    node_type,
    n_hubs: int,
    n_iter: int,
    with_residual: bool,
) -> DataFrame:
    """Driver fast path of `hits` for graphs under the edge probe:
    the identical alternating L1-normalized half-steps as numpy
    passes over index arrays (hub state lives on source nodes,
    authority on destination nodes — exactly the spines the
    distributed joins touch; zero elsewhere, the coalesce-0 output
    contract). Output sorted by node."""
    n = len(node_vals)
    idx = {v: i for i, v in enumerate(sorted(node_vals))}
    src = np.fromiter(
        (idx[r["src"]] for r in edge_rows), dtype=np.int64, count=len(edge_rows)
    )
    dst = np.fromiter(
        (idx[r["dst"]] for r in edge_rows), dtype=np.int64, count=len(edge_rows)
    )
    w = np.fromiter(
        (r["_w"] for r in edge_rows), dtype=np.float64, count=len(edge_rows)
    )
    h = np.zeros(n)
    h[src] = 1.0 / n_hubs
    a = None  # defined from round 1, like the distributed loop
    prev_h, prev_a = h, None
    for it in range(n_iter):
        if with_residual and it == n_iter - 1:
            prev_h, prev_a = h, a
        a_raw = np.zeros(n)
        np.add.at(a_raw, dst, w * h[src])
        a = a_raw / a_raw.sum()
        h_raw = np.zeros(n)
        np.add.at(h_raw, src, w * a[dst])
        h = h_raw / h_raw.sum()
    fields = [
        T.StructField("node", node_type),
        T.StructField("hub", T.DoubleType()),
        T.StructField("authority", T.DoubleType()),
    ]
    if not with_residual:
        rows = [
            (v, float(h[i]), float(a[i])) for v, i in idx.items()
        ]
        return driver_rows_df(spark, rows, T.StructType(fields))
    fields.append(T.StructField("residual", T.DoubleType()))
    if prev_a is None:
        # n_iter=1: no previous authority state — NULL residual (the
        # distributed path's documented contract)
        res = None
    else:
        res = float(
            np.abs(h - prev_h).sum() + np.abs(a - prev_a).sum()
        )
    rows = [
        (v, float(h[i]), float(a[i]), res) for v, i in idx.items()
    ]
    return driver_rows_df(spark, rows, T.StructType(fields))


def nation_hits(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    n_iter: int = HITS_ITER,
) -> DataFrame:
    """HITS over the revenue-weighted nation trade graph (same edge
    build as `nation_pagerank` — the star-join idiom): hub = a nation
    whose exports feed the network's big importers, authority = a
    nation whose imports are fed by the big exporters. Output
    (nation_key, hub round 6, authority round 6), rows-only
    (float-iterative), numpy-pinned."""
    rev = _nation_revenue_edges(customer, orders, lineitem, supplier)
    out = hits(rev, n_iter=n_iter)
    return out.select(
        F.col("node").alias("nation_key"),
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    ).orderBy("nation_key")


# -------------------------------------------------------------------
# User co-activity graph (r16 verdict item 1): every combinatorial
# kernel above first shipped against the 25-node nation grid, where
# the O(m^{3/2}) orientation bound and the wedge-bounded pair space
# are asserted but never exercised. The session co-activity graph —
# nodes = users, an edge when two users' sessions overlap in time
# (the oracle-checked `session_overlap_pairs` join) — has a
# USER-cardinality node set (1.5k nodes / 142k edges / 1.57M
# triangles at sf0.1; |users| at 100 TB), so the same kernels run
# here prove the bounds on a real non-grid graph. No strong-edge
# threshold: unlike the complete trade grid, co-activity is sparse
# by nature (overlap is the rare event), so the raw overlap edge set
# is already informative.
# -------------------------------------------------------------------


def coactivity_support(
    events: DataFrame,
    gap_seconds: int = None,
    bucket_seconds: int = None,
) -> DataFrame:
    """Undirected user co-activity edge list (a < b): one edge per
    user pair with at least one overlapping session — exactly the
    pair set `temporal.session_overlap_pairs` scores, reduced to its
    canonical key (the groupBy there already emits user_a < user_b
    exactly once). Shared edge build for `user_triangles` /
    `user_clustering` / `user_kcore`; scale shape is the bucketized
    interval join documented on the pairs op (equi-join on time
    bucket, never a corpus² range condition).
    """
    from scholar_stream_spark.operators import temporal

    kwargs = {}
    if gap_seconds is not None:
        kwargs["gap_seconds"] = gap_seconds
    if bucket_seconds is not None:
        kwargs["bucket_seconds"] = bucket_seconds
    return temporal.session_overlap_pairs(events, **kwargs).select(
        F.col("user_a").alias("a"), F.col("user_b").alias("b")
    )


def user_triangles(events: DataFrame) -> DataFrame:
    """Global triangle census of the user co-activity graph — how
    clique-like co-activity is (flash crowds and coordinated account
    rings close triangles; organically independent users do not).
    Same 1-row output contract as `trade_triangle_census`; the
    degree-ordered orientation kernel runs here on a |users|-node
    graph, where its C(outdeg, 2) wedge bound is the difference
    between Σ C(deg, 2) raw wedges (29.7M at sf0.1) and the oriented
    pair space actually joined.
    """
    return triangle_census(coactivity_support(events))


def user_clustering(events: DataFrame) -> DataFrame:
    """Per-user local clustering on the co-activity graph: of the
    pairs of users co-active with u, what fraction are co-active
    with each other — near 1 inside a coordinated ring or fixed
    cohort, near 0 for a user whose overlaps are incidental (the
    broker shape). Output (user_id, degree, n_triangles, clustering
    round 6 — NULL at degree 1), user asc.
    """
    return local_clustering(coactivity_support(events), key_col="user_id")


def user_kcore(
    events: DataFrame,
    max_iter: int = KCORE_MAX_ITER,
    max_driver_edges: int = 1_000_000,
) -> DataFrame:
    """Coreness of every user in the co-activity graph — the
    densely-interlocked co-activity nucleus (a user of coreness k
    stays co-active after removing everyone with fewer than k
    co-active partners): the robustness reading of `user_clustering`,
    and on a |users|-node graph the h-index fixpoint runs a real
    data-dependent depth instead of the grid's 2-3 rounds. Output
    (user_id, coreness), user asc; rows-only (iterative — no SQL
    oracle), pinned against the brute-force peeling reference.
    """
    return kcore(
        coactivity_support(events),
        max_iter=max_iter,
        key_col="user_id",
        max_driver_edges=max_driver_edges,
    )


def user_assortativity(events: DataFrame) -> DataFrame:
    """Degree assortativity of the user co-activity graph — do
    highly-co-active users overlap with each other (a rich club of
    always-on accounts: coordinated rings score strongly positive) or
    with the periphery (hub-and-spoke: one always-on account brushing
    many casual users)? The 1-row mixing summary read next to
    `user_clustering`'s per-user detail. Output (n_edges,
    assortativity round 6), NULL on a degree-regular graph.
    """
    return assortativity(coactivity_support(events))

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: PageRank defaults: the canonical damping factor and a round budget
#: sized for small-diameter business graphs (power iteration converges
#: geometrically at rate ~damping; 20 rounds ⇒ residual ≲ 0.85^20 ≈ 4%
#: of the initial gap, enough for stable rank ORDER on the graphs this
#: engine builds — raise it for rank VALUES).
PAGERANK_DAMPING = 0.85
PAGERANK_ITER = 20


def pagerank(
    edges: DataFrame,
    damping: float = PAGERANK_DAMPING,
    n_iter: int = PAGERANK_ITER,
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
    bad = edges.filter(
        F.col("weight").isNull() | (F.col("weight") <= 0)
    ).limit(1).count()
    if bad:
        raise ValueError(
            "pagerank: edge weights must be positive and non-NULL "
            "(a zero/negative weight has no transition-probability "
            "reading)"
        )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "pagerank: empty edge list (no nodes — rank over nothing "
            "has no reading; a bare ZeroDivisionError from 1/n would "
            "hide the real problem)"
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
    # dangling spine: nodes with no out-edges (their rank mass
    # teleports uniformly each round)
    dangling_nodes = nodes.join(
        out_w.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=False)
    # decided ONCE: a dangling-free graph (every node has out-edges —
    # the common case for flow graphs) skips the per-round mass
    # aggregate entirely, halving the job count of the loop
    has_dangling = dangling_nodes.limit(1).count() > 0
    pr = nodes.select(
        "node", F.lit(1.0 / n).alias("pr")
    ).localCheckpoint(eager=False)
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
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
            nodes.join(contrib, nodes["node"] == contrib["node2"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.lit(d_mass / n)
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr


def nation_pagerank(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    damping: float = PAGERANK_DAMPING,
    n_iter: int = PAGERANK_ITER,
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
    """
    rev = (
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
    pr = pagerank(rev, damping=damping, n_iter=n_iter)
    return pr.select(
        F.col("node").alias("nation_key"), F.round("pr", 6).alias("pr")
    )

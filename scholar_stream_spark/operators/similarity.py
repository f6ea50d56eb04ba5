"""Similarity search over embedding columns (SURVEY.md §2.8).

Three paths, same output shape (query_id, neighbor_id, cos_sim, rank):

- ``cosine_topk`` — brute-force exact top-k: the correctness baseline.
  The (small) query set is broadcast against the corpus, cosine runs as
  JVM array expressions, and the per-query top-k is a ranking window.
- ``lsh_ann_topk`` — random-hyperplane LSH buckets: stateless scale
  path. Corpus and queries are bucketed by the sign pattern of
  ``n_planes`` fixed projections; candidates come from a bucket
  equi-join (cost ~ bucket occupancy, not corpus²), then exact cosine
  re-ranks. Recall is tunable via n_planes/multi-probe; approximate by
  construction, so the driver checks it rows-only.
- ``ivf_topk`` — IVF-Flat: a coarse k-means quantizer (deterministic
  seeds + one Lloyd refinement, pure DataFrame algebra) partitions the
  corpus into cells; each query probes its ``n_probe`` nearest cells
  and exact cosine re-ranks the candidates. Search touches
  ~``n_probe/n_centroids`` of the corpus. The cell assignment is the
  natural *physical* partitioning key for a vector table at 100 TB —
  write the corpus bucketed by cell and a probe reads only its cells'
  files.

Hyperplanes/seeds are deterministic (seeded RNG / fixed vec_ids frozen
at import) — reproducible across runs and engines, no fit/state to
persist.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scholar_stream_spark.functions.vectors import cosine_from_norms, l2_norm
from scholar_stream_spark.plans.partitioning import scale_out

ANN_TOPK = 5
ANN_NUM_QUERIES = 10
LSH_NUM_PLANES = 8
EMBED_DIM = 64


def _query_set(embeddings: DataFrame, n_queries: int) -> DataFrame:
    return embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )


def cosine_topk(
    embeddings: DataFrame,
    k: int = ANN_TOPK,
    n_queries: int = ANN_NUM_QUERIES,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Plan shape: broadcast(query set) ⨯ corpus → narrow projection
    computing cosine → per-query ranking window. The corpus is scanned
    once, never shuffled except by query_id for the window (bounded by
    n_queries × corpus candidates after the rank filter — we pre-prune
    with the window immediately). Norms are precomputed per vector on
    both sides so the pair loop does one dot product, not three.
    """
    q = _query_set(embeddings, n_queries)
    corpus = scale_out(embeddings).select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("norm")
    )
    joined = corpus.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    )
    cos = cosine_from_norms(
        F.col("q_embedding"),
        F.col("embedding"),
        F.col("q_norm"),
        F.col("norm"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_raw"), F.asc("neighbor_id")
    )
    return (
        joined.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim_raw"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim_raw", 4).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _hyperplanes(n_planes: int = LSH_NUM_PLANES, dim: int = EMBED_DIM):
    rng = random.Random(1337)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def _bucket(emb_col, planes) -> "F.Column":
    """Sign-pattern bucket id: bit p set iff <v, plane_p> >= 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                emb_col,
                F.array(*[F.lit(x) for x in plane]),
                lambda v, h: v.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = ANN_TOPK,
    n_queries: int = ANN_NUM_QUERIES,
    n_planes: int = LSH_NUM_PLANES,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH + exact re-rank.

    Same output schema as ``cosine_topk``; neighbors are drawn only from
    the query's LSH bucket, so at scale the candidate join touches
    ~corpus/2^n_planes rows per query instead of the whole corpus.
    """
    planes = _hyperplanes(n_planes)
    corpus = scale_out(embeddings).select(
        "vec_id",
        "embedding",
        l2_norm(F.col("embedding")).alias("norm"),
        _bucket(F.col("embedding"), planes).alias("bucket"),
    )
    q = (
        _query_set(embeddings, n_queries)
        .withColumn("q_bucket", _bucket(F.col("q_embedding"), planes))
    )
    cand = corpus.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = cosine_from_norms(
        F.col("q_embedding"),
        F.col("embedding"),
        F.col("q_norm"),
        F.col("norm"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_raw"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim_raw"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim_raw", 4).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


IVF_NUM_CENTROIDS = 16
IVF_NUM_PROBE = 2


def _assign_cells(vectors: DataFrame, centroids: DataFrame, n_best: int) -> DataFrame:
    """Attach the ``n_best`` nearest centroid ids (by cosine) to each vector.

    ``n_best=1`` (both corpus passes of the index build) is a **narrow
    argmax**: the centroid set is collapsed to a single array-of-struct
    row, broadcast, and each vector picks its best cell with
    ``array_max`` over a ``transform`` — one projection, zero Exchange
    on the corpus side. The naive alternative (explode 16 centroids per
    vector, rank with a ``Window.partitionBy(vec_id)``) shuffles
    n_centroids× the corpus by vec_id — a scale-killer at 100 TB.

    ``n_best>1`` is only ever the query side (``n_probe`` cells for a
    handful of query vectors), where the explode+window plan is fine.
    """
    if n_best == 1:
        cents = centroids.agg(
            F.collect_list(
                F.struct("cell", "c_embedding", "c_norm")
            ).alias("cents")
        )
        scored = F.transform(
            F.col("cents"),
            # struct comparison is lexicographic: max by (c_sim, -cell)
            # reproduces the window's (desc sim, asc cell) tie-break.
            lambda c: F.struct(
                cosine_from_norms(
                    F.col("embedding"),
                    c["c_embedding"],
                    F.col("norm"),
                    c["c_norm"],
                ).alias("c_sim"),
                (-c["cell"]).alias("neg_cell"),
            ),
        )
        return (
            vectors.join(F.broadcast(cents))
            .withColumn("cell", (-F.array_max(scored)["neg_cell"]).cast("int"))
            .drop("cents")
        )

    scored = vectors.join(F.broadcast(centroids))
    sim = cosine_from_norms(
        F.col("embedding"), F.col("c_embedding"), F.col("norm"), F.col("c_norm")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    return (
        scored.withColumn("c_sim", sim)
        .withColumn("c_rank", F.row_number().over(w))
        .filter(F.col("c_rank") <= n_best)
        .drop("c_embedding", "c_norm", "c_sim", "c_rank")
    )


def _mean_vectors(assigned: DataFrame) -> DataFrame:
    """Per-cell mean vector in pure DataFrame algebra: posexplode the
    dims, average per (cell, pos), reassemble in pos order."""
    dims = assigned.select(
        "cell", F.posexplode(F.col("embedding")).alias("pos", "v")
    )
    means = dims.groupBy("cell", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("mv")
    )
    return (
        means.groupBy("cell")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("s")
        )
        .select(
            "cell",
            F.transform(F.col("s"), lambda x: x["mv"]).alias("c_embedding"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = ANN_TOPK,
    n_queries: int = ANN_NUM_QUERIES,
    n_centroids: int = IVF_NUM_CENTROIDS,
    n_probe: int = IVF_NUM_PROBE,
) -> DataFrame:
    """IVF-Flat approximate top-k: train a coarse quantizer, bucket the
    corpus by nearest centroid, probe ``n_probe`` cells per query.

    Index build is two passes over the corpus (seed assignment + one
    Lloyd refinement — the iterative-algorithm pattern in DataFrame
    terms); search is a cell equi-join so each query scans only its
    probed cells. Approximate by construction → rows-only driver check.
    """
    corpus = scale_out(embeddings).select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("norm")
    )

    # --- train: deterministic seeds, one Lloyd refinement -------------
    seeds = corpus.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("c_embedding"),
        F.col("norm").alias("c_norm"),
    )
    assigned0 = _assign_cells(corpus, seeds, n_best=1)
    centroids = _mean_vectors(assigned0).select(
        "cell",
        "c_embedding",
        l2_norm(F.col("c_embedding")).alias("c_norm"),
    )

    # --- index: corpus bucketed by (refined) nearest cell -------------
    indexed = _assign_cells(corpus, centroids, n_best=1)

    # --- search: probe n_probe cells per query, exact re-rank ---------
    q = _query_set(embeddings, n_queries)
    q_cells = _assign_cells(
        q.select(
            F.col("query_id").alias("vec_id"),
            F.col("q_embedding").alias("embedding"),
            F.col("q_norm").alias("norm"),
        ),
        centroids,
        n_best=n_probe,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("norm").alias("q_norm"),
        "cell",
    )
    cand = indexed.join(
        q_cells,
        (indexed["cell"] == q_cells["cell"])
        & (indexed["vec_id"] != q_cells["query_id"]),
    )
    cos = cosine_from_norms(
        F.col("q_embedding"), F.col("embedding"), F.col("q_norm"), F.col("norm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_raw"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim_raw"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim_raw", 4).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )

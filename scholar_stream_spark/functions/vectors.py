"""Vector math over ``array<float>`` embedding columns.

Pure JVM array expressions (``zip_with`` + ``aggregate``) — no Python in
the loop, so cosine similarity runs inside whole-stage codegen and scales
linearly with rows. All arithmetic is promoted to double *before*
accumulation, and accumulation is sequential in element order, which makes
results reproducible (and checkable against the DuckDB oracle after
rounding).

For very wide vectors / huge candidate sets the same signatures can be
served by a vectorized pandas UDF (numpy dot); that variant lives with
the similarity operators — these are the portable baseline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array columns, in double."""
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(dot(a, b) / denom)


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with *precomputed* per-vector norms.

    In pairwise joins the norms are per-row invariants — computing them
    before the join does each one once instead of once per pair (3× fewer
    array aggregates in the pair loop). IEEE multiply/divide on the same
    operands gives bit-identical results to ``cosine_similarity``.
    """
    denom = norm_a * norm_b
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(dot(a, b) / denom)

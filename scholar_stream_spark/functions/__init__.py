"""Column-returning helper functions (the engine's scalar-function layer).

Everything here returns a :class:`pyspark.sql.Column` built from built-in
JVM expressions — no Python UDFs — so each helper stays inside
whole-stage codegen and is usable in both batch and streaming plans.
"""

from scholar_stream_spark.functions.text import (
    mask_email,
    normalize_text,
    synthetic_email,
    tokens,
    word_shingles,
)
from scholar_stream_spark.functions.vectors import cosine_similarity, dot, l2_norm
from scholar_stream_spark.functions.hashing import portable_hash48

__all__ = [
    "mask_email",
    "normalize_text",
    "synthetic_email",
    "tokens",
    "word_shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "portable_hash48",
]

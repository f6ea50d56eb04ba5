"""ANSI-mode regression: the portable hash must be overflow-free.

The driver's correctness harness runs a Spark 4 session with the default
``spark.sql.ansi.enabled=true``, while the engine's own session factory
opts out (lenient casts).  Round 1 shipped a 32-bit positional multiply
in ``hex48_sql`` that threw ARITHMETIC_OVERFLOW under ANSI — these tests
pin every portable-hash operator to run clean with ANSI on, and to
produce results identical to the ANSI-off run (no silent wraparound
divergence either way).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.functions.hashing import hex48_spark_sql, hex48_sql
from scholar_stream_spark.operators import dedup
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


@pytest.fixture()
def ansi_on(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_hex48_is_64bit_under_ansi(ansi_on):
    # 16^11 place value: any 32-bit multiply overflows for hex digits >= 2.
    h = hex48_sql("'x'")
    row = ansi_on.sql(f"SELECT {h} AS h, md5('x') AS m").first()
    assert row["h"] == int(row["m"][:12], 16)
    assert 0 <= row["h"] < 2**48


def test_hex48_spark_conv_equals_duckdb_positional_sum(ansi_on):
    """The Spark conv() form and the DuckDB positional-sum form are two
    texts for ONE function — pin their equality (both run fine in Spark)."""
    import duckdb

    for probe in ("'x'", "'hello world'", "''"):
        fast = ansi_on.sql(
            f"SELECT {hex48_spark_sql(probe)} AS h"
        ).first()["h"]
        slow_spark = ansi_on.sql(f"SELECT {hex48_sql(probe)} AS h").first()["h"]
        slow_duck = duckdb.sql(f"SELECT {hex48_sql(probe)} AS h").fetchone()[0]
        assert fast == slow_spark == slow_duck, probe


def test_minhash_lsh_ansi_matches_lenient(spark, docs):
    lenient = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        strict = {
            (r["d1"], r["d2"], r["jaccard"])
            for r in dedup.minhash_lsh_pairs(docs).collect()
        }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert strict == lenient
    assert len(strict) > 0


def test_simhash_ansi_matches_lenient(spark, docs):
    lenient = {
        (r["d1"], r["d2"], r["hamming"])
        for r in dedup.simhash_pairs(docs).collect()
    }
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        strict = {
            (r["d1"], r["d2"], r["hamming"])
            for r in dedup.simhash_pairs(docs).collect()
        }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert strict == lenient


def test_minhash_signatures_ansi(ansi_on, docs):
    # signatures themselves (the stage that overflowed) compute clean
    sigs = dedup.minhash_signatures(docs)
    assert sigs.count() == docs.count()
    first = sigs.select(F.col("s0")).first()
    assert first["s0"] is not None


def test_round2_queries_run_under_ansi(spark):
    """Every round-2 query family that does integer arithmetic must run
    clean under the driver's ANSI-on session and produce results
    identical to the lenient run (no silent wraparound either way)."""
    import __spark_entry__ as entry_mod

    sf_dir = SF_SMALL
    names = [
        "stats_by_type",
        "quantize_embeddings",
        "chunk_docs",
        "scd2_apply",
        "scd2_as_of",
        "incr_rollup",
        "vocab_coverage",
        "heavy_hitters",
        "value_percentiles_sketch",
        "salted_join_revenue",
        "dedup_clusters",
        "value_histogram",
        # round-5 additions with integer span/lane arithmetic
        "dup_spans",
        "remove_dup_spans",
        "dedup_simhash",
    ]
    queries = entry_mod.queries()
    lenient = {
        n: sorted(map(tuple, queries[n](spark, sf_dir).collect()))
        for n in names
    }
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for n in names:
            strict = sorted(map(tuple, queries[n](spark, sf_dir).collect()))
            assert strict == lenient[n], f"{n}: ANSI-on result differs"
            assert len(strict) > 0, f"{n}: empty result"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)

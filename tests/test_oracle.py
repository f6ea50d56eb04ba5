"""Local mirror of the driver's correctness gate.

For every entry in ``__spark_entry__.queries()`` with an oracle, run the
Spark query AND the DuckDB SQL at sf0.01 and compare row count, sorted
column names, and (order-insensitively) every value — the same contract
the driver's CORRECTNESS check applies, but strict on values so drift is
caught here first. Oracle-less queries get the weaker rows-and-schema
check.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype("string")
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )
    return df


def _kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    # dtype KINDS must agree before any value coercion: the driver's
    # value hash is dtype-sensitive, so a Spark BIGINT vs oracle float64
    # (the HUGEINT drift class) must fail HERE, not only in the driver.
    # Exception: an all-NULL object column (e.g. an empty result set)
    # carries no kind information.
    for col in spark_pdf.columns:
        sk, dk = _kind(spark_pdf[col]), _kind(duck_pdf[col])
        if sk != dk and not (
            (sk == "object" and spark_pdf[col].isna().all())
            or (dk == "object" and duck_pdf[col].isna().all())
        ):
            raise AssertionError(
                f"{name}.{col}: dtype kind {sk} (spark) vs {dk} (oracle) — "
                "the driver hash would mismatch even on equal values"
            )
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        if pd.api.types.is_float_dtype(sv):
            mism = ~(
                (sv.isna() & dv.isna())
                | (sv == dv)
            )
            bad = s[mism]
            assert mism.sum() == 0, (
                f"{name}.{col}: {int(mism.sum())} float mismatches; "
                f"first: spark={sv[mism].head(3).tolist()} "
                f"duck={dv[mism].head(3).tolist()}"
            )
        else:
            mism = ~((sv.isna() & dv.isna()) | (sv == dv))
            assert mism.sum() == 0, (
                f"{name}.{col}: {int(mism.sum())} mismatches; "
                f"first: spark={sv[mism].head(3).tolist()} "
                f"duck={dv[mism].head(3).tolist()}"
            )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, has rows, stable schema
        assert len(spark_pdf.columns) > 0
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    _compare(name, spark_pdf, duck_pdf)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


# DuckDB output types that survive the driver's pandas round-trip with
# the same value semantics Spark produces. Anything else (HUGEINT from
# an uncast SUM, DECIMAL from bare numeric literals/aggregates, ...)
# surfaces as float64/object on the oracle side and hash-mismatches the
# driver's value comparison even when every value is equal — the bug
# class that hit stats_by_type (r2) and pack_docs/repetition_stats (r4).
_SPARK_COMPATIBLE_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE",
    "VARCHAR", "BOOLEAN", "DATE",
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_spark_compatible(name, duck):
    rows = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if typ not in _SPARK_COMPATIBLE_TYPES
        and not typ.endswith("[]")  # array cols are compared element-wise
    ]
    assert not bad, (
        f"{name}: oracle SQL leaks non-Spark-compatible output types {bad}; "
        "CAST the offending aggregate/expression (e.g. AS BIGINT/DOUBLE) "
        "so the driver's value hash sees identical dtypes"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "work_id" in df.columns and "email" in df.columns

"""NDJSON file source/sink (S5 analog, SURVEY.md §2.1).

The reference's wire format is NDJSON — one compact JSON object per line,
UTF-8, newline-terminated (``ingestion/firehose_client.py:23``). JSON
Lines is Spark's native text-JSON format, so the batch source/sink are
thin wrappers; the value they add is pinning the contract (single
``value`` string column in, compact lines out) in one place for both the
batch and streaming paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_ndjson_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read NDJSON as raw lines (``value`` string column) — schema-on-read
    stays downstream (validate_works / build_vw_works own the typing)."""
    return spark.read.text(path)


def write_ndjson_lines(lines: DataFrame, path: str, mode: str = "append") -> None:
    """Write a single-string-column DataFrame as NDJSON text files.

    Each row becomes one ``\\n``-terminated line (Spark text sink), which
    is byte-compatible with the reference's Firehose record format.
    """
    cols = lines.columns
    if len(cols) != 1:
        raise ValueError(f"expected exactly one string column, got {cols}")
    lines.write.mode(mode).text(path)

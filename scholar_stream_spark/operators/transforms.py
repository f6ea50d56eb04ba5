"""Producer-side transforms P1-P9 (SURVEY.md §2.2) as one declarative plan.

The reference runs these per-record in Python (pydantic validate →
flatten → derive, ``ingestion/producer.py:79-109`` +
``ingestion/schema.py:49-72``). Here the whole producer is a single
DataFrame expression chain: ``raw json lines → from_json → select`` —
Catalyst fuses it into one codegen stage, and the identical plan runs in
batch or as a streaming micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholar_stream_spark.functions.text import synthetic_email
from scholar_stream_spark.schemas import ENVELOPE_FIELDS, OPENALEX_WORK_SCHEMA


def validate_works(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """P1 — validating projection of raw JSON work records.

    ``from_json`` with the explicit work schema reproduces pydantic's
    ``extra="ignore"`` + all-Optional contract (reference
    ``ingestion/schema.py:20-29``): unknown keys dropped, missing keys →
    NULL, malformed rows → all-NULL struct (never an exception — the
    lenient path the reference gets from ``model_validate`` wrapped in
    its error handling).
    """
    parsed = raw.select(
        F.from_json(F.col(json_col), OPENALEX_WORK_SCHEMA).alias("work")
    )
    return parsed.select("work.*")


def primary_author(works_col_prefix: str = "") -> Column:
    """P3 — array-head extraction ``authorships[0].author.display_name``.

    With ANSI off, ``arr[0]`` on an empty/NULL array yields NULL and the
    struct field access null-propagates — exactly the reference's
    three-way guard (``ingestion/schema.py:59-60``).
    """
    c = F.col(f"{works_col_prefix}authorships")
    return c[0]["author"]["display_name"]


def derive_envelope(
    works: DataFrame,
    source: str = "openalex",
    email_domain: str = "example.com",
    now: Column | None = None,
) -> DataFrame:
    """P2-P8 — flatten + derive the canonical Envelope record.

    One row per work, 11 flat fields (reference ``ingestion/schema.py:32-47``):

    - P2 nested extraction: ``host_venue.display_name`` (null-safe)
    - P3 array-head extraction: primary author
    - P4+P5 email coalesce: source email else synthetic sha1 email from
      the primary author name (reference ``ingestion/producer.py:89-95``)
    - P6 event-time stamping: ``event_ts = ingest_ts = now`` (UTC);
      ``now`` is injectable for deterministic tests (SURVEY §5.2 frozen
      clock), defaulting to ``current_timestamp()``
    - P7 constant source tag
    - P8 surrogate load id (``uuid()``, nondeterministic by design)

    Timestamps are emitted as ISO-8601 strings because this IS the wire
    record — the curated view re-parses them leniently, same as the
    reference's Snowflake path.
    """
    if now is None:
        now = F.current_timestamp()
    ts_str = F.date_format(now, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
    primary = primary_author()
    return works.select(
        F.col("id"),
        F.col("doi"),
        F.col("title"),
        F.col("publication_year").cast("string").alias("publication_year"),
        F.col("host_venue.display_name").alias("host_venue"),
        primary.alias("primary_author"),
        F.coalesce(F.col("email"), synthetic_email(primary, email_domain)).alias(
            "email"
        ),
        ts_str.alias("event_ts"),
        ts_str.alias("ingest_ts"),
        F.lit(source).alias("source"),
        F.expr("uuid()").alias("_LOAD_ID"),
    )


def to_ndjson(envelopes: DataFrame) -> DataFrame:
    """P9/S5 — null-dropping compact JSON encode, one line per record.

    Matches the reference wire format (``ingestion/firehose_client.py:23``,
    ``ingestion/producer.py:132-134``): compact separators (Spark's
    ``to_json`` never emits whitespace), null fields omitted
    (``ignoreNullFields``), load id under its ``_LOAD_ID`` alias, keys in
    Envelope field order. Returns a single ``value`` string column ready
    for a text sink.
    """
    return envelopes.select(
        F.to_json(
            F.struct(*[F.col(f) for f in ENVELOPE_FIELDS]),
            {"ignoreNullFields": "true"},
        ).alias("value")
    )

"""Engine schemas (StructTypes) — the data model of SURVEY.md §1.

The reference declares its record shapes as pydantic models
(``OpenAlexWork`` / ``Envelope``, reference ``ingestion/schema.py:20-47``)
and lands raw data as two Snowflake VARIANTs
(``sql/03_tables_raw.sql:5-8``). Here the same contracts are explicit
``StructType``s:

- ``OPENALEX_WORK_SCHEMA`` — the *validating projection* schema. Used
  with ``from_json`` in PERMISSIVE mode it reproduces pydantic's
  ``extra="ignore"`` + all-Optional semantics exactly: unknown JSON keys
  are dropped, missing keys become NULL.
- ``ENVELOPE_SCHEMA`` — the flat wire/analytics record (one row per
  work). ``publication_year`` is intentionally **string** here: JSON
  producers emit it as number OR string, and the curated view applies the
  lenient numeric cast (the reference does
  ``TRY_TO_NUMBER(TO_VARCHAR(...))`` for the same reason,
  ``sql/04_views_curated.sql:32``). Timestamps are likewise parsed
  leniently in the view (``try_to_timestamp``), so they stay strings on
  the wire schema.
- ``RAW_EVENT_SCHEMA`` — the bronze landing table: raw payload JSON plus
  delivery metadata JSON, the Spark analog of
  ``RAW.OPENALEX_EVENTS(RECORD, RECORD_METADATA)``. Keeping payload as a
  raw string is the schema-on-read contract: typing happens in the
  curated view, never at landing time, so malformed records land instead
  of failing ingestion.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- nested source record (reference ingestion/schema.py:8-29) ----------

OPENALEX_WORK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.StringType()),
        # number-or-string in the wild; parsed leniently downstream.
        T.StructField("publication_year", T.StringType()),
        T.StructField(
            "host_venue",
            T.StructType([T.StructField("display_name", T.StringType())]),
        ),
        T.StructField(
            "authorships",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "author",
                            T.StructType(
                                [T.StructField("display_name", T.StringType())]
                            ),
                        )
                    ]
                )
            ),
        ),
        T.StructField("email", T.StringType()),
        T.StructField("event_ts", T.StringType()),
    ]
)

# --- flat canonical envelope (reference ingestion/schema.py:32-47) -------
# Field order matters: to_json emits keys in struct order, mirroring the
# pydantic field order on the wire. The load id's wire key is `_LOAD_ID`
# (alias, reference ingestion/schema.py:47).

ENVELOPE_FIELDS = [
    "id",
    "doi",
    "title",
    "publication_year",
    "host_venue",
    "primary_author",
    "email",
    "event_ts",
    "ingest_ts",
    "source",
    "_LOAD_ID",
]

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("publication_year", T.StringType()),
        T.StructField("host_venue", T.StringType()),
        T.StructField("primary_author", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("event_ts", T.StringType()),
        T.StructField("ingest_ts", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_LOAD_ID", T.StringType()),
    ]
)

# --- bronze landing (reference sql/03_tables_raw.sql:5-8) ----------------

RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("metadata", T.StringType()),
    ]
)

#: Delivery metadata carried next to each payload — Spark analog of the
#: Firehose `RECORD_METADATA` VARIANT whose `IngestionTime` feeds the
#: landed-ts coalesce (reference infra/main.tf:159-161,
#: sql/04_views_curated.sql:20-24).
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("IngestionTime", T.StringType()),
        T.StructField("batch_id", T.StringType()),
    ]
)

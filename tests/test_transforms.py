"""P1-P9 producer-transform semantics (SURVEY.md §2.2)."""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import functions as F

from scholar_stream_spark.operators.transforms import (
    derive_envelope,
    to_ndjson,
    validate_works,
)


def _envelopes(works_lines):
    works = validate_works(works_lines)
    return derive_envelope(works, now=F.to_timestamp(F.lit("2024-06-01 12:00:00")))


def test_validating_projection_ignores_extras_and_nulls_missing(works_lines):
    works = validate_works(works_lines)
    # extra_field dropped (pydantic extra="ignore" parity)
    assert "extra_field" not in works.columns
    rows = {r["id"]: r for r in works.collect()}
    assert rows["W123"]["title"] == "A Study of Things"
    # missing fields → NULL
    assert rows["W126"]["title"] is None
    assert rows["W126"]["authorships"] is None


def test_primary_author_guards(works_lines):
    env = {r["id"]: r for r in _envelopes(works_lines).collect()}
    assert env["W123"]["primary_author"] == "Ada Lovelace"  # head, not all
    assert env["W124"]["primary_author"] is None  # empty list
    assert env["W125"]["primary_author"] is None  # author null
    assert env["W126"]["primary_author"] is None  # field missing


def test_synthetic_email_matches_reference_sha1(works_lines):
    env = {r["id"]: r for r in _envelopes(works_lines).collect()}

    def ref_email(name):  # reference ingestion/utils.py:8-11
        h = hashlib.sha1((name or "unknown").encode("utf-8")).hexdigest()[:10]
        return f"user_{h}@example.com"

    # missing email → synthetic from primary author
    assert env["W123"]["email"] == ref_email("Ada Lovelace")
    # no author either → synthetic from "unknown"
    assert env["W126"]["email"] == ref_email(None)
    # present email wins the coalesce
    assert env["W124"]["email"] == "bob@example.org"


def test_nested_and_year_handling(works_lines):
    env = {r["id"]: r for r in _envelopes(works_lines).collect()}
    assert env["W123"]["host_venue"] == "Journal of Things"
    assert env["W125"]["host_venue"] is None
    # year kept as string on the wire (number-or-string leniency)
    assert env["W123"]["publication_year"] == "2021"
    assert env["W124"]["publication_year"] == "1999"
    assert env["W127"]["publication_year"] == "twenty-twenty"


def test_ndjson_encode_compact_null_dropping_alias(works_lines):
    lines = to_ndjson(_envelopes(works_lines)).collect()
    by_id = {json.loads(r["value"])["id"]: r["value"] for r in lines}
    w126 = by_id["W126"]
    # compact separators, no spaces (wire parity with the reference sink)
    assert ": " not in w126 and ", " not in w126
    parsed = json.loads(w126)
    # null fields omitted entirely
    assert "doi" not in parsed and "title" not in parsed
    # load id under its alias, uuid-shaped
    assert "_LOAD_ID" in parsed and len(parsed["_LOAD_ID"]) == 36
    # constant source tag + stamped times present
    assert parsed["source"] == "openalex"
    assert parsed["event_ts"] == parsed["ingest_ts"]


def test_envelope_field_order_on_wire(works_lines):
    value = to_ndjson(_envelopes(works_lines)).collect()[0]["value"]
    keys = list(json.loads(value).keys())
    # emitted in Envelope declaration order (subset when nulls dropped)
    expected = [
        "id", "doi", "title", "publication_year", "host_venue",
        "primary_author", "email", "event_ts", "ingest_ts", "source",
        "_LOAD_ID",
    ]
    assert keys == [k for k in expected if k in keys]

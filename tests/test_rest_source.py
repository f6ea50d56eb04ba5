"""Tests for the cursor-paginated REST source (S1-S4).

Mirrors the reference's source tests
(``tests/unit/test_openalex_client.py:12-58``): scripted fake pages,
cursor pagination yields all records in order, a one-shot 429 is
retried transparently. Adds the Spark-native contracts: the batch
reader drains all pages; the stream reader maps cursor→offset so one
micro-batch == one page.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from scholar_stream_spark.sources import rest

PAGES = [
    [{"id": "W1", "title": "A"}, {"id": "W2", "title": "B"}],
    [{"id": "W3", "title": "C"}],
    [{"id": "W4", "title": "D"}],
]


@pytest.fixture()
def registered(spark):
    rest.register(spark)
    return spark


def test_batch_drains_all_pages_in_order(registered):
    df = (
        registered.read.format("paginated_rest")
        .option("transport", "fake")
        .option("fake_pages", json.dumps(PAGES))
        .load()
    )
    rows = [json.loads(r.value) for r in df.collect()]
    assert [r["id"] for r in rows] == ["W1", "W2", "W3", "W4"]
    # compact NDJSON wire encoding (reference firehose_client.py:23)
    raw = df.collect()[0].value
    assert ": " not in raw and ", " not in raw


def test_batch_respects_max_pages(registered):
    df = (
        registered.read.format("paginated_rest")
        .option("transport", "fake")
        .option("fake_pages", json.dumps(PAGES))
        .option("max_pages", "2")
        .load()
    )
    assert df.count() == 3  # pages 0 and 1 only


def test_429_retried_same_page(registered):
    """One-shot 429 on page 1 → retried, no records lost or duplicated
    (reference behavior, openalex_client.py:50-53)."""
    with tempfile.TemporaryDirectory() as tmp:
        marker = os.path.join(tmp, "tripped")
        df = (
            registered.read.format("paginated_rest")
            .option("transport", "fake")
            .option("fake_pages", json.dumps(PAGES))
            .option("fake_429_at", "1")
            .option("fake_429_state", marker)
            .load()
        )
        rows = [json.loads(r.value)["id"] for r in df.collect()]
        assert rows == ["W1", "W2", "W3", "W4"]
        assert os.path.exists(marker)  # the 429 really fired


def test_429_retry_is_bounded():
    """A persistently rate-limiting endpoint must error out, not hang
    the stream's offset planning forever (cap parity with the reference
    sink's boto3 max_attempts=5)."""

    class Always429:
        calls = 0

        def fetch(self, cursor):
            Always429.calls += 1
            raise rest.RateLimited(0.001)

    with pytest.raises(RuntimeError, match="rate-limited"):
        rest._fetch_with_retry(Always429(), "*", max_retries=3)
    assert Always429.calls == 4  # initial + 3 retries


def test_per_page_cap(registered):
    """Batch-size bounds 1..500 (reference producer.py:66-69)."""
    for bad in ("0", "501", "-5"):
        df = (
            registered.read.format("paginated_rest")
            .option("transport", "fake")
            .option("fake_pages", json.dumps(PAGES))
            .option("per_page", bad)
            .load()
        )
        with pytest.raises(Exception, match="per_page"):
            df.collect()


def test_stream_one_page_per_microbatch(registered):
    """Cursor == checkpointed offset: micro-batches drain page-by-page.

    (Python SimpleDataSourceStreamReader has no AvailableNow support, so
    run the default trigger and drain with ``processAllAvailable``.)
    """
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        stream = (
            registered.readStream.format("paginated_rest")
            .option("transport", "fake")
            .option("fake_pages", json.dumps(PAGES))
            .load()
        )
        q = (
            stream.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = registered.read.json(out)
        vals = sorted(json.loads(r.value)["id"] for r in got.collect())
        assert vals == ["W1", "W2", "W3", "W4"]
        # one page per micro-batch: at least 3 batches committed
        batches = len(os.listdir(os.path.join(ckpt, "commits")))
        assert batches >= 3


def test_headers_template_user_agent():
    """Mirror of the reference's test_headers_template_user_agent
    (tests/unit/test_openalex_client.py:6-9)."""
    from scholar_stream_spark.sources.rest import headers_template

    h = headers_template("me@example.com")
    assert "User-Agent" in h
    assert "mailto:me@example.com" in h["User-Agent"]


def test_http_transport_requires_mailto():
    """Hard requirement, same error shape as the reference client
    (ingestion/openalex_client.py:14-20)."""
    import pytest

    from scholar_stream_spark.sources.rest import HttpTransport

    with pytest.raises(ValueError, match="contact email \\(mailto\\)"):
        HttpTransport({"url": "https://api.example.org/works"})


def test_http_transport_sends_mailto_param_and_header():
    from urllib.parse import parse_qs, urlsplit

    from scholar_stream_spark.sources.rest import HttpTransport

    t = HttpTransport(
        {
            "url": "https://api.example.org/works",
            "mailto": "me@example.com",
            "per_page": "25",
            "updated_since": "2026-01-01",
        }
    )
    full, headers = t.build_request("*")
    q = parse_qs(urlsplit(full).query)
    assert q["mailto"] == ["me@example.com"]
    assert q["per-page"] == ["25"]
    assert q["cursor"] == ["*"]
    assert q["from_updated_date"] == ["2026-01-01"]
    assert "mailto:me@example.com" in headers["User-Agent"]


def test_http_transport_query_params_merge_last():
    """Freeform filters forward verbatim and OVERRIDE defaults — the
    reference's params.update(query_params) ordering
    (ingestion/openalex_client.py:40-41)."""
    import json as _json
    from urllib.parse import parse_qs, urlsplit

    from scholar_stream_spark.sources.rest import HttpTransport

    t = HttpTransport(
        {
            "url": "https://api.example.org/works",
            "mailto": "me@example.com",
            "query_params": _json.dumps(
                {"filter": "is_oa:true", "per-page": 7}
            ),
        }
    )
    full, _ = t.build_request("*")
    q = parse_qs(urlsplit(full).query)
    assert q["filter"] == ["is_oa:true"]
    assert q["per-page"] == ["7"]  # override wins over the default 50

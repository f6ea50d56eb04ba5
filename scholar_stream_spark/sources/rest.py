"""Cursor-paginated REST source (S1-S4) as a Spark 4 Python DataSource.

The reference streams OpenAlex ``/works`` pages with cursor pagination,
429 retry honoring ``Retry-After``, an incremental ``updated_since``
pushdown and an inter-page throttle
(``ingestion/openalex_client.py:22-70``). Here the same contract is a
first-class Spark source:

- **batch**: ``spark.read.format("paginated_rest").options(...).load()``
  drains all pages into a ``value string`` DataFrame (one compact JSON
  record per row — the producer's wire unit).
- **streaming**: ``spark.readStream.format("paginated_rest")`` maps the
  API cursor onto stream offsets (one page per micro-batch) via
  ``SimpleDataSourceStreamReader`` — the cursor IS the checkpointed
  offset, so restart resumes exactly where the last commit left off.

Options (all strings, Spark option contract):

- ``url``             — endpoint returning ``{"results": [...],
                        "meta": {"next_cursor": ...}}``
- ``per_page``        — page size (default 50, reference producer.py:33)
- ``mailto``          — contact email, REQUIRED for the http transport
                        (OpenAlex politeness pool;
                        ``ingestion/openalex_client.py:14-20``): sent as
                        the ``mailto`` query param and in the
                        ``User-Agent`` header, hard error when absent
- ``query_params``    — JSON object of freeform filters forwarded
                        verbatim to the API (merged last, so callers can
                        override defaults; ``openalex_client.py:28,40-41``)
- ``updated_since``   — source-side pushdown filter (S3)
- ``sleep_seconds``   — inter-page throttle (S4; default 0 here — the
                        trigger interval is Spark's native throttle)
- ``max_pages``       — safety cap for batch drains
- ``transport``       — "http" (urllib, stdlib) or "fake" (hermetic
                        tests: scripted pages via ``fake_pages`` JSON,
                        optional one-shot 429 via ``fake_429_at``)

Rate-limit behavior (S2): on HTTP 429 the reader sleeps
``Retry-After`` seconds (default 2, capped) and retries the same page —
mirroring the reference's loop, tested with a scripted 429.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

DEFAULT_PER_PAGE = 50
#: Batch-size bounds carried over from the reference producer, which
#: rejects batches outside 1..500 (``ingestion/producer.py:66-69``).
MAX_PER_PAGE = 500
DEFAULT_RETRY_AFTER = 2.0
MAX_RETRY_SLEEP = 30.0
START_CURSOR = "*"


def _validated_per_page(options: dict) -> int:
    per_page = int(options.get("per_page", DEFAULT_PER_PAGE))
    if not 1 <= per_page <= MAX_PER_PAGE:
        raise ValueError(
            f"per_page must be in 1..{MAX_PER_PAGE}, got {per_page}"
        )
    return per_page


class RateLimited(Exception):
    def __init__(self, retry_after: float):
        super().__init__(f"429, retry after {retry_after}s")
        self.retry_after = retry_after


USER_AGENT_TEMPLATE = "ScholarStream/0.1 (+mailto:{mail})"


def headers_template(mail: str) -> dict:
    """Politeness header the reference sends on every request
    (``ingestion/openalex_client.py:9-10,46``)."""
    return {"User-Agent": USER_AGENT_TEMPLATE.format(mail=mail)}


class HttpTransport:
    """urllib-based page fetcher (executor-side, picklable by config)."""

    def __init__(self, options: dict):
        self.url = options["url"]
        self.per_page = _validated_per_page(options)
        self.updated_since = options.get("updated_since")
        self.mailto = options.get("mailto")
        if not self.mailto:
            # hard requirement, same message shape as the reference
            # (``openalex_client.py:14-20``): anonymous OpenAlex traffic
            # lands in the throttled politeness pool
            raise ValueError(
                "OpenAlex requires a contact email (mailto). "
                "Set the 'mailto' option."
            )
        qp = options.get("query_params")
        self.query_params = json.loads(qp) if qp else {}

    def build_request(self, cursor: str) -> tuple[str, dict]:
        """(full_url, headers) for a page fetch — split out so the
        param/header contract is unit-testable without a network."""
        import urllib.parse

        params = {
            "per-page": str(self.per_page),
            "mailto": self.mailto,
            "cursor": cursor,
        }
        if self.updated_since:
            # S3: incremental pull predicate pushed to the API
            params["from_updated_date"] = self.updated_since
        # freeform filters merge LAST, exactly like the reference's
        # params.update(query_params) — callers may override defaults
        params.update({k: str(v) for k, v in self.query_params.items()})
        full = f"{self.url}?{urllib.parse.urlencode(params)}"
        return full, headers_template(self.mailto)

    def fetch(self, cursor: str) -> dict:
        import urllib.error
        import urllib.request

        full, headers = self.build_request(cursor)
        req = urllib.request.Request(full, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 429:
                ra = float(e.headers.get("Retry-After", DEFAULT_RETRY_AFTER))
                raise RateLimited(min(ra, MAX_RETRY_SLEEP)) from None
            raise


class FakeTransport:
    """Scripted pages for hermetic tests (mirror of the reference's fake
    requests.Session, tests/unit/test_openalex_client.py:12-58)."""

    def __init__(self, options: dict):
        self.pages: list[list[dict]] = json.loads(options.get("fake_pages", "[]"))
        self.fail_at = options.get("fake_429_at")
        self.state_file = options.get("fake_429_state")  # one-shot marker

    def fetch(self, cursor: str) -> dict:
        page_idx = 0 if cursor == START_CURSOR else int(cursor)
        if self.fail_at is not None and page_idx == int(self.fail_at):
            import os

            if self.state_file and not os.path.exists(self.state_file):
                with open(self.state_file, "w") as f:
                    f.write("tripped")
                raise RateLimited(0.01)
        if page_idx >= len(self.pages):
            return {"results": [], "meta": {"next_cursor": None}}
        nxt = str(page_idx + 1) if page_idx + 1 < len(self.pages) else None
        return {"results": self.pages[page_idx], "meta": {"next_cursor": nxt}}


def _transport(options: dict):
    _validated_per_page(options)  # batch-size cap parity, any transport
    kind = options.get("transport", "http")
    return FakeTransport(options) if kind == "fake" else HttpTransport(options)


MAX_RETRIES = 5  # parity with the reference sink's boto3 max_attempts=5


def _fetch_with_retry(transport, cursor: str, max_retries: int = MAX_RETRIES) -> dict:
    """S2: sleep Retry-After and refetch the same page — bounded.

    The retry loop MUST terminate: for the streaming reader it runs
    during micro-batch offset planning on the driver, so an endpoint
    that rate-limits persistently would otherwise hang the stream
    forever (the reference's boto3 sink caps at 5 attempts too).
    """
    for attempt in range(max_retries + 1):
        try:
            return transport.fetch(cursor)
        except RateLimited as rl:
            if attempt == max_retries:
                raise RuntimeError(
                    f"rate-limited {max_retries + 1} consecutive times at "
                    f"cursor {cursor!r}; giving up (Retry-After was "
                    f"{rl.retry_after}s)"
                ) from rl
            time.sleep(rl.retry_after)
    raise AssertionError("unreachable")


class RestBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def read(self, partition) -> Iterator[tuple]:
        transport = _transport(self.options)
        sleep_s = float(self.options.get("sleep_seconds", 0))
        max_pages = int(self.options.get("max_pages", 10_000))
        cursor = START_CURSOR
        for _ in range(max_pages):
            page = _fetch_with_retry(transport, cursor)
            results = page.get("results") or []
            if not results:
                return
            for rec in results:
                yield (json.dumps(rec, separators=(",", ":")),)
            cursor = (page.get("meta") or {}).get("next_cursor")
            if not cursor:
                return
            if sleep_s:
                time.sleep(sleep_s)  # S4: page throttle


class RestStreamReader(SimpleDataSourceStreamReader):
    """Cursor == stream offset: one page per micro-batch (S1 streaming)."""

    def __init__(self, options: dict):
        self.options = options

    def initialOffset(self) -> dict:
        return {"cursor": START_CURSOR, "exhausted": False}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        if start.get("exhausted"):
            return iter([]), start
        transport = _transport(self.options)
        cursor = start["cursor"]
        page = _fetch_with_retry(transport, cursor)
        results = page.get("results") or []
        rows = [(json.dumps(r, separators=(",", ":")),) for r in results]
        nxt = (page.get("meta") or {}).get("next_cursor")
        if not results or not nxt:
            return iter(rows), {"cursor": cursor, "exhausted": True}
        return iter(rows), {"cursor": nxt, "exhausted": False}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay after failure: refetch the page at `start`
        if start.get("exhausted"):
            return iter([])
        transport = _transport(self.options)
        page = _fetch_with_retry(transport, start["cursor"])
        return iter(
            (json.dumps(r, separators=(",", ":")),)
            for r in (page.get("results") or [])
        )

    def commit(self, end: dict) -> None:
        pass


class PaginatedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> StructType:
        return StructType([StructField("value", StringType())])

    def reader(self, schema) -> RestBatchReader:
        return RestBatchReader(dict(self.options))

    def simpleStreamReader(self, schema) -> RestStreamReader:
        return RestStreamReader(dict(self.options))


def register(spark) -> None:
    """Register the source with a session:
    ``spark.read.format("paginated_rest")`` becomes available."""
    spark.dataSource.register(PaginatedRestDataSource)

"""Curated-view operators V1-V12 (SURVEY.md §2.3) — the analytical core.

The reference defines these as two Snowflake views over a VARIANT landing
table (``sql/04_views_curated.sql``). Here they are DataFrame builders:

- ``build_vw_works``   — V1-V9: parse-once JSON shredding, safe casts,
  landed-time coalesce, latency derivation.
- ``build_vw_latency`` — V10-V12: global KPI aggregate over a relative
  time window.

Design notes (scale):

- **Parse JSON once** (V2-V4): the reference extracts 7 paths from the
  same VARIANT per row. Naive ``get_json_object``×7 would parse the
  payload 7 times; we ``from_json`` into a struct once and use struct
  field access, which after Catalyst's nested-schema pruning reads only
  the needed leaves.
- **Injectable clock**: ``CURRENT_TIMESTAMP()`` appears in the landed-ts
  coalesce and the window bounds (reference
  ``sql/04_views_curated.sql:20-24,54-60``) — nondeterministic by design.
  Every builder takes ``now=None`` (→ ``current_timestamp()``) so tests
  and oracle comparisons can pin the clock (SURVEY §5.2 / §7.3).
- Views compose (V1): ``vw_latency`` is built *over* ``vw_works``;
  registered as temp views they inline into one logical plan, so the
  filter in the latency view pushes down into the works scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholar_stream_spark.schemas import ENVELOPE_SCHEMA, METADATA_SCHEMA


def try_to_timestamp(col: Column) -> Column:
    """V5 — safe timestamp parse: NULL on malformed, never an error.

    Spark's ``try_to_timestamp`` needs a format when input varies; the
    wire carries ISO-8601 with offset. Snowflake's TRY_TO_TIMESTAMP_TZ
    (reference ``sql/04_views_curated.sql:18-19``) accepts a family of
    ISO forms — we coalesce over the two shapes the pipeline produces
    (fractional seconds with offset, plain ``ts`` literals).
    """
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX][X]")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss[.SSSSSS][XXX][X]")),
        F.try_to_timestamp(col),
    )


def latency_seconds(event_ts: Column, landed_ts: Column) -> Column:
    """V8+V9 — guarded timestamp difference in whole seconds.

    Snowflake's ``DATEDIFF('second', a, b)`` counts second-boundary
    crossings, i.e. ``floor_seconds(b) - floor_seconds(a)`` — exactly
    ``unix_timestamp(b) - unix_timestamp(a)`` (verified in tests). NULL
    event_ts → NULL latency (reference ``sql/04_views_curated.sql:39-42``).
    """
    return F.when(
        event_ts.isNotNull(),
        F.unix_timestamp(landed_ts) - F.unix_timestamp(event_ts),
    ).otherwise(F.lit(None).cast("long"))


def build_vw_works(
    raw: DataFrame,
    now: Column | None = None,
    include_load_id: bool = False,
    json_engine: str = "struct",
) -> DataFrame:
    """V1-V9 — curated projection of the bronze landing table.

    Input: ``(payload string, metadata string)`` rows (RAW_EVENT_SCHEMA).
    Output columns mirror the reference view (``sql/04_views_curated.sql:28-44``):
    work_id, doi, title, publication_year, venue, primary_author, email,
    event_ts, ingest_ts, landed_ts, latency_seconds.

    ``include_load_id`` appends the wire ``_LOAD_ID`` as ``load_id`` —
    the per-record uuid the reference carries specifically so downstream
    dedup can key on it (``ingestion/schema.py:47``); the streaming
    dedup path needs it, the reference view itself doesn't expose it.

    ``json_engine`` picks the shredding strategy (same output either way,
    pinned by tests):

    - ``"struct"`` (default): ``from_json`` into the explicit envelope
      schema, then struct field access — nested-schema pruning reads
      only the needed leaves.
    - ``"variant"``: Spark 4 ``try_parse_json`` → ``VariantType`` +
      ``try_variant_get`` paths — the direct analog of the reference's
      Snowflake VARIANT landing column (``sql/03_tables_raw.sql:5-8``).
      Schema-free (new wire fields need no schema change) and still
      parse-once: the optimizer keeps the ``parseJson`` in its own
      projection (plan-asserted in tests).
    """
    if now is None:
        now = F.current_timestamp()

    if json_engine == "variant":
        parsed = raw.select(
            F.try_parse_json(F.col("payload")).alias("v"),
            F.try_parse_json(F.col("metadata")).alias("mv"),
        )

        def rec(path: str) -> Column:
            return F.try_variant_get("v", f"$.{path}", "string")

        fields = {
            "id": rec("id"),
            "doi": rec("doi"),
            "title": rec("title"),
            "publication_year": rec("publication_year"),
            "host_venue": rec("host_venue"),
            "primary_author": rec("primary_author"),
            "email": rec("email"),
            "event_ts": rec("event_ts"),
            "ingest_ts": rec("ingest_ts"),
            "_LOAD_ID": rec("_LOAD_ID"),
        }
        shredded = parsed.select(
            F.struct(*[c.alias(k) for k, c in fields.items()]).alias("rec"),
            F.struct(
                F.try_variant_get("mv", "$.IngestionTime", "string").alias(
                    "IngestionTime"
                )
            ).alias("meta"),
        )
    else:
        if json_engine != "struct":
            raise ValueError(f"unknown json_engine: {json_engine!r}")
        # V2-V4: one from_json per VARIANT, then cheap struct field access.
        shredded = raw.select(
            F.from_json(F.col("payload"), ENVELOPE_SCHEMA).alias("rec"),
            F.from_json(F.col("metadata"), METADATA_SCHEMA).alias("meta"),
        )

    event_ts = try_to_timestamp(F.col("rec.event_ts"))
    ingest_ts = try_to_timestamp(F.col("rec.ingest_ts"))
    # V6: 3-way landed-time coalesce (delivery metadata → producer
    # ingest_ts → query time), reference sql/04_views_curated.sql:20-24.
    landed_ts = F.coalesce(
        try_to_timestamp(F.col("meta.IngestionTime")), ingest_ts, now
    )

    timed = shredded.select(
        F.col("rec"),
        event_ts.alias("event_ts"),
        ingest_ts.alias("ingest_ts"),
        landed_ts.alias("landed_ts"),
    )
    cols = [
        F.col("rec.id").alias("work_id"),
        F.col("rec.doi").alias("doi"),
        F.col("rec.title").alias("title"),
        # V7: lenient number-or-string parse (TRY_TO_NUMBER(TO_VARCHAR(..))).
        F.expr("try_cast(rec.publication_year AS long)").alias("publication_year"),
        F.col("rec.host_venue").alias("venue"),
        F.col("rec.primary_author").alias("primary_author"),
        F.col("rec.email").alias("email"),
        F.col("event_ts"),
        F.col("ingest_ts"),
        F.col("landed_ts"),
        latency_seconds(F.col("event_ts"), F.col("landed_ts")).alias(
            "latency_seconds"
        ),
    ]
    if include_load_id:
        cols.append(F.col("rec._LOAD_ID").alias("load_id"))
    return timed.select(*cols)


def build_vw_latency(
    vw_works: DataFrame,
    now: Column | None = None,
    window_minutes: int = 5,
) -> DataFrame:
    """V10-V12 — latency KPIs over the trailing window.

    Global aggregate (no GROUP BY): avg/min/max latency + sample count
    over rows whose ``landed_ts`` falls in the last ``window_minutes``,
    with the window bounds echoed as columns (reference
    ``sql/04_views_curated.sql:48-62``). Catalyst plans this as a
    partial+final agg (map-side combine), so it is one scan + a
    single-row shuffle regardless of input size.
    """
    if now is None:
        now = F.current_timestamp()
    start = now - F.expr(f"INTERVAL {window_minutes} MINUTES")
    windowed = vw_works.filter(
        F.col("event_ts").isNotNull() & (F.col("landed_ts") >= start)
    )
    agg = windowed.agg(
        F.avg("latency_seconds").alias("avg_sec_5m"),
        F.min("latency_seconds").alias("min_sec_5m"),
        F.max("latency_seconds").alias("max_sec_5m"),
        F.count(F.lit(1)).alias("samples_5m"),
    )
    # V12: window bounds as output columns (post-agg projection — they are
    # plan-time constants, not aggregates).
    return agg.withColumns({"window_start": start, "window_end": now})

"""Bronze landing: payload + delivery metadata, with a dead-letter path.

Spark analog of the reference's managed Firehose → RAW table hop
(S6/S7): Firehose writes the record to ``RECORD`` and stamps delivery
metadata (incl. ``IngestionTime``) into ``RECORD_METADATA``
(``infra/main.tf:146-200``); failed deliveries are dead-lettered under an
``errors/`` prefix (``infra/main.tf:178-193``).

Here a *landing batch* is: take NDJSON lines, attach a metadata JSON
column (IngestionTime = commit wall-clock, batch_id = uuid-per-batch),
append to the raw table path as parquet. Records that are not even
parseable JSON objects go to the dead-letter path instead of the table —
landing stays schema-agnostic (any valid JSON lands; typing is the
curated view's job).

At scale: the landing write is append-only and partitioned by landing
date (``land_date``), so curated-view scans over recent windows prune
partitions, and compaction/retention can work per-day.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_delivery_metadata(lines: DataFrame, batch_id: str | None = None) -> DataFrame:
    """Wrap raw NDJSON lines as (payload, metadata, land_date) rows."""
    if batch_id is None:
        batch_id = str(uuid.uuid4())
    ingestion_time = F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"
    )
    metadata = F.to_json(
        F.struct(
            ingestion_time.alias("IngestionTime"),
            F.lit(batch_id).alias("batch_id"),
        )
    )
    return lines.select(
        F.col(lines.columns[0]).alias("payload"),
        metadata.alias("metadata"),
        F.current_date().alias("land_date"),
    )


def split_dead_letters(landing: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition a landing batch into (good, dead) by JSON well-formedness.

    A payload is landable iff it parses as JSON — probed with Spark 4's
    ``try_parse_json`` (NULL on malformed, never an error). Mirrors
    Firehose's FailedDataOnly dead-letter contract: bad bytes are
    preserved verbatim for replay, never dropped.
    """
    probe = F.expr("try_parse_json(payload)")
    flagged = landing.withColumn("_ok", probe.isNotNull())
    good = flagged.filter(F.col("_ok")).drop("_ok")
    dead = flagged.filter(~F.col("_ok")).drop("_ok")
    return good, dead


def compact_raw(spark, raw_path: str) -> int:
    """Compact the bronze table's small files (S6 maintenance analog).

    Frequent triggers produce many small parquet files — the Spark-side
    mirror of the Firehose buffer-size trade-off the reference documents
    (``README.md:295-304``). Rewrites the table so each ``land_date``
    partition holds ONE file (``repartition`` by the partition column:
    every date's rows land in a single task, and the partitioned writer
    emits one file per date per task). Returns the row count (verified
    equal before the directory swap).

    NOT concurrent-safe: run it while the ingest stream is stopped (or
    on a quiesced day partition). The durable answer at scale is a table
    format with transactional compaction (Delta/Iceberg OPTIMIZE); this
    is the honest file-based analog for the plain-parquet bronze path.
    """
    import shutil

    df = spark.read.parquet(raw_path)
    n_before = df.count()
    tmp = raw_path.rstrip("/") + "__compacting"
    (
        df.repartition("land_date")
        .write.mode("overwrite")
        .partitionBy("land_date")
        .parquet(tmp)
    )
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {n_before} -> {n_after}; aborted"
        )
    backup = raw_path.rstrip("/") + "__precompact"
    shutil.move(raw_path, backup)
    shutil.move(tmp, raw_path)
    shutil.rmtree(backup, ignore_errors=True)
    return n_after


def write_dead_letters(
    dead: DataFrame, errors_path: str, layout: str = "date_partition"
) -> None:
    """Persist a dead-letter batch for replay.

    - ``"date_partition"`` (default): parquet partitioned by
      ``land_date`` — keeps the delivery metadata columns and is directly
      SQL-queryable alongside the bronze table.
    - ``"firehose"``: GZIP NDJSON under ``errors/yyyy/MM/dd/`` — byte
      parity with the reference's Firehose FailedDataOnly backup
      (``infra/main.tf:178-193``: ``prefix errors/!{timestamp:yyyy/MM/dd}/``,
      ``compression_format GZIP``): one payload line per record, original
      bytes preserved verbatim.

    Retry-window note: Firehose retries delivery for a bounded window
    (300 s) before dead-lettering; here delivery IS the checkpointed
    micro-batch commit, which Structured Streaming retries until it
    succeeds — strictly stronger. The dead-letter path therefore carries
    only *unparseable payloads* (Firehose's data-format failures), never
    transient delivery failures.
    """
    if layout == "firehose":
        # ≤ a handful of distinct dates per micro-batch (usually one):
        # a bounded driver loop, each date one gzip text write.
        for (d,) in dead.select("land_date").distinct().collect():
            (
                dead.filter(F.col("land_date") == F.lit(d))
                .select("payload")
                .write.mode("append")
                .option("compression", "gzip")
                .text(f"{errors_path.rstrip('/')}/{d.strftime('%Y/%m/%d')}")
            )
    elif layout == "date_partition":
        dead.write.mode("append").partitionBy("land_date").parquet(errors_path)
    else:
        raise ValueError(f"unknown dead-letter layout: {layout!r}")


def land_batch(
    lines: DataFrame,
    raw_path: str,
    errors_path: str | None = None,
    batch_id: str | None = None,
    errors_layout: str = "date_partition",
) -> None:
    """Append one batch of NDJSON lines to the bronze table (parquet,
    partitioned by land_date); unparseable lines → dead-letter path."""
    landing = with_delivery_metadata(lines, batch_id=batch_id)
    good, dead = split_dead_letters(landing)
    (
        good.write.mode("append")
        .partitionBy("land_date")
        .parquet(raw_path)
    )
    if errors_path is not None:
        # Empty writes still create the path; guard with a cheap check on
        # the already-computed batch (tiny: one micro-batch of lines).
        if dead.limit(1).count() > 0:
            write_dead_letters(dead, errors_path, layout=errors_layout)

#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the full named query set from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "query_set_wall_clock", "value": <total-sec>,
     "unit": "sec", "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is executed to completion with the ``noop`` sink — the whole
plan runs (scan → shuffle → agg) but nothing is materialized on the
driver, so timings measure the engine, not ``collect()`` serialization.

A tiny warm-up query first absorbs one-time JVM/codegen startup so
per-query numbers are comparable across runs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import __spark_entry__ as entry_mod
from scholar_stream_spark.session import get_spark


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    spark = get_spark(app_name="scholar-stream-bench")

    # warm-up: JVM + parquet footer read + codegen paths, plus Python UDF
    # workers (first Arrow-UDF stage otherwise pays ~100-300 ms per-core
    # interpreter spawn — a fixed session cost, not query cost)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from pyspark.sql import functions as F  # noqa: PLC0415

    _warm = F.pandas_udf(lambda s: s, "long")
    (
        spark.range(0, 256, 1, 64)
        .select(_warm("id"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    t0 = time.time()
    for name in sorted(queries):
        start = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - start, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    total = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "query_set_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

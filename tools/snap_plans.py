#!/usr/bin/env python
"""Capture .explain('formatted') + optional isolated noop timings for a
set of declared queries. Usage:

    python tools/snap_plans.py <suffix> [--time N] name1 name2 ...

Writes ``plans/r17/<name>_<suffix>.txt`` for each query. With
``--time N`` also runs the noop sink N times per query (best-of) and
appends the timings to the file header. Honors the driver contract env
(``SPARK_GRAFT_SF_DIR``, ``SPARK_GRAFT_CPUS``).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from scholar_stream_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    args = sys.argv[2:]
    reps = 0
    if args and args[0] == "--time":
        reps = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"snap-plans-{suffix}")
    # warm-up mirrors bench.py so timings are comparable
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    qs = entry_mod.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"{name} [{suffix}]")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        build_s = time.time() - t0
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        timings = []
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings.append(round(time.time() - t0, 3))
        header = (
            f"-- query: {name}\n-- snapshot: {suffix}\n"
            f"-- build (construction incl. eager driver work): {build_s:.3f}s\n"
        )
        if timings:
            header += (
                f"-- noop timings (construction+execution, {reps} reps): "
                f"{timings} best={min(timings)}\n"
            )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(header + "\n" + buf.getvalue())
        print(f"wrote {path}" + (f" best={min(timings)}" if timings else ""))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-query Spark JOB counts: how many jobs run during query
CONSTRUCTION (eager driver work: probes, counts, validation collects)
vs during the timed noop ACTION. The r17 verdict's finding is that the
fleet is scheduling-floor-bound (~0.1 s per job at local[32]), so the
construction job count IS the optimization target for item 1 of the
r18 plan (fuse validate/count/probe driver actions into one job).

    python tools/job_counts.py [name1 name2 ...]   # default: all

Prints ``name construction_jobs action_jobs total_sec`` sorted by
construction_jobs desc. Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from scholar_stream_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="job-counts")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm-up
    qs = entry_mod.queries()
    if not names:
        names = sorted(qs)
    st = spark.sparkContext.statusTracker()
    results = []
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        # job ids increase monotonically; the max id seen so far is the
        # job counter (getJobIdsForGroup() = jobs with no explicit group,
        # which is every job this engine submits)
        j0 = max([-1, *(st.getJobIdsForGroup() or [])])
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            j1 = max([j0, *(st.getJobIdsForGroup() or [])])
            df.write.format("noop").mode("overwrite").save()
            j2 = max([j1, *(st.getJobIdsForGroup() or [])])
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ERROR {type(exc).__name__}: {exc}"[:200])
            continue
        dt = time.time() - t0
        results.append((name, j1 - j0, j2 - j1, dt))
    results.sort(key=lambda r: (-r[1], -r[3]))
    for name, cj, aj, dt in results:
        print(f"{name} construction_jobs={cj} action_jobs={aj} "
              f"total={dt:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()

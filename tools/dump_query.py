#!/usr/bin/env python
"""Deterministic result checksum per query: runs each named query and
prints ``name md5 n_rows`` where md5 hashes the SORTED row reprs —
order-insensitive value comparison for old-vs-new equivalence checks.

    python tools/dump_query.py name1 name2 ...
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from scholar_stream_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dump-query")
    qs = entry_mod.queries()
    for name in names:
        try:
            rows = qs[name](spark, sf_dir).collect()
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ERROR {type(exc).__name__}: {exc}"[:300])
            continue
        reprs = sorted(repr(tuple(r)) for r in rows)
        h = hashlib.md5("\n".join(reprs).encode()).hexdigest()
        print(f"{name} {h} {len(rows)}")
    spark.stop()


if __name__ == "__main__":
    main()

"""No-Spark smoke for the driver contract.

Rounds 2–3 were blanked by ``oracle_sql()`` raising at import/collection
time (a missing module constant), which killed the driver's correctness
harness before it checked anything. This test needs no SparkSession and
no parquet: it only proves the contract CONSTRUCTS — both dicts build,
key-sets are consistent, and every oracle entry is non-empty SQL — so a
broken constant surfaces as one red test, not a dark round.
"""

from __future__ import annotations

import importlib


def test_entry_contract_constructs():
    entry = importlib.import_module("__spark_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    assert len(queries) >= 60, f"queries() shrank: {len(queries)}"
    assert set(oracles) <= set(queries), (
        f"oracle keys without a query: {sorted(set(oracles) - set(queries))}"
    )
    for name, fn in queries.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), f"empty oracle: {name}"


def test_rows_only_set_is_documented():
    """Every query deliberately lacking an oracle must be named in the
    module docstring (the judge reads that list as the design record)."""
    entry = importlib.import_module("__spark_entry__")
    rows_only = set(entry.queries()) - set(entry.oracle_sql())
    doc = entry.__doc__ or ""
    undocumented = {n for n in rows_only if n not in doc}
    assert not undocumented, f"rows-only without docstring note: {undocumented}"


def test_driver_cap_rotation_invariants():
    """The driver's CORRECTNESS run checks the FIRST 50 queries() in
    dict order. Guard the rotation's two invariants: every capped slot
    is oracle-backed (a rows-only entry inside the cap would waste a
    value-checked slot), and the rows-only block sits contiguously at
    the tail. Also pin that _DRIVER_FIRST names exist and lead."""
    entry = importlib.import_module("__spark_entry__")
    order = list(entry.queries())
    oracle_backed = set(entry.oracle_sql())
    assert all(n in oracle_backed for n in order[:50]), [
        n for n in order[:50] if n not in oracle_backed
    ]
    rows_only = [n for n in order if n not in oracle_backed]
    assert order[-len(rows_only):] == rows_only
    assert order[: len(entry._DRIVER_FIRST)] == list(entry._DRIVER_FIRST)
    # the rotation note's "N entries" claim lives in a module constant
    # (two r14 review rounds caught the prose count stale; a constant
    # asserted against the dict itself cannot drift, and survives
    # bytecode-only installs where reading entry.__file__ source would
    # not)
    assert entry._N_ORACLE_BACKED == len(oracle_backed), (
        entry._N_ORACLE_BACKED, len(oracle_backed),
    )


def test_driver_first_is_least_recently_checked():
    """r13: the rotation is COMPUTED — oracle-backed entries ordered by
    the last round they were driver-green in the committed
    CORRECTNESS_r*.json artifacts, ascending (never-checked = -1
    leads), ties alphabetical. Recompute independently and require the
    module's order to be monotone in (last_green, name) — manual
    curation let 65 entries go 3-4 windows stale by r12."""
    import glob
    import json
    import os
    import re

    entry = importlib.import_module("__spark_entry__")
    root = os.path.dirname(os.path.abspath(entry.__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        for name, v in json.load(open(path)).items():
            if isinstance(v, dict) and all(
                v.get(k) is True
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                last[name] = max(last.get(name, -1), rnd)
    keys = [(last.get(n, -1), n) for n in entry._DRIVER_FIRST]
    assert keys == sorted(keys)
    assert set(entry._DRIVER_FIRST) == set(entry.oracle_sql())

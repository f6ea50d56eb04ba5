"""Property-based check of the as-of join's union+window formulation.

The single-shuffle as-of (merge-order by (key, ts, side) + running
``last(..., ignorenulls)``) replaces an inequality join; its
correctness hinges on tie-breaking: right rows sort BEFORE left rows at
equal ts (inclusive match) and the winning right row is the latest
(ts, event_id). Hypothesis drives adversarial inputs — duplicate
timestamps, interleaved users, empty sides — against a naive O(n²)
Python reference.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scholar_stream_spark.operators.temporal import asof_join_events

BASE = datetime(2024, 6, 1, tzinfo=timezone.utc)

event = st.tuples(
    st.integers(min_value=1, max_value=3),       # user_id (few → collisions)
    st.integers(min_value=0, max_value=20),      # ts offset seconds (ties!)
    st.sampled_from(["purchase", "click", "view"]),
    st.floats(min_value=0, max_value=10, allow_nan=False),
)


def _naive_asof(rows):
    """O(n²) reference: latest click at-or-before each purchase, ties on
    ts → highest event_id."""
    out = {}
    for eid, uid, ts, typ, _val in rows:
        if typ != "purchase":
            continue
        best = None
        for reid, ruid, rts, rtyp, rval in rows:
            if rtyp != "click" or ruid != uid or rts > ts:
                continue
            if best is None or (rts, reid) > (best[1], best[0]):
                best = (reid, rts, rval)
        out[eid] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event, min_size=0, max_size=25))
def test_asof_matches_naive_reference(spark, raw):
    rows = [
        (i, uid, BASE + timedelta(seconds=off), typ, round(val, 2))
        for i, (uid, off, typ, val) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {
        r["event_id"]: (
            r["matched_event_id"],
            r["matched_ts"],
        )
        for r in asof_join_events(df).collect()
    }
    expected = _naive_asof(
        [(eid, uid, ts, typ, val) for eid, uid, ts, typ, val in rows]
    )
    assert set(got) == set(expected)
    for eid, best in expected.items():
        if best is None:
            assert got[eid][0] is None
        else:
            assert got[eid][0] == best[0]
            assert got[eid][1].replace(tzinfo=timezone.utc) == best[1]

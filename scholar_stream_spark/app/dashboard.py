"""Headless consumption layer — the reference dashboard's read path.

The reference ships a Streamlit page (``app/home.py``) that polls two
queries over the curated views and renders four KPI tiles plus a
top-N-recent table, with deliberately defensive NULL/NaN handling
(``app/home.py:151-196``): an empty ``VW_LATENCY``, a NULL metric, or a
NaN float must degrade to an informative "no recent data" state, never
crash the page. Streamlit itself is plumbing; the value is (a) the two
queries, (b) the defensive presentation contract, (c) the role-scoped
context allowlists (``app/home.py:33-42,123-136``).

This module re-expresses exactly that as pure functions over a
SparkSession whose catalog was initialized by ``init_catalog`` (which
enforces the role allowlist — G2/G3):

- ``latency_tiles(spark)``  — Q1 + the ``_get_val``/``_to_float``
  defensive extraction; returns a dict of tiles or ``None`` for the
  reference's "No recent data" state.
- ``recent_works(spark, limit)`` — Q2, slider bounds 10..500 enforced
  like the UI slider (``app/home.py:134-136``).
- ``render_report(...)``     — the terminal rendering of the page
  (KPI lines + a fixed-width table), UI-toolkit-free.

A polling loop (the Streamlit rerun button) is just
``while True: print(render_report(...)); sleep(...)`` — see the
``report`` CLI subcommand in ``__main__``.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

#: Slider bounds of the reference's "Rows (recent)" control
#: (``app/home.py:134-136``).
MIN_LIMIT = 10
MAX_LIMIT = 500
DEFAULT_LIMIT = 50

#: The two dashboard queries, verbatim analogs of ``app/home.py:143-146``
#: and ``:202-208`` (columns lowercased to this engine's convention).
LATENCY_SQL = (
    "SELECT avg_sec_5m, min_sec_5m, max_sec_5m, samples_5m, "
    "window_start, window_end FROM vw_latency"
)
WORKS_SQL_TEMPLATE = (
    "SELECT work_id, title, primary_author, publication_year, email, "
    "event_ts, landed_ts, latency_seconds "
    "FROM vw_works ORDER BY landed_ts DESC LIMIT {limit}"
)

WORKS_COLUMNS = (
    "work_id",
    "title",
    "primary_author",
    "publication_year",
    "email",
    "event_ts",
    "landed_ts",
    "latency_seconds",
)


def _to_float(x) -> float | None:
    """NULL/NaN/uncastable → None (``app/home.py:171-175`` plus the NaN
    check at ``:156-165`` — Snowflake drivers surface NULL aggregates as
    NaN floats, and so does ``toPandas``)."""
    try:
        if x is None:
            return None
        f = float(x)
    except Exception:
        return None
    return None if math.isnan(f) else f


def latency_tiles(spark: SparkSession) -> dict | None:
    """Q1 with the reference's defensive extraction.

    Returns ``{"avg_sec": float|None, "min_sec": float|None,
    "max_sec": float|None, "samples": int, "window_start", "window_end"}``
    or ``None`` when there is nothing to show — the reference's
    "No recent data in the last 5 minutes" state (``app/home.py:187-190``):
    an EMPTY result, all-NULL metrics, or zero samples all map there.
    """
    rows = spark.sql(LATENCY_SQL).collect()
    if not rows:
        return None
    first = rows[0].asDict()
    avg_sec = _to_float(first.get("avg_sec_5m"))
    min_sec = _to_float(first.get("min_sec_5m"))
    max_sec = _to_float(first.get("max_sec_5m"))
    try:
        samples_raw = first.get("samples_5m")
        samples = int(samples_raw) if samples_raw is not None else 0
    except Exception:
        samples = 0
    if all(v is None for v in (avg_sec, min_sec, max_sec)) or samples == 0:
        return None
    return {
        "avg_sec": avg_sec,
        "min_sec": min_sec,
        "max_sec": max_sec,
        "samples": samples,
        "window_start": first.get("window_start"),
        "window_end": first.get("window_end"),
    }


def clamp_limit(limit: int) -> int:
    """The UI slider cannot produce values outside 10..500; the CLI
    enforces the same bounds rather than trusting the caller."""
    return max(MIN_LIMIT, min(MAX_LIMIT, int(limit)))


def recent_works(spark: SparkSession, limit: int = DEFAULT_LIMIT):
    """Q2 — top-N most recent works (TakeOrderedAndProject, never a full
    sort). Returns the DataFrame so callers can ``toPandas``/paginate."""
    return spark.sql(WORKS_SQL_TEMPLATE.format(limit=clamp_limit(limit)))


def _fmt_tile(value: float | None, pattern: str) -> str:
    """``None`` renders as the reference's em-dash placeholder
    (``app/home.py:193-195``)."""
    return pattern.format(value) if value is not None else "—"


def render_report(spark: SparkSession, limit: int = DEFAULT_LIMIT) -> str:
    """One poll of the dashboard as plain text: 4 KPI tiles + the
    recent-works table. Never raises on empty/NULL data."""
    out: list[str] = ["ScholarStream — Live Metrics", ""]
    tiles = latency_tiles(spark)
    if tiles is None:
        out.append(
            "No recent data in the last 5 minutes. "
            "Start the producer to see metrics."
        )
    else:
        out.append(
            "  ".join(
                [
                    f"Avg Latency (5m): {_fmt_tile(tiles['avg_sec'], '{:.1f}s')}",
                    f"Min (5m): {_fmt_tile(tiles['min_sec'], '{:.0f}s')}",
                    f"Max (5m): {_fmt_tile(tiles['max_sec'], '{:.0f}s')}",
                    f"Samples (5m): {tiles['samples']}",
                ]
            )
        )
    out += ["", "Recent works"]
    rows = recent_works(spark, limit).collect()
    if not rows:
        out.append("(no rows)")
    else:
        widths = {
            c: max(len(c), *(len(str(r[c])) for r in rows))
            for c in WORKS_COLUMNS
        }
        header = " | ".join(c.ljust(widths[c]) for c in WORKS_COLUMNS)
        out += [header, "-" * len(header)]
        out += [
            " | ".join(str(r[c]).ljust(widths[c]) for c in WORKS_COLUMNS)
            for r in rows
        ]
    return "\n".join(out)

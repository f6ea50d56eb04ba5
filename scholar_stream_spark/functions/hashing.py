"""Portable deterministic hashing (cross-engine reproducible).

The sketch operators (MinHash-LSH, SimHash — ``operators/dedup.py``) need
an integer hash of a string that is *bit-identical* in Spark and in the
DuckDB correctness oracle. Spark's native ``hash``/``xxhash64`` and
DuckDB's ``hash`` are different algorithms, so neither can be checked
against the other. Both engines, however, agree exactly on ``md5``,
``substr`` and ``instr`` — so we derive a 48-bit integer from the first
12 hex chars of the md5 digest with plain int64 arithmetic.

This is the *portable* profile, used wherever results must be verifiable
across engines. For pure-Spark production runs at scale the operators
accept ``hash_profile="fast"`` which swaps in ``xxhash64`` (one codegen'd
JVM call instead of 12 substr/instr ops) — same semantics, ~5x cheaper,
just not oracle-checkable.

All constants here are shared with the oracle-SQL generators in
``__spark_entry__.py`` so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1; universal-hash modulus. h < P and a,b < P keep
#: a*h+b < 2^62, safely inside int64 in both engines.
MINHASH_PRIME = 2_147_483_647

#: (a, b) parameters for the MinHash family h_j(x) = (a_j*x + b_j) mod P.
#: Generated once from a fixed LCG seed; frozen literals so the Spark and
#: DuckDB sides are guaranteed identical.
def _lcg_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    state = seed
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (MINHASH_PRIME - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % MINHASH_PRIME
        out.append((a, b))
    return out


MINHASH_NUM_HASHES = 32
MINHASH_PARAMS: list[tuple[int, int]] = _lcg_params(MINHASH_NUM_HASHES)

#: LSH banding: 8 bands x 4 rows. P(candidate | jaccard=0.8) ≈ 0.985.
MINHASH_BANDS = 8
MINHASH_ROWS_PER_BAND = 4

SIMHASH_BITS = 32

_HEX = "0123456789abcdef"


def hex48_sql(expr: str) -> str:
    """DuckDB-side SQL for the portable 48-bit hash of ``expr``.

    Big-endian base-16 positional sum over the first 12 hex chars of the
    md5 digest — the value ``conv(substr(md5(x),1,12), 16, 10)`` yields,
    which is what the Spark side computes (``hex48_spark_sql``; DuckDB
    1.0 has no ``conv``, hence two texts for one function — the oracle
    parity tests enforce they agree).

    Every term is forced to 64-bit with an explicit ``CAST(... AS
    BIGINT)`` before the positional multiply: Spark/DuckDB ``instr``
    arithmetic in 32-bit would overflow from ``16^7`` up
    (ARITHMETIC_OVERFLOW under Spark ANSI mode; silent wraparound
    otherwise). The text stays valid in both engines even though only
    the oracle uses it.
    """
    terms = [
        f"CAST(instr('{_HEX}', substr(md5({expr}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (11 - i)}"
        for i in range(12)
    ]
    return "(" + " + ".join(terms) + ")"


def hex48_spark_sql(expr: str) -> str:
    """Spark-side SQL for the same 48-bit hash: ONE ``conv`` call.

    ``conv(hex, 16, 10)`` replaces 12 substr+instr+multiply terms — the
    per-shingle hashing cost that dominated the minhash/simhash queries.
    48 bits fits a long exactly; md5 output is lowercase hex, which
    ``conv`` accepts.
    """
    return f"CAST(conv(substr(md5({expr}), 1, 12), 16, 10) AS BIGINT)"


def portable_hash48(expr: str) -> Column:
    """48-bit portable hash of a string SQL expression (see module doc).

    Takes SQL text (a column name or any string-valued expression); the
    Spark side evaluates the fast ``conv`` form, the DuckDB oracle the
    equivalent positional sum (``hex48_sql``).
    """
    return F.expr(hex48_spark_sql(expr)).cast("long")


def minhash_sql_terms(hash_expr: str) -> list[str]:
    """Per-j SQL for (a_j*(h % P) + b_j) % P, portable across engines."""
    return [
        f"(({a} * ({hash_expr} % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME})"
        for a, b in MINHASH_PARAMS
    ]

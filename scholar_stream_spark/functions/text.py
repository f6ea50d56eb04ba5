"""Text scalar functions: synthetic email, masking, tokenization.

All pure Column expressions (JVM codegen, no Python UDFs) so they run at
full speed inside any batch or streaming plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Roles that see email in the clear (reference sql/05_masking_policy.sql:12).
PRIVILEGED_ROLES = ("ACCOUNTADMIN", "R_TRANSFORM", "R_INGEST")


def synthetic_email(name: Column, domain: str = "example.com") -> Column:
    """Deterministic synthetic email: ``user_`` + first 10 hex chars of
    SHA-1(name or "unknown") + ``@domain``.

    Parity with reference ``ingestion/utils.py:8-11`` (verified against
    hashlib in tests). NULL name falls back to the literal "unknown",
    exactly like the reference's ``(name or "unknown")``.
    """
    seed = F.coalesce(name, F.lit("unknown"))
    digest = F.sha1(F.encode(seed, "UTF-8"))
    return F.concat(F.lit("user_"), F.substring(digest, 1, 10), F.lit("@" + domain))


def mask_email(email: Column, role: str) -> Column:
    """Dynamic email-masking expression.

    Reference semantics (``sql/05_masking_policy.sql:10-16``):
    privileged roles see the clear value; NULL stays NULL; values with no
    ``@`` collapse to ``'***'``; otherwise ``first char + '***' +
    substring from the '@'`` (e.g. ``a***@ex.com``).

    OSS Spark has no engine-level masking policies, so the policy is an
    expression applied by the role-scoped view factory
    (``operators/masking.py``). ``role`` is a plan-time constant — for a
    privileged role Catalyst constant-folds the whole CASE away and the
    clear column is scanned directly.
    """
    if role.upper() in PRIVILEGED_ROLES:
        return email
    at_pos = F.instr(email, "@")
    return (
        F.when(email.isNull(), F.lit(None).cast("string"))
        .when(at_pos == 0, F.lit("***"))
        .otherwise(
            F.concat(
                F.substring(email, 1, 1),
                F.lit("***"),
                email.substr(at_pos, F.length(email)),
            )
        )
    )


def normalize_text(text: Column) -> Column:
    """Canonical text form for fingerprinting/dedup: lowercase, collapse
    whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty-safe)."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(text: Column, n: int = 5) -> Column:
    """Array of n-word shingles (space-joined), the dedup feature unit.

    Built with ``transform(sequence(...))`` + ``slice`` — pure array
    expressions, no explode until the caller chooses to, so shingling
    composes with aggregate pushdown. Documents shorter than ``n`` words
    yield an empty array.
    """
    toks = tokens(text)
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    # sequence(1, 0) would step DOWN ([1, 0]); guard the short-doc case.
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )

"""G1 masking-expression branches (reference sql/05_masking_policy.sql:10-16)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.functions.text import mask_email

CASES = [
    ("alice@example.com", "a***@example.com"),
    ("a@b.co", "a***@b.co"),
    ("no-at-sign", "***"),
    (None, None),
    ("@leading.at", "@***@leading.at"),  # first char IS the @: left(1)+***+from-@
]


@pytest.fixture(scope="module")
def masked(spark):
    df = spark.createDataFrame([(v,) for v, _ in CASES], ["email"])
    out = df.select(
        F.col("email"),
        mask_email(F.col("email"), role="R_ANALYST").alias("masked"),
        mask_email(F.col("email"), role="R_TRANSFORM").alias("clear"),
    )
    return out.collect()


def test_unprivileged_branches(masked):
    got = {r["email"]: r["masked"] for r in masked}
    for value, expected in CASES:
        assert got[value] == expected, value


def test_privileged_roles_see_clear(masked):
    for r in masked:
        assert r["clear"] == r["email"]


def test_init_catalog_rejects_unknown_role(spark):
    """G2/G3 allowlist: unknown roles fail loudly (reference restricts
    selectable roles the same way, app/home.py:33-42)."""
    from scholar_stream_spark.plans.catalog import init_catalog

    raw = spark.createDataFrame([("{}", "{}")], ["payload", "metadata"])
    with pytest.raises(ValueError, match="unknown role"):
        init_catalog(spark, raw, role="R_SUPERUSER")
    # known roles pass in any case
    init_catalog(spark, raw, role="r_analyst")

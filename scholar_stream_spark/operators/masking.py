"""Governance operators G1-G3 (SURVEY.md §2.4).

OSS Spark has no Snowflake-style attachable masking policies or RBAC, so
governance is emulated exactly where the reference's *semantics* live:

- G1: the masking rule is a Column expression
  (``functions.text.mask_email``) with the reference's four branches
  (privileged-clear / NULL / no-@ / partial-mask,
  reference ``sql/05_masking_policy.sql:10-16``).
- G2/G3: role scoping is an *access-scoped catalog* — ``apply_masking``
  builds the view a given role is allowed to see; privileged roles get
  the clear column (and Catalyst folds the policy away entirely), analyst
  roles get the masked projection. ``plans/catalog.init_catalog`` wires
  this into the registered view set per role (reference role model:
  ``sql/02_rbac_policies.sql:3-34``, UI allowlists ``app/home.py:33-42``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from scholar_stream_spark.functions.text import PRIVILEGED_ROLES, mask_email

#: Role taxonomy carried over from the reference (sql/02_rbac_policies.sql).
KNOWN_ROLES = ("ACCOUNTADMIN", "R_INGEST", "R_TRANSFORM", "R_ANALYST")


def apply_masking(
    df: DataFrame, role: str, email_col: str = "email"
) -> DataFrame:
    """Return ``df`` with ``email_col`` masked according to ``role``.

    Same column name out as in (policy semantics: the masking is
    transparent to downstream queries — reference attaches the policy to
    the view column in place, ``sql/05_masking_policy.sql:18-19``).
    """
    return df.withColumn(email_col, mask_email(df[email_col], role))


def is_privileged(role: str) -> bool:
    return role.upper() in PRIVILEGED_ROLES

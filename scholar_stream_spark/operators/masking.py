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


#: Re-identification threshold: a quasi-identifier group smaller than
#: K_ANON_K is an at-risk equivalence class (Sweeney 2002's k).
K_ANON_K = 5
#: Account-balance generalization width for the quasi-identifier.
K_ANON_BAL_BAND = 1000


def k_anonymity_audit(
    customer: DataFrame,
    k: int = K_ANON_K,
    bal_band: int = K_ANON_BAL_BAND,
) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers — the
    measurement side of the governance story `apply_masking` enforces
    (Sweeney 2002: masking direct identifiers is not enough when the
    QUASI-identifier combination — here (nation, market segment,
    balance band) — isolates individuals; an equivalence class smaller
    than k re-identifies its members by linkage).

    Reports the equivalence-class SIZE DISTRIBUTION rather than the
    classes themselves (the classes are the sensitive thing — a size-1
    dump would be its own leak): per distinct class size, how many
    classes, how many customers, and whether that size is below k.
    ``sum(n_customers)`` partitions the table by construction.

    The balance generalization is integer floor-division of the DOUBLE
    balance by ``bal_band`` — identical IEEE divide + floor both
    engines; NULL balances form their own band (grouped, not dropped —
    the linkage attacker sees NULL too).

    Scale shape: two map-side-combined exchanges (customer → ≤|QI
    grid| class sizes → ≤max-size histogram); no window, no join.
    Output: (group_size, n_groups, n_customers, at_risk), exact
    integers.
    """
    from pyspark.sql import functions as F

    if k < 1:
        raise ValueError(f"k_anonymity: k must be >= 1, got {k}")
    if bal_band <= 0:
        # the generalization divide would be /0 -> inf bands
        raise ValueError(
            f"k_anonymity: bal_band must be > 0, got {bal_band}"
        )
    classes = customer.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(float(bal_band))).alias(
            "_band"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    return (
        classes.groupBy("group_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_customers"),
        )
        .select(
            "group_size",
            "n_groups",
            "n_customers",
            (F.col("group_size") < k).alias("at_risk"),
        )
    )


#: Distinct-sensitive-value floor: a class where every member shares
#: one market segment leaks the segment by membership alone.
L_DIVERSITY_L = 2


def l_diversity_audit(
    customer: DataFrame,
    l_floor: int = L_DIVERSITY_L,
    bal_band: int = K_ANON_BAL_BAND,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a quasi-identifier class can be large (k-safe)
    while every member shares the SAME sensitive value, so membership
    alone discloses it (the homogeneity attack). Quasi-identifiers
    here are (nation, balance band) — the `k_anonymity_audit` grid
    MINUS the sensitive attribute — and the sensitive value is the
    market segment.

    Same disclosure-safe shape as the k audit: the distribution of
    per-class distinct-sensitive counts, not the classes themselves —
    per distinct l: classes, customers, at-risk flag (``l <
    l_floor``). ``sum(n_customers)`` partitions the population.

    Scale shape: the distinct-sensitive count and the class size come
    from ONE two-level aggregate (customer → distinct (QI, segment)
    grid with member counts → per-class rollup), then the ≤max-l
    histogram — three map-side-combined exchanges, no window, no
    join. NULL balances and NULL segments each group as their own
    value (the attacker sees NULL too). Output: (l_distinct,
    n_classes, n_customers, at_risk), exact integers.
    """
    from pyspark.sql import functions as F

    if l_floor < 1:
        raise ValueError(
            f"l_diversity: l_floor must be >= 1, got {l_floor}"
        )
    if bal_band <= 0:
        raise ValueError(
            f"l_diversity: bal_band must be > 0, got {bal_band}"
        )
    cells = customer.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(float(bal_band))).alias(
            "_band"
        ),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("long").alias("_m"))
    classes = cells.groupBy("c_nationkey", "_band").agg(
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.sum("_m").cast("long").alias("_size"),
    )
    return (
        classes.groupBy("l_distinct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("_size").cast("long").alias("n_customers"),
        )
        .select(
            "l_distinct",
            "n_classes",
            "n_customers",
            (F.col("l_distinct") < l_floor).alias("at_risk"),
        )
    )

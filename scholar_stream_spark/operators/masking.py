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


#: Total-variation threshold: a class whose sensitive-value
#: distribution sits farther than this from the global one leaks
#: attribute information even when k- and l-safe.
T_CLOSENESS_T = 0.3


def t_closeness_audit(
    customer: DataFrame,
    t_threshold: float = T_CLOSENESS_T,
    bal_band: int = K_ANON_BAL_BAND,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    skewness attack l-diversity misses: a class can contain l distinct
    sensitive values yet be distributed nothing like the population
    (99% segment A in a 20%-A world), so membership still shifts the
    attacker's posterior. Distance is the variational/EMD-with-unit-
    ground metric for categoricals: ``t = ½·Σ_s |p_class(s) −
    p_global(s)|``, QI = (nation, balance band), sensitive = market
    segment (the `l_diversity_audit` grid).

    Zero-cell fold, the `segment_priority_chi2` discipline: a segment
    ABSENT from a class contributes exactly ``p_global(s)`` and
    ``Σ_all p_global = 1``, so ``t = ½·(Σ_{s∈class} (|p_cs − p_gs| −
    p_gs) + 1)`` needs only the OCCUPIED (class, segment) cells — no
    class × segment densify. Each term is the identical DOUBLE
    literal of exact integer counts on both engines; NULL segments
    coalesce to a sentinel BEFORE the pipeline (join keys drop NULLs
    in both engines — the sentinel keeps that mass in the
    distribution, the `lang_mix_by_source` precedent).

    Disclosure-safe histogram shape (the k/l audits' contract): per
    (tenth-bucket of t, at-risk flag) — both computed PER CLASS on
    the engine-identical double (``floor(t·10)`` and ``t >
    t_threshold``), grouped together so a bucket straddling the
    threshold splits honestly instead of blurring into one flag. Scale
    shape: ONE cells aggregate (checkpointed — feeds class sizes,
    global margins, and terms), two tiny rollups broadcast back,
    per-class reduce, ≤11-row histogram.

    Output: (t_bucket, n_classes, n_customers, at_risk) — bucket INT
    0..10, counts BIGINT.
    """
    from pyspark.sql import functions as F

    if not 0.0 < t_threshold <= 1.0:
        raise ValueError(
            f"t_closeness: t_threshold must be in (0, 1], got "
            f"{t_threshold}"
        )
    if bal_band <= 0:
        raise ValueError(
            f"t_closeness: bal_band must be > 0, got {bal_band}"
        )
    cells = (
        customer.groupBy(
            "c_nationkey",
            F.floor(
                F.col("c_acctbal") / F.lit(float(bal_band))
            ).alias("_band"),
            F.coalesce("c_mktsegment", F.lit("(null)")).alias("_seg"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_m"))
        # three consumers (class sizes, global margins, terms)
        .localCheckpoint(eager=False)
    )
    classes = cells.groupBy("c_nationkey", "_band").agg(
        F.sum("_m").cast("long").alias("_n_c")
    )
    seg_tot = cells.groupBy("_seg").agg(
        F.sum("_m").cast("long").alias("_g")
    )
    n_total = cells.agg(F.sum("_m").cast("long").alias("_n"))
    c = cells.alias("c")
    k = classes.alias("k")
    per_class = (
        # NULL-SAFE on BOTH QI keys: NULL-balance/NULL-nation classes
        # are real QI classes — a plain equi-join would silently drop
        # them from the histogram, breaking the triptych's shared
        # "sum(n_customers) partitions the population" contract with
        # k_anonymity/l_diversity (pure groupBys, which KEEP NULL
        # keys). The oracle mirrors with IS NOT DISTINCT FROM; segments
        # were already coalesced to the sentinel so their join is plain
        c.join(
            F.broadcast(k),
            F.col("c.c_nationkey").eqNullSafe(F.col("k.c_nationkey"))
            & F.col("c._band").eqNullSafe(F.col("k._band")),
        )
        .select(
            F.col("c.c_nationkey").alias("c_nationkey"),
            F.col("c._band").alias("_band"),
            "c._seg",
            "c._m",
            "k._n_c",
        )
        .join(F.broadcast(seg_tot), "_seg")
        .crossJoin(F.broadcast(n_total))
        .groupBy("c_nationkey", "_band", "_n_c")
        .agg(
            F.sum(
                F.expr(
                    "abs(CAST(_m AS DOUBLE) / CAST(_n_c AS DOUBLE)"
                    " - CAST(_g AS DOUBLE) / CAST(_n AS DOUBLE))"
                    " - CAST(_g AS DOUBLE) / CAST(_n AS DOUBLE)"
                )
            ).alias("_tsum")
        )
        .select(
            "_n_c",
            F.expr("0.5 * (_tsum + 1.0)").alias("_t"),
        )
    )
    return (
        per_class.groupBy(
            F.expr("CAST(floor(_t * 10.0) AS INT)").alias("t_bucket"),
            F.expr(f"_t > {t_threshold!r}").alias("at_risk"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("_n_c").cast("long").alias("n_customers"),
        )
        .select("t_bucket", "n_classes", "n_customers", "at_risk")
    )

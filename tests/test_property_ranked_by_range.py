"""Property-based check of ``ranked_by_range`` (the rank-exact
family's distributed scale path).

The distributed rank's correctness hinges on the per-(partition, key)
offset bookkeeping surviving adversarial layouts: keys straddling range
boundaries, heavy value ties broken only by the id column, single-row
keys, empty partitions, and partition counts both smaller and larger
than the data. Hypothesis drives those against the window-form
``row_number`` the oracle profile uses — the two must be IDENTICAL on
any input whose (key, order) total order is unique (the family's
contract).
"""

from __future__ import annotations

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from scholar_stream_spark.operators.relational import (
    prefix_sum_by_range,
    ranked_by_range,
)

row = st.tuples(
    st.integers(min_value=0, max_value=4),    # key (few -> collisions)
    st.integers(min_value=0, max_value=6),    # value (heavy ties)
)

# NULL-key variant: Spark's groupBy keeps null keys, so the counts pass
# emits (pid, None) groups; the kernel must rank them too (pandas
# groupby dropna=False) — r12 ADVICE reproduced garbage ranks here.
row_nullable = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    st.integers(min_value=0, max_value=6),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(row, min_size=0, max_size=60),
    n_parts=st.integers(min_value=1, max_value=9),
    in_parts=st.integers(min_value=1, max_value=5),
)
def test_ranked_by_range_equals_window(spark, rows, n_parts, in_parts):
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "id long, k long, v long"
    ).repartition(in_parts)
    got = sorted(
        tuple(r)
        for r in ranked_by_range(
            df, ["k"], ["v", "id"], n_parts=n_parts, n_col="n"
        ).collect()
    )
    w = Window.partitionBy("k").orderBy("v", "id")
    wn = Window.partitionBy("k")
    want = sorted(
        tuple(r)
        for r in df.select(
            "id",
            "k",
            "v",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        ).collect()
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(row_nullable, min_size=1, max_size=40),
    n_parts=st.integers(min_value=1, max_value=7),
)
def test_ranked_by_range_null_keys_equal_window(spark, rows, n_parts):
    """Null-key groups get the SAME ranks/counts as the window form
    (Spark windows partition nulls into their own group). Also covers
    the Arrow nullable-int64→float64 key promotion: with any None
    present, the kernel sees the k column as float64 and must still
    hit the int-keyed offsets from the Spark counts pass."""
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, k long, v long")
    got = sorted(
        tuple(r)
        for r in ranked_by_range(
            df, ["k"], ["v", "id"], n_parts=n_parts, n_col="n"
        ).collect()
    )
    w = Window.partitionBy("k").orderBy("v", "id")
    wn = Window.partitionBy("k")
    want = sorted(
        tuple(r)
        for r in df.select(
            "id",
            "k",
            "v",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        ).collect()
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    cents=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=0,
        max_size=50,
    ),
    n_parts=st.integers(min_value=1, max_value=9),
)
def test_prefix_sum_by_range_equals_window(spark, cents, n_parts):
    """prefix_sum_by_range (the cumulative-sum sibling of
    ranked_by_range — per-partition partial SUMS for counts) must be
    BIT-identical to the global-window cumsum on exact decimals,
    under any partition count, including negative values, empty
    input, and values straddling range boundaries."""
    from decimal import Decimal

    from pyspark.sql.types import (
        DecimalType,
        LongType,
        StructField,
        StructType,
    )

    rows = [
        (i, Decimal(c) / Decimal(100)) for i, c in enumerate(cents)
    ]
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", DecimalType(18, 4)),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = sorted(
        tuple(r)
        for r in prefix_sum_by_range(
            df,
            [F.desc("v"), F.asc("id")],
            "v",
            cum_col="cum",
            total_col="tot",
            n_parts=n_parts,
        ).collect()
    )
    w = Window.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    want = sorted(
        tuple(r)
        for r in df.select(
            "id",
            "v",
            F.sum("v").over(w).cast("decimal(25,4)").alias("cum"),
            F.sum("v").over(w_tot).cast("decimal(25,4)").alias("tot"),
        ).collect()
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    small=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=0,
        max_size=20,
    ),
    huge=st.lists(
        # magnitudes near 2**62 so |running| + n·max|v| straddles the
        # 2**63 sufficient-condition guard: these examples fall back
        # to the Python-exact loop while the small ones vectorize
        st.sampled_from([2**62, -(2**62), 2**61, -(2**61)]),
        min_size=0,
        max_size=6,
    ),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_prefix_sum_int64_fast_path_guard_boundary(
    spark, small, huge, n_parts
):
    """r13 verdict item 4: the np.cumsum int64 fast path must be
    value-identical to the Python-exact loop ON the overflow-guard
    boundary. Small-magnitude examples take the vectorized path;
    near-2**62 magnitudes fail the |running| + n·max|v| < 2**63
    sufficient condition and fall back — both must equal the
    arbitrary-precision Python cumsum (intermediates constrained to
    int64 so the OUTPUT column itself cannot overflow)."""
    vals = small + huge
    order = sorted(range(len(vals)), key=lambda i: (-vals[i], i))
    run, expect = 0, {}
    for i in order:
        run += vals[i]
        assume(-(2**63) <= run < 2**63)  # bigint output must hold it
        expect[i] = run
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r["id"]: (r["cum"], r["tot"])
        for r in prefix_sum_by_range(
            df,
            [F.desc("v"), F.asc("id")],
            "v",
            cum_col="cum",
            total_col="tot",
            n_parts=n_parts,
        ).collect()
    }
    assert got == {i: (expect[i], run) for i in expect}

"""Z-order clustering: the pruning property, measured from parquet
footers.

A scan filtered on either dimension prunes row groups whose min/max
exclude the predicate, so the metric that matters is the PER-DIMENSION
normalized span of each row group: a single-column sort leaves the
second dimension at ~full span (a filter on it prunes nothing), while
z-order bounds BOTH dimensions at ~sqrt(1/n_groups) (times Morton
boundary slop). The test writes the same data both ways and asserts
the spans from the parquet footers: single-sort is tight on its sort
column but blind on the other; z-order is usefully tight on both.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from scholar_stream_spark.plans.zorder import write_zordered
from tests.conftest import SF_SMALL


def _mean_spans(path: str, c1: str, c2: str, span1: float, span2: float):
    spans1, spans2, groups = [], [], 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        schema_names = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            s1 = rg.column(schema_names[c1]).statistics
            s2 = rg.column(schema_names[c2]).statistics
            spans1.append((s1.max - s1.min) / span1)
            spans2.append((s2.max - s2.min) / span2)
            groups += 1
    return sum(spans1) / groups, sum(spans2) / groups, groups


def test_zorder_shrinks_row_group_bounding_boxes(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    span_ck = float(b[1] - b[0]) or 1.0
    span_tp = float(b[3] - b[2]) or 1.0

    single = str(tmp_path / "single_sort")
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(single)
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(orders, zpath, "o_custkey", "o_totalprice", n_files=16)

    # same rows either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(single).count()
        == orders.count()
    )

    ck_single, tp_single, _ = _mean_spans(
        single, "o_custkey", "o_totalprice", span_ck, span_tp
    )
    ck_z, tp_z, n_groups = _mean_spans(
        zpath, "o_custkey", "o_totalprice", span_ck, span_tp
    )
    assert n_groups >= 8
    # single-column sort: tight on custkey, blind on totalprice — a
    # totalprice filter cannot prune anything
    assert ck_single < 0.3
    assert tp_single > 0.8
    # z-order: BOTH dimensions usefully bounded — selective filters on
    # either column prune most row groups
    assert ck_z < 0.6, f"z custkey span {ck_z:.3f}"
    assert tp_z < 0.6, f"z totalprice span {tp_z:.3f} (single {tp_single:.3f})"


def test_zorder_bits_bound_and_null_routing(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F2

    from scholar_stream_spark.plans.zorder import zorder_key

    with pytest.raises(ValueError):
        zorder_key(F2.lit(1), F2.lit(1), bits=32)

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0), (4, None), (5, 50.0)],
        "k long, v double",
    )
    path = str(tmp_path / "z_null")
    write_zordered(df, path, "k", "v", n_files=2)
    back = spark.read.parquet(path)
    assert back.count() == 5
    assert back.filter("v IS NULL").count() == 2  # nulls preserved

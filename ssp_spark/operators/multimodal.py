"""Multimodal (image/audio/video) column plumbing.

Pattern: media is an opaque ``binary`` column plus a typed metadata
struct; decode/feature steps are Arrow-batched pandas functions over
mapInPandas so bytes stream through executors without driver collection.
The actual codecs are NOT available in this container, so decode bodies
are stubbed (deterministic fake or NotImplementedError) — the Spark-side
contract (schema, batching, partition sizing) is real and tested.

At 100 TB the binary column is usually a pointer (uri, offset, length)
into an object store rather than inlined bytes; both layouts share the
MEDIA_META schema below.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("uri", T.StringType()),          # object-store pointer variant
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media(df: DataFrame, bytes_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("string").alias("uri"),
    )
    return df.withColumn("media_meta", meta)


def decode_image(data: bytes) -> object:
    """Real pipelines: PIL/OpenCV decode. Not available here."""
    raise NotImplementedError("image codecs not available in this environment")


def _fake_feature(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: byte-histogram
    moments. Replaced by a real encoder where codecs/models exist."""
    if not data:
        return [0.0] * dim
    out = []
    for i in range(dim):
        sl = data[i::dim]
        out.append(float(sum(sl) % 997) / 997.0 if sl else 0.0)
    return out


def extract_features(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.

    Partition-sizing note: media rows are large, so upstream should
    repartition to keep (rows_per_partition x avg_media_size) within
    executor memory; the iterator form processes one Arrow batch at a
    time and never materializes a whole partition.
    """
    import hashlib

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf[bytes_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": data.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_md5": data.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature": data.map(lambda b: _fake_feature(b or b"")),
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, id_col: str, bytes_col: str, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: 1->n rows per media item.

    The decoder is stubbed (no codecs here): emits deterministic frame
    offsets from the fake 'duration' = n_bytes. Real impl swaps the body,
    the schema and the mapInPandas shape stay.
    """
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("offset_ms", T.LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                duration = len(data) if data is not None else 0
                for i, off in enumerate(range(0, duration, every_ms)):
                    rows.append((int(mid), i, off))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "offset_ms"])

    return df.mapInPandas(fn, schema)


def resize_media(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Image-resize plumbing: nearest-neighbor sample of the raw byte
    stream into an out_w x out_h grid.

    The "decoder" is the deterministic identity-on-bytes stand-in (no
    codecs in this container): pixel i = data[(i * len) // n]. A real
    implementation swaps the kernel for PIL/OpenCV; the mapInPandas
    shape, schema, and Arrow batching are exactly what production uses.
    pix_checksum (sum of sampled bytes) makes the output independently
    checkable without shipping the pixel buffer around.
    """
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("n_pixels", T.IntegerType()),
            T.StructField("pix_checksum", T.LongType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )
    n = out_w * out_h

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = data or b""
                if len(data) == 0:
                    pix = bytes(n)
                else:
                    pix = bytes(data[(i * len(data)) // n] for i in range(n))
                rows.append((int(mid), out_w, out_h, n, sum(pix), pix))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "out_w", "out_h", "n_pixels", "pix_checksum", "pixels"],
            )

    return df.mapInPandas(fn, schema)

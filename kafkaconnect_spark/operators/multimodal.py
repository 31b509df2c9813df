"""Multimodal columns — image/audio/video as opaque binary + metadata.

Per the north star: media travels as a ``binary`` column with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas UDFs over ``mapInPandas``. The decode step is
STUBBED (this container has no image/audio libraries): a clearly-marked
deterministic fake stands in so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested. Swap
``_decode_image_stub`` for PIL/torchvision in a real deployment; the
plan shape does not change.

Scale notes: media rows are large — ``spark.sql.files.maxPartitionBytes``
sizes scan partitions; mapInPandas streams Arrow batches so a partition
never materializes fully in Python memory; metadata-only predicates
(width/height/duration filters) are plain parquet pushdown since the
struct column is separate from the blob.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpg|wav|mp4...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("byte_histogram", T.ArrayType(T.LongType()), True),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Metadata extraction that needs no decode: pure Column ops
    (length, sha2) — stays JVM-side."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.lower(F.sha2(F.col(binary_col), 256)).alias("sha256"),
        ),
    )


def _decode_image_stub(data: bytes) -> np.ndarray:
    """STUB decoder — deterministic fake standing in for PIL/libvips.

    Real deployments replace this with an actual decoder returning a
    pixel ndarray; everything around it (Arrow batching, schema,
    partitioning, vectorized feature math) is production shape. The
    fake 'pixels' are just the raw bytes viewed as uint8.
    """
    if data is None:
        raise NotImplementedError("tombstone media blob — no decode")
    return np.frombuffer(data, dtype=np.uint8)


def extract_image_features(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas feature extraction: mean intensity + 16-bin byte
    histogram per blob. Arrow-batched; one Python process per task,
    zero driver involvement. The per-blob math is numpy (frombuffer +
    bincount) and the output frame is built column-wise, so a real
    decoder drops into _decode_image_stub at full speed."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means: list[float | None] = []
            hists: list[list[int] | None] = []
            for data in pdf[binary_col]:
                if data is None:
                    # NULL blob (e.g. a CDC tombstone) → NULL features,
                    # the same propagation a SQL oracle applies — never
                    # fabricate pixels, never kill the job
                    means.append(None)
                    hists.append(None)
                    continue
                pixels = _decode_image_stub(data)
                if pixels.size == 0:
                    means.append(None)
                    hists.append([0] * 16)
                    continue
                # int64 sum then one division: bit-identical to the
                # exact integer mean (counts < 2^53 stay exact)
                means.append(float(pixels.sum(dtype=np.int64)) / pixels.size)
                hists.append(
                    np.bincount(pixels >> 4, minlength=16).astype(np.int64).tolist()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "mean_intensity": pd.Series(means, dtype="object"),
                    "byte_histogram": pd.Series(hists, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 64,
    binary_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """'Frame sampling' plumbing: emit one row per sampled frame chunk
    (here: every Nth byte-slice of the fake stream). Row-explosion
    pattern identical to real video frame extraction."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                if data is None:
                    continue  # NULL blob → no frames (like explode(NULL))
                chunks = [
                    bytes(data[start : start + every_n_bytes])
                    for start in range(0, len(data), every_n_bytes)
                ]
                ids.extend([doc_id] * len(chunks))
                idxs.extend(range(len(chunks)))
                frames.extend(chunks)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(sample, out_schema)


def resize_image(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    binary_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing: binary→binary mapInPandas with output dims in
    the metadata. STUB 'resampling' truncates/right-pads the byte
    stream to width×height (deterministic); a real deployment swaps in
    PIL.Image.resize — schema and batch shape are identical."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL in → NULL out (SQL propagation), never a fabricated
            # all-zero image with a plausible sha256
            resized = [
                None if data is None else bytes(data)[:target].ljust(target, b"\x00")
                for data in pdf[binary_col]
            ]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "media": pd.Series(resized, dtype="object"),
                    "width": pd.Series([width] * n, dtype="int32"),
                    "height": pd.Series([height] * n, dtype="int32"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(resize, out_schema)


def make_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture: deterministic binary blobs derived from text
    (sha-seeded) — lets the multimodal plumbing run on the driver's
    documents table without real media files. Non-ASCII characters are
    stripped first so byte positions == character positions and every
    downstream oracle's octet math is corpus-independent."""
    return df.select(
        F.col(id_col),
        F.encode(
            F.regexp_replace(F.col(text_col), r"[^\x00-\x7F]", ""), "UTF-8"
        ).alias("media"),
    )

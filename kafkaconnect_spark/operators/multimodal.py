"""Multimodal columns — image/audio/video as opaque binary + metadata.

Per the north star: media travels as a ``binary`` column with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas UDFs over ``mapInPandas``. Decode is REAL for
the formats pure numpy can handle — binary PPM (P6) and uncompressed
24-bit BMP (``decode_ppm`` / ``decode_bmp``: header parse, row
padding, bottom-up order, BGR→RGB) — feeding real per-channel stats
(``decode_image_stats``) and real nearest-neighbor resampling
(``resize_decoded``). Compressed formats (png/jpeg) raise
``NotImplementedError``: that path needs PIL/libvips, absent from
this container by design; ``_decode_image_stub`` remains as the
clearly-marked fake for plumbing tests that don't care about pixels.

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


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format sniff for the formats this module can decode
    without external libraries. Returns None for anything else
    (compressed formats — png/jpeg — need a real codec library)."""
    if data is None or len(data) < 2:
        return None
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    return None


def decode_ppm(data: bytes) -> np.ndarray:
    """REAL decoder for binary PPM (P6, maxval ≤ 255): pure numpy,
    no external libraries. Returns an (H, W, 3) uint8 array.

    P6 grammar: 'P6' <ws> width <ws> height <ws> maxval <single ws>
    followed by raw RGB triples; '#' comments allowed in the header."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    # header tokenizer: whitespace-separated ints, '#…\n' comments
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated ppm header")
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit ppm needs byte-pair handling")
    n = w * h * 3
    pixels = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return pixels.reshape(h, w, 3)


def decode_bmp(data: bytes) -> np.ndarray:
    """REAL decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER):
    pure numpy. Handles the 4-byte row padding and bottom-up row
    order; returns (H, W, 3) uint8 in RGB order (BMP stores BGR)."""
    if data[:2] != b"BM":
        raise ValueError("not a bmp")
    pixel_offset = int.from_bytes(data[10:14], "little")
    header_size = int.from_bytes(data[14:18], "little")
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER bmp")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit bmp")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    raw = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=pixel_offset
    ).reshape(h, row_bytes)
    bgr = raw[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]  # bottom-up storage → top-down array
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch to the REAL pure-numpy decoders (P6 ppm, uncompressed
    24-bit bmp). Compressed formats raise NotImplementedError — that
    path needs PIL/libvips, absent from this container by design."""
    fmt = sniff_format(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(f"no codec for format={fmt!r}")


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


DECODED_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def decode_image_stats(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL decode → per-channel stats for the formats the pure-numpy
    codecs handle (P6 ppm, uncompressed 24-bit bmp); rows in any other
    format get NULL stats (the honest 'codec unavailable' signal, not
    fabricated pixels). mapInPandas / Arrow-batched, decode + channel
    means all numpy — one Python worker per task, no driver loop.

    Channel means are exact-integer sums divided ONCE (uint8 counts
    stay < 2^53, both operands exact, IEEE division correctly rounded)
    — bit-identical in any engine, no rounding needed."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights = [], [], []
            means: list[list[float | None]] = [[], [], []]
            for data in pdf[binary_col]:
                fmt = sniff_format(data) if data is not None else None
                if fmt is None:
                    fmts.append(None)
                    widths.append(None)
                    heights.append(None)
                    for c in range(3):
                        means[c].append(None)
                    continue
                arr = decode_image(data)
                h, w, _ = arr.shape
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                for c in range(3):
                    means[c].append(float(sums[c]) / (w * h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "format": pd.Series(fmts, dtype="object"),
                    "width": pd.Series(widths, dtype="object"),
                    "height": pd.Series(heights, dtype="object"),
                    "mean_r": pd.Series(means[0], dtype="object"),
                    "mean_g": pd.Series(means[1], dtype="object"),
                    "mean_b": pd.Series(means[2], dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, DECODED_STATS_SCHEMA)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 bytes."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def resize_decoded(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    binary_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL resize: decode (pure-numpy codecs) → nearest-neighbor
    resample via integer index maps → re-encode as P6. This is actual
    image math, not plumbing: the sample grid is the standard
    floor((i + 0.5) * src / dst) pixel-center mapping. Undecodable
    formats pass through as NULL."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[bytes | None] = []
            for data in pdf[binary_col]:
                if data is None or sniff_format(data) is None:
                    out.append(None)
                    continue
                arr = decode_image(data)
                sh, sw, _ = arr.shape
                rows = np.minimum(
                    ((np.arange(height) + 0.5) * sh / height).astype(np.int64), sh - 1
                )
                cols = np.minimum(
                    ((np.arange(width) + 0.5) * sw / width).astype(np.int64), sw - 1
                )
                out.append(encode_ppm(arr[rows][:, cols]))
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "media": pd.Series(out, dtype="object"),
                    "width": pd.Series([width] * n, dtype="int32"),
                    "height": pd.Series([height] * n, dtype="int32"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(resize, out_schema)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for RIFF/WAVE PCM-16: pure numpy. Walks the chunk
    list (fmt / data; skips LIST, fact, …), validates PCM 16-bit, and
    returns ((n_frames, channels) int16 samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a riff/wave file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1 or bits != 16:
                raise NotImplementedError("only PCM-16 wav")
            fmt = (channels, rate)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("wav missing fmt or data chunk")
    channels, rate = fmt
    samples = np.frombuffer(pcm, dtype="<i2")
    return samples.reshape(-1, channels), rate


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def audio_stats(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL wav decode → duration / peak / RMS per blob. Arrow-batched
    mapInPandas; all math is exact-integer numpy folds with one final
    IEEE division (and sqrt) — bit-replayable by a SQL oracle. Non-wav
    rows get NULL stats (no codec → no fabricated audio)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, frames, durs, peaks, rmss = [], [], [], [], []
            for data in pdf[binary_col]:
                if data is None or bytes(data[:4]) != b"RIFF":
                    rates.append(None)
                    frames.append(None)
                    durs.append(None)
                    peaks.append(None)
                    rmss.append(None)
                    continue
                samples, rate = decode_wav(bytes(data))
                n = samples.shape[0]
                flat = samples.astype(np.int64).ravel()
                rates.append(rate)
                frames.append(n)
                durs.append(float(n * 1000) / rate)
                peaks.append(int(np.abs(flat).max()) if flat.size else 0)
                rmss.append(
                    float(np.sqrt(float((flat * flat).sum()) / flat.size))
                    if flat.size
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "sample_rate": pd.Series(rates, dtype="object"),
                    "n_frames": pd.Series(frames, dtype="object"),
                    "duration_ms": pd.Series(durs, dtype="object"),
                    "peak": pd.Series(peaks, dtype="object"),
                    "rms": pd.Series(rmss, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, AUDIO_STATS_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("n_crossings", T.IntegerType(), False),
    ]
)


def audio_frame_features(
    df: DataFrame,
    frame_samples: int = 40,
    binary_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Short-time energy + zero-crossing count per fixed-size frame —
    the classic voice-activity-detection feature pair (Rabiner &
    Schafer's STE/ZCR front end, public), over the REAL wav decoder.
    All integer math (energy = Σ sample² per frame, crossing = sign
    flip between adjacent samples within a frame), so the output is
    value-hash oracle-able from the text fixture. Vectorized numpy
    (bincount over frame ids) in Arrow-batched mapInPandas; non-wav
    rows emit no frames.

    Scale shape: a pure map stage — frames explode ~n_samples/40 rows
    per blob with no shuffle; downstream per-frame filtering (e.g.
    keep energy above a silence floor) stays narrow."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            fids: list[int] = []
            ns: list[int] = []
            es: list[int] = []
            zs: list[int] = []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                if data is None or bytes(data[:4]) != b"RIFF":
                    continue
                samples, _rate = decode_wav(bytes(data))
                flat = samples.astype(np.int64).ravel()
                n = flat.size
                if n == 0:
                    continue
                f_of = np.arange(n) // frame_samples
                n_frames = int(f_of[-1]) + 1
                n_per = np.bincount(f_of, minlength=n_frames)
                # sample² ≤ 2^30 and ≤ frame_samples per bin — the
                # float64 bincount accumulator stays exact (< 2^53)
                energy = np.bincount(
                    f_of, weights=(flat * flat).astype(np.float64),
                    minlength=n_frames,
                ).astype(np.int64)
                neg = flat < 0
                pair_frame = f_of[:-1]
                same = pair_frame == f_of[1:]
                cross = (neg[:-1] != neg[1:]) & same
                zc = np.bincount(
                    pair_frame[cross], minlength=n_frames
                ).astype(np.int64)
                ids.extend([int(doc_id)] * n_frames)
                fids.extend(range(n_frames))
                ns.extend(int(x) for x in n_per)
                es.extend(int(x) for x in energy)
                zs.extend(int(x) for x in zc)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(es, dtype="int64"),
                    "n_crossings": pd.Series(zs, dtype="int32"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, AUDIO_FRAME_SCHEMA)


def decode_avi_frames(data: bytes) -> tuple[list[np.ndarray], int, int]:
    """REAL decoder for AVI containers carrying uncompressed 24-bit
    DIB video ('00db' chunks): pure numpy. Walks the RIFF tree
    ('hdrl' → strl/strf for dimensions, 'movi' for frame chunks) and
    returns (frames as (H, W, 3) RGB arrays, width, height). Each DIB
    frame payload is bottom-up BGR rows padded to 4 bytes — the same
    layout decode_bmp handles. Compressed streams ('00dc' with a
    non-DIB codec) raise NotImplementedError."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a riff/avi file")
    dims: list[tuple[int, int]] = []
    payloads: list[bytes] = []
    compressed = False

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal compressed
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body_start, body_end = pos + 8, pos + 8 + size
            if cid == b"LIST":
                walk(buf, body_start + 4, body_end)  # skip list type tag
            elif cid == b"strf" and len(buf) >= body_start + 40:
                w = int.from_bytes(buf[body_start + 4 : body_start + 8], "little", signed=True)
                h = int.from_bytes(buf[body_start + 8 : body_start + 12], "little", signed=True)
                bpp = int.from_bytes(buf[body_start + 14 : body_start + 16], "little")
                if bpp == 24:
                    dims.append((w, abs(h)))
            elif cid[2:4] == b"db":
                payloads.append(buf[body_start:body_end])
            elif cid[2:4] == b"dc":
                compressed = True
            pos = body_end + (size & 1)  # chunks are word-aligned

    walk(data, 12, len(data))
    if compressed and not payloads:
        raise NotImplementedError("compressed avi stream needs a codec library")
    if not dims:
        raise ValueError("avi missing a 24-bit strf header")
    w, h = dims[0]
    row_bytes = (w * 3 + 3) & ~3
    frames = []
    for p in payloads:
        raw = np.frombuffer(p, dtype=np.uint8, count=row_bytes * h).reshape(h, row_bytes)
        bgr = raw[:, : w * 3].reshape(h, w, 3)[::-1]  # bottom-up → top-down
        frames.append(bgr[:, :, ::-1].copy())  # BGR → RGB
    return frames, w, h


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def extract_video_frames(
    df: DataFrame,
    every_n: int = 1,
    binary_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL video frame sampling: decode the AVI container, keep every
    ``every_n``-th frame, emit one row per sampled frame with the
    sha256 of its P6 re-encoding (frame identity without shipping the
    pixels — the shape a dataset-curation pass wants). mapInPandas /
    Arrow-batched; the row explosion is bounded by frames÷every_n.
    Undecodable rows emit no frames (like explode(NULL))."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, shas = [], [], [], [], []
            for doc_id, data in zip(pdf[id_col], pdf[binary_col]):
                if data is None or bytes(data[:4]) != b"RIFF":
                    continue
                frames, w, h = decode_avi_frames(bytes(data))
                for i in range(0, len(frames), every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    ws.append(w)
                    hs.append(h)
                    shas.append(hashlib.sha256(encode_ppm(frames[i])).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "frame_sha256": pd.Series(shas, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(sample, VIDEO_FRAMES_SCHEMA)


AVI_FIXTURE_DIM = 4  # 4×4 RGB frames → 48 pixel bytes per frame


def make_fake_avi(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test fixture: a VALID minimal AVI per row whose 4×4 24-bit DIB
    frames tile the ASCII-stripped text bytes (48 per frame, last
    frame zero-padded; empty text → one zero frame) — the real
    container parser and frame decoder run against driver testdata and
    every frame hash is replayable from the text by a SQL oracle."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )
    d = AVI_FIXTURE_DIM
    fb = d * d * 3  # bytes per frame

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for text in pdf[text_col]:
                raw = (text or "").encode("ascii", "ignore")
                n_frames = max(1, -(-len(raw) // fb))
                raw = raw.ljust(n_frames * fb, b"\x00")
                chunks = []
                for i in range(n_frames):
                    arr = np.frombuffer(raw[i * fb : (i + 1) * fb], dtype=np.uint8)
                    rgb = arr.reshape(d, d, 3)
                    dib = rgb[::-1, :, ::-1].tobytes()  # bottom-up BGR
                    chunks.append(b"00db" + len(dib).to_bytes(4, "little") + dib)
                strf = (
                    b"strf"
                    + (40).to_bytes(4, "little")
                    + (40).to_bytes(4, "little")
                    + d.to_bytes(4, "little")
                    + d.to_bytes(4, "little")
                    + (1).to_bytes(2, "little")
                    + (24).to_bytes(2, "little")
                    + b"\x00" * 24
                )
                strl = b"LIST" + (4 + len(strf)).to_bytes(4, "little") + b"strl" + strf
                hdrl = b"LIST" + (4 + len(strl)).to_bytes(4, "little") + b"hdrl" + strl
                movi_body = b"".join(chunks)
                movi = b"LIST" + (4 + len(movi_body)).to_bytes(4, "little") + b"movi" + movi_body
                body = b"AVI " + hdrl + movi
                blobs.append(b"RIFF" + len(body).to_bytes(4, "little") + body)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "media": pd.Series(blobs, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(build, out_schema)


WAV_FIXTURE_RATE = 8000


def make_fake_wav(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test fixture: a VALID PCM-16 mono wav per row whose samples are
    an affine map of the ASCII-stripped text bytes
    (sample_i = code_i·256 − 16384; empty text → one zero sample) —
    the real wav decoder runs against driver testdata and every stat
    is replayable from the text by a SQL oracle. Built in mapInPandas
    (little-endian int16 framing is byte-level work numpy does
    exactly; this is a fixture, not a hot path)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for text in pdf[text_col]:
                codes = np.frombuffer(
                    (text or "").encode("ascii", "ignore"), dtype=np.uint8
                )
                samples = (codes.astype(np.int32) * 256 - 16384).astype("<i2")
                if samples.size == 0:
                    samples = np.zeros(1, dtype="<i2")
                pcm = samples.tobytes()
                fmt = (
                    b"fmt "
                    + (16).to_bytes(4, "little")
                    + (1).to_bytes(2, "little")  # PCM
                    + (1).to_bytes(2, "little")  # mono
                    + WAV_FIXTURE_RATE.to_bytes(4, "little")
                    + (WAV_FIXTURE_RATE * 2).to_bytes(4, "little")
                    + (2).to_bytes(2, "little")
                    + (16).to_bytes(2, "little")
                )
                datac = b"data" + len(pcm).to_bytes(4, "little") + pcm
                if len(pcm) & 1:
                    datac += b"\x00"
                body = b"WAVE" + fmt + datac
                blobs.append(b"RIFF" + len(body).to_bytes(4, "little") + body)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "media": pd.Series(blobs, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(build, out_schema)


PPM_FIXTURE_WIDTH = 16  # pixels per row → 48 pixel bytes per row


def make_fake_ppm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test fixture: a VALID P6 image per row whose pixel bytes are the
    ASCII-stripped text, zero-padded to full rows of 16 RGB pixels —
    so the REAL ppm decoder runs against driver testdata and every
    decoded stat is replayable from the text bytes by a SQL oracle.
    Built entirely JVM-side (concat/encode/rpad)."""
    row_bytes = PPM_FIXTURE_WIDTH * 3
    ascii_txt = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), r"[^\x00-\x7F]", ""
    )
    n = F.length(ascii_txt)
    h = F.greatest(F.lit(1), F.ceil(n / F.lit(row_bytes))).cast("int")
    header = F.concat(
        F.lit("P6\n16 "), h.cast("string"), F.lit("\n255\n")
    )
    padded = F.rpad(ascii_txt, h * row_bytes, "\x00")
    return df.select(
        F.col(id_col),
        F.encode(F.concat(header, padded), "UTF-8").alias("media"),
    )


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


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("phash", T.StringType(), True),
    ]
)


def perceptual_ahash(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Average-hash (aHash) perceptual image fingerprint — the
    standard near-duplicate-image key (8×8 grid, mean threshold,
    64-bit pattern; public, e.g. the pHash family write-ups):
    decode → integer grayscale (r+g+b, NO division) → nearest-
    neighbor 8×8 sample on the pixel-center grid (the resize_decoded
    map) → bit i set iff 64·gray_i > Σgray (all-integer compare, no
    float mean) → 16-hex-char hash, most-significant nibble first.

    Every step is integer arithmetic, so the hash is bit-identical
    in any engine — unlike DCT-based pHash there is no float
    transform to match. Undecodable rows get NULL. mapInPandas /
    Arrow-batched, numpy per row; grouping equal hashes afterwards
    is a plain groupBy — near-duplicates at Hamming ≤ d can reuse
    the simhash band-join machinery."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[str | None] = []
            for data in pdf[binary_col]:
                if data is None or sniff_format(data) is None:
                    out.append(None)
                    continue
                arr = decode_image(data)
                gray = arr.sum(axis=2, dtype=np.int64)  # h × w, 0..765
                sh, sw = gray.shape
                rows = ((2 * np.arange(8) + 1) * sh) // 16
                cols = ((2 * np.arange(8) + 1) * sw) // 16
                g = gray[rows][:, cols].flatten()  # row-major: i = dy*8+dx
                s = int(g.sum())
                v = 0
                for i, gi in enumerate(g):
                    if 64 * int(gi) > s:
                        v |= 1 << i
                out.append(format(v, "016x"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "phash": pd.Series(out, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, AHASH_SCHEMA)

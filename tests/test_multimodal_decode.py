"""Pure-numpy image codecs (ppm/bmp) + decoded-array operators —
golden-byte tests that prove real pixel math, not plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from kafkaconnect_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_image_stats,
    decode_ppm,
    encode_ppm,
    resize_decoded,
    sniff_format,
)


def _ppm(arr: np.ndarray) -> bytes:
    return encode_ppm(arr)


def _bmp24(arr: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER) used
    only as a test fixture — includes the 4-byte row padding and the
    bottom-up row order real files use."""
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        bgr = arr[r, :, ::-1].tobytes()
        rows.append(bgr + b"\x00" * (row_bytes - len(bgr)))
    pixel_data = b"".join(rows)
    height_field = -h if top_down else h
    header = (
        b"BM"
        + (54 + len(pixel_data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER
        + w.to_bytes(4, "little")
        + height_field.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(pixel_data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixel_data


def _rand_img(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_and_comment_header():
    img = _rand_img(5, 3)
    assert np.array_equal(decode_ppm(_ppm(img)), img)
    # header comments and multi-whitespace are legal P6
    with_comment = b"P6\n# a comment\n3  5\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)


def test_bmp_bottom_up_padding_and_bgr():
    img = _rand_img(3, 3)  # w=3 → 9 bytes/row → 3 pad bytes
    assert np.array_equal(decode_bmp(_bmp24(img)), img)
    assert np.array_equal(decode_bmp(_bmp24(img, top_down=True)), img)


def test_decode_dispatch_and_unknown_formats():
    img = _rand_img(2, 2)
    assert sniff_format(_ppm(img)) == "ppm"
    assert sniff_format(_bmp24(img)) == "bmp"
    assert sniff_format(b"\x89PNG\r\n") is None
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_decode_stats_exact_means_and_null_for_unknown(spark):
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[:, :, 0] = 10  # R plane constant
    img[0, 0, 1] = 40  # one green pixel
    df = spark.createDataFrame(
        [
            Row(doc_id=1, media=bytearray(_ppm(img))),
            Row(doc_id=2, media=bytearray(_bmp24(img))),
            Row(doc_id=3, media=bytearray(b"\x89PNG not decodable")),
            Row(doc_id=4, media=None),
        ]
    )
    out = {r.doc_id: r for r in decode_image_stats(df).collect()}
    for i, fmt in ((1, "ppm"), (2, "bmp")):
        assert out[i].format == fmt
        assert (out[i].width, out[i].height) == (2, 2)
        assert out[i].mean_r == 10.0
        assert out[i].mean_g == 10.0  # 40/4
        assert out[i].mean_b == 0.0
    for i in (3, 4):
        assert out[i].format is None and out[i].mean_r is None


def test_resize_nearest_neighbor_exact(spark):
    # 4x4 quadrant image → 2x2 must pick one pixel per quadrant
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, 2:] = 50
    img[2:, :2] = 100
    img[2:, 2:] = 200
    df = spark.createDataFrame([Row(doc_id=1, media=bytearray(_ppm(img)))])
    out = resize_decoded(df, width=2, height=2).collect()[0]
    got = decode_ppm(bytes(out.media))
    expect = np.array(
        [[[0, 0, 0], [50, 50, 50]], [[100, 100, 100], [200, 200, 200]]],
        dtype=np.uint8,
    )
    assert np.array_equal(got, expect)
    # upscale: every source pixel appears, dims exact
    up = resize_decoded(df, width=8, height=8).collect()[0]
    arr = decode_ppm(bytes(up.media))
    assert arr.shape == (8, 8, 3)
    # 2x upscale replicates each source pixel into a 2x2 block
    assert np.array_equal(arr[::2, ::2], img)
    # undecodable rows pass through as NULL
    bad = spark.createDataFrame([Row(doc_id=9, media=bytearray(b"??"))])
    assert resize_decoded(bad, 2, 2).collect()[0].media is None


def _wav16(samples: np.ndarray, rate: int = 8000, channels: int = 1,
           extra_chunk: bool = False) -> bytes:
    pcm = samples.astype("<i2").tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2 * channels).to_bytes(4, "little")
        + (2 * channels).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    # a LIST chunk before data — the decoder must skip unknown chunks
    lst = (b"LIST" + (5).to_bytes(4, "little") + b"INFOX" + b"\x00") if extra_chunk else b""
    datac = b"data" + len(pcm).to_bytes(4, "little") + pcm
    if len(pcm) & 1:
        datac += b"\x00"
    body = b"WAVE" + fmt + lst + datac
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_roundtrip_chunk_walk_and_stereo():
    from kafkaconnect_spark.operators.multimodal import decode_wav

    mono = np.array([0, 1000, -2000, 32767, -32768], dtype=np.int16)
    out, rate = decode_wav(_wav16(mono, extra_chunk=True))
    assert rate == 8000 and out.shape == (5, 1)
    assert np.array_equal(out.ravel(), mono)
    stereo = np.array([[100, -100], [200, -200]], dtype=np.int16)
    out2, _ = decode_wav(_wav16(stereo.ravel(), channels=2))
    assert out2.shape == (2, 2) and np.array_equal(out2, stereo)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI something")


def test_audio_stats_exact_and_null_for_nonwav(spark):
    from kafkaconnect_spark.operators.multimodal import audio_stats

    samples = np.array([3, -4, 0], dtype=np.int16)  # rms = sqrt(25/3)
    df = spark.createDataFrame(
        [
            Row(doc_id=1, media=bytearray(_wav16(samples))),
            Row(doc_id=2, media=bytearray(b"not audio")),
            Row(doc_id=3, media=None),
        ]
    )
    out = {r.doc_id: r for r in audio_stats(df).collect()}
    r = out[1]
    assert (r.sample_rate, r.n_frames, r.peak) == (8000, 3, 4)
    assert r.duration_ms == 3000 / 8000.0
    assert r.rms == float(np.sqrt(25.0 / 3))
    assert out[2].sample_rate is None and out[3].rms is None


# ---------------------------------------------------------------------------
# property tests: any image/audio roundtrips the codecs exactly
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 2**31 - 1)
    )
    def test_ppm_bmp_roundtrip_any_dims(h, w, seed):
        img = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        assert np.array_equal(decode_ppm(_ppm(img)), img)
        assert np.array_equal(decode_bmp(_bmp24(img)), img)
        assert np.array_equal(decode_bmp(_bmp24(img, top_down=True)), img)

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 64),
        channels=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_roundtrip_any_samples(n, channels, rate, seed):
        from kafkaconnect_spark.operators.multimodal import decode_wav

        samples = np.random.RandomState(seed).randint(
            -32768, 32768, size=n * channels, dtype=np.int32
        ).astype(np.int16)
        out, got_rate = decode_wav(_wav16(samples, rate=rate, channels=channels))
        assert got_rate == rate and out.shape == (n, channels)
        assert np.array_equal(out.ravel(), samples)


def test_avi_container_walk_and_frame_decode(spark):
    from kafkaconnect_spark.operators.multimodal import (
        decode_avi_frames,
        extract_video_frames,
        make_fake_avi,
    )

    # build via the fixture from known text: 96 ascii bytes = 2 frames
    text = "".join(chr(32 + (i % 90)) for i in range(96))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    blob = bytes(make_fake_avi(df).collect()[0].media)
    frames, w, h = decode_avi_frames(blob)
    assert (w, h, len(frames)) == (4, 4, 2)
    # frame pixels are exactly the text bytes, row-major RGB
    expect0 = np.frombuffer(text[:48].encode(), dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(frames[0], expect0)
    # sampling every 2nd frame over 5 frames → indices 0, 2, 4
    long_text = "x" * (5 * 48)
    df5 = spark.createDataFrame([Row(doc_id=2, text=long_text)])
    out = extract_video_frames(make_fake_avi(df5), every_n=2).collect()
    assert sorted(r.frame_index for r in out) == [0, 2, 4]
    assert all((r.width, r.height) == (4, 4) for r in out)
    # all-identical frames hash identically
    assert len({r.frame_sha256 for r in out}) == 1
    # non-avi rows emit no frames
    bad = spark.createDataFrame([Row(doc_id=9, media=bytearray(b"nope"))])
    assert extract_video_frames(bad).count() == 0


def test_avi_compressed_stream_raises():
    from kafkaconnect_spark.operators.multimodal import decode_avi_frames

    strf = (b"strf" + (40).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + (4).to_bytes(4, "little") + (4).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"\x00" * 24)
    dc = b"00dc" + (4).to_bytes(4, "little") + b"MJPG"
    movi = b"LIST" + (4 + len(dc)).to_bytes(4, "little") + b"movi" + dc
    body = b"AVI " + strf + movi
    data = b"RIFF" + len(body).to_bytes(4, "little") + body
    with pytest.raises(NotImplementedError):
        decode_avi_frames(data)


def test_perceptual_ahash_hand_computed(spark):
    """4x2 P6 image with a known bright/dark pattern -> hand-computed
    aHash; identical images must share a hash, inverted ones must not."""
    import numpy as np

    from kafkaconnect_spark.operators.multimodal import (
        encode_ppm,
        perceptual_ahash,
    )

    # left half bright (255), right half dark (0): 4 wide, 2 tall
    arr = np.zeros((2, 4, 3), dtype=np.uint8)
    arr[:, :2, :] = 255
    img = encode_ppm(arr)
    inv = encode_ppm(255 - arr)
    df = spark.createDataFrame(
        [(1, img), (2, img), (3, inv), (4, None)],
        "doc_id LONG, media BINARY",
    )
    got = {r.doc_id: r.phash for r in perceptual_ahash(df).collect()}
    # sample cols (2dx+1)*4//16 = 0,0,1,1,2,2,3,3 -> gray pattern per
    # row: [765]*4 + [0]*4; sum = 8*765*... mean = half -> bright
    # pixels pass 64*g > s, dark fail: bits dx<4 set in every row
    v = 0
    for i in range(64):
        if i % 8 < 4:
            v |= 1 << i
    assert got[1] == format(v, "016x")
    assert got[1] == got[2]          # identical images collide
    assert got[3] == format(v ^ (2**64 - 1), "016x")  # inverse flips every bit
    assert got[4] is None            # undecodable -> NULL


def test_perceptual_ahash_matches_python_reference_property(spark):
    """Random small images: the distributed aHash must equal a
    straight-line Python reference (same pixel-center grid, same
    integer threshold)."""
    import random

    import numpy as np

    from kafkaconnect_spark.operators.multimodal import encode_ppm, perceptual_ahash

    rng = random.Random(99)
    rows, want = [], {}
    for i in range(25):
        h = rng.randrange(1, 40)
        w = rng.randrange(1, 40)
        arr = np.array(
            [[[rng.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)],
            dtype=np.uint8,
        )
        rows.append((i, encode_ppm(arr)))
        gray = arr.sum(axis=2, dtype=np.int64)
        ys = [((2 * dy + 1) * h) // 16 for dy in range(8)]
        xs = [((2 * dx + 1) * w) // 16 for dx in range(8)]
        g = [int(gray[y][x]) for y in ys for x in xs]
        s = sum(g)
        v = 0
        for bit, gi in enumerate(g):
            if 64 * gi > s:
                v |= 1 << bit
        want[i] = format(v, "016x")
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    got = {r.doc_id: r.phash for r in perceptual_ahash(df).collect()}
    assert got == want


def test_audio_frame_features_hand_computed(spark):
    """STE/ZCR per frame against a hand-computed PCM-16 wav: 5 samples
    with known signs and squares, frame size 3 -> two frames."""
    import numpy as np

    from kafkaconnect_spark.operators.multimodal import audio_frame_features

    samples = np.array([100, -200, 300, -400, 500], dtype="<i2")
    pcm = samples.tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
        + (16000).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data = b"data" + len(pcm).to_bytes(4, "little") + pcm
    body = b"WAVE" + fmt + data
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body

    df = spark.createDataFrame([(7, bytearray(wav))], "doc_id LONG, media BINARY")
    rows = {
        r.frame_id: r
        for r in audio_frame_features(df, frame_samples=3).collect()
    }
    assert set(rows) == {0, 1}
    # frame 0: [100, -200, 300] -> 2 sign flips, energy 100²+200²+300²
    assert rows[0].n_samples == 3
    assert rows[0].energy == 100**2 + 200**2 + 300**2
    assert rows[0].n_crossings == 2
    # frame 1: [-400, 500] -> 1 flip; the 300/-400 pair straddles the
    # frame boundary and must NOT count in either frame
    assert rows[1].n_samples == 2
    assert rows[1].energy == 400**2 + 500**2
    assert rows[1].n_crossings == 1

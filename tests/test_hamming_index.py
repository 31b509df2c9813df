"""Hamming-LSH fingerprint index: the index protocol generalized to
perceptual hashes (r8 judge directive #6) — banded recall guarantee,
partition-pruned match, tombstones, compact + retention GC."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafkaconnect_spark.operators import hamming_index, index_fs
from kafkaconnect_spark.operators.dedup import release_cached


def _hashes(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, phash string")


# 64-bit hex fingerprints; 1↔2 differ in 2 bits (one nibble), 3 is far
# from everything, 4 has the TOP BIT set (signed-cast trap), 5 differs
# from 4 by 1 bit
CORPUS = [
    (1, "00ff00ff00ff00ff"),
    (3, "0123456789abcdef"),
    (4, "ffff0000ffff0000"),
]
BATCH = [
    (10, "00ff00ff00ff03ff"),  # hamming 2 from corpus 1
    (11, "fedcba9876543210"),  # far from everything
    (12, "ffff0000ffff0001"),  # hamming 1 from corpus 4 (top bit set)
]


def test_match_finds_small_hamming_pairs_and_top_bit_is_safe(spark, tmp_path):
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    res = hamming_index.match(spark, d, _hashes(spark, BATCH))
    got = {(r.id_new, r.id_corpus, r.hamming) for r in res.collect()}
    release_cached(res)
    assert got == {(10, 1, 2), (12, 4, 1)}


def test_banded_join_is_recall_exact_under_the_guarantee(spark, tmp_path):
    """Every pair with hamming < bands shares a band verbatim
    (pigeonhole) — brute force and the index agree exactly."""
    import itertools
    import random

    rng = random.Random(7)
    base = rng.getrandbits(64)
    rows = [(0, format(base, "016x"))]
    for i in range(1, 30):
        v = base
        for b in rng.sample(range(64), rng.randint(0, 9)):
            v ^= 1 << b
        rows.append((i, format(v, "016x")))
    corpus, batch = rows[:15], rows[15:]
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, corpus), d, bits=64, bands=8,
                        max_hamming=7)
    res = hamming_index.match(spark, d, _hashes(spark, batch))
    got = {(r.id_new, r.id_corpus) for r in res.collect()}
    release_cached(res)
    want = set()
    for (ib, hb), (ic, hc) in itertools.product(batch, corpus):
        if bin(int(hb, 16) ^ int(hc, 16)).count("1") <= 7:
            want.add((ib, ic))
    assert got == want


def test_match_scan_is_band_bucket_pruned(spark, tmp_path):
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    assert index_fs.partition_subdirs(os.path.join(d, "bands", "v1"))
    res = hamming_index.match(spark, d, _hashes(spark, BATCH[:1]))
    plan = res._jdf.queryExecution().executedPlan().toString()
    release_cached(res)
    assert "band_bucket" in plan  # partition filter reached the scan


def test_lifecycle_delete_compact_gc_add(spark, tmp_path):
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    # tombstoned ids stop matching immediately
    hamming_index.delete(spark, d, [1])
    res = hamming_index.match(spark, d, _hashes(spark, BATCH))
    got = {(r.id_new, r.id_corpus) for r in res.collect()}
    release_cached(res)
    assert got == {(12, 4)}
    # compact with keep=0: erased bytes physically gone
    info = hamming_index.compact(spark, d, keep_generations=0)
    assert info["version"] == 2 and info["oldest_retained"] == 2
    for t in ("hashes", "bands", "tombstones"):
        assert sorted(os.listdir(os.path.join(d, t))) == ["v2"]
    ids = {
        r[0]
        for r in spark.read.parquet(os.path.join(d, "hashes", "v2"))
        .select("doc_id")
        .collect()
    }
    assert ids == {3, 4}
    # the erased id re-enters as a stranger post-compact
    hamming_index.add(spark, d, _hashes(spark, [CORPUS[0]]))
    res2 = hamming_index.match(spark, d, _hashes(spark, BATCH))
    got2 = {(r.id_new, r.id_corpus) for r in res2.collect()}
    release_cached(res2)
    assert got2 == {(10, 1), (12, 4)}


def test_geometry_is_manifest_enforced(spark, tmp_path):
    with pytest.raises(ValueError, match="recall"):
        hamming_index.build(
            _hashes(spark, CORPUS), str(tmp_path / "a"), bands=4, max_hamming=4
        )
    with pytest.raises(ValueError, match="hex-aligned"):
        hamming_index.build(
            _hashes(spark, CORPUS), str(tmp_path / "b"), bits=64, bands=32,
            max_hamming=2,
        )
    d = str(tmp_path / "c")
    hamming_index.build(_hashes(spark, CORPUS), d, bands=8, max_hamming=4)
    with pytest.raises(ValueError, match="recall"):
        hamming_index.match(spark, d, _hashes(spark, BATCH), max_hamming=9)


def test_exclude_ids_removes_corpus_side(spark, tmp_path):
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    res = hamming_index.match(
        spark, d, _hashes(spark, BATCH),
        exclude_ids=spark.createDataFrame([(1,)], "doc_id long"),
    )
    got = {(r.id_new, r.id_corpus) for r in res.collect()}
    release_cached(res)
    assert got == {(12, 4)}


# ---------------------------------------------------------------------------
# r10 hot-band-value routing: corpus-correlated fingerprints must not
# blow the banded join into n² candidates — hot values take an exact
# distinct-hash verify, and the match refuses past the skew line
# ---------------------------------------------------------------------------


def _skewed_corpus(n=60):
    """Template-corpus shape: many docs share full hashes (and hence
    every band value), a few are spread. Hot values arise both from
    repeated hashes and from distinct hashes agreeing on a band."""
    rows = []
    for i in range(n):
        if i % 3 == 0:
            h = "00ff00ff00ff00ff"          # repeated hash (hot bands)
        elif i % 3 == 1:
            h = f"00ff00ff00ff{i:02x}ff"[:16]  # shares 5 hot bands
        else:
            h = format((i * 0x9E3779B97F4A7C15) % (1 << 64), "016x")
        rows.append((i, h))
    return rows


def _brute_pairs(batch, corpus, mh):
    return {
        (ib, ic, bin(int(hb, 16) ^ int(hc, 16)).count("1"))
        for ib, hb in batch
        for ic, hc in corpus
        if ib != ic and bin(int(hb, 16) ^ int(hc, 16)).count("1") <= mh
    }


def test_hot_routing_is_exact_vs_brute_force(spark, tmp_path):
    """Forced routing (hot_df_cap=2 → most values hot) and the pure
    equi-join plan (hot_df_cap=None) must both equal brute force —
    routing is a performance decision, never a semantic one."""
    rows = _skewed_corpus()
    corpus = [r for r in rows if r[0] % 10 != 0]
    batch = [r for r in rows if r[0] % 10 == 0]
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, corpus), d, bits=64, bands=8,
                        max_hamming=4)
    want = _brute_pairs(batch, corpus, 4)
    # hot_route_min_pairs=0 FORCES the routed (distinct-hash, salted)
    # path whenever a value is hot; the default route line leaves this
    # gate-scale hot mass in the single equi-join plan; None disables
    # the guard — all three must equal brute force
    for kw in (
        {"hot_df_cap": 2, "hot_route_min_pairs": 0},
        {"hot_df_cap": 2},
        {"hot_df_cap": None},
    ):
        res = hamming_index.match(spark, d, _hashes(spark, batch), **kw)
        got = {(r.id_new, r.id_corpus, r.hamming) for r in res.collect()}
        release_cached(res)
        assert got == want, f"{kw}"
    assert want  # the fixture must actually exercise pairs


def test_hot_routing_pairs_found_only_via_hot_values(spark, tmp_path):
    """A pair whose EVERY shared band value is hot must still be
    found (the exactness clause the shingle df-cap cannot offer):
    two identical hashes shared by many corpus docs."""
    h = "a5a5a5a5a5a5a5a5"
    corpus = [(i, h) for i in range(1, 20)]   # df=19 per band value
    batch = [(100, h)]
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, corpus), d, bits=64, bands=8,
                        max_hamming=4)
    res = hamming_index.match(
        spark, d, _hashes(spark, batch), hot_df_cap=4, hot_route_min_pairs=0
    )
    got = {(r.id_new, r.id_corpus, r.hamming) for r in res.collect()}
    release_cached(res)
    assert got == {(100, i, 0) for i in range(1, 20)}


def test_match_refuses_past_the_skew_line(spark, tmp_path):
    rows = _skewed_corpus()
    corpus = [r for r in rows if r[0] % 10 != 0]
    batch = [r for r in rows if r[0] % 10 == 0]
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, corpus), d, bits=64, bands=8,
                        max_hamming=4)
    with pytest.raises(ValueError, match="MinHash"):
        hamming_index.match(
            spark, d, _hashes(spark, batch), hot_df_cap=2, max_hot_pairs=1,
            hot_route_min_pairs=0,
        )


def test_build_records_band_skew_in_manifest(spark, tmp_path):
    d = str(tmp_path / "ham")
    hamming_index.build(
        _hashes(spark, [(i, "a5a5a5a5a5a5a5a5") for i in range(5)]), d,
        bits=64, bands=8, max_hamming=4,
    )
    skew = hamming_index._read_manifest(d)["band_skew"]
    assert skew["max_df"] == 5 and skew["n_hot_values"] == 0


def test_driver_side_banding_equals_cluster_plan(spark, tmp_path, monkeypatch):
    """r11: match() replays the banding/bucket/histogram math driver-
    side for a bounded well-formed batch (guide §8). Forcing the
    cluster plan back on (inline refused) must yield the identical
    result — the collected batch changes where the hit set and skew
    histogram are computed, never what joins or verifies."""
    rows = _skewed_corpus()
    corpus = [r for r in rows if r[0] % 10 != 0]
    batch = [r for r in rows if r[0] % 10 == 0]
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, corpus), d, bits=64, bands=8,
                        max_hamming=4)
    want = _brute_pairs(batch, corpus, 4)
    for kw in ({}, {"hot_df_cap": 2, "hot_route_min_pairs": 0}):
        res = hamming_index.match(spark, d, _hashes(spark, batch), **kw)
        driver_side = {(r.id_new, r.id_corpus, r.hamming) for r in res.collect()}
        release_cached(res)
        monkeypatch.setattr(hamming_index, "inline_rows", lambda *a, **k: None)
        res2 = hamming_index.match(spark, d, _hashes(spark, batch), **kw)
        cluster_side = {(r.id_new, r.id_corpus, r.hamming) for r in res2.collect()}
        release_cached(res2)
        monkeypatch.undo()
        assert driver_side == cluster_side == want, f"{kw}"


def test_empty_batch_matches_nothing(spark, tmp_path):
    """A zero-row micro-batch (routine for streaming; also reached via
    precollected_rows=[]) must return an empty result, not raise on an
    empty inline predicate (r11 ADVICE: pred='' → ParseException)."""
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    empty = spark.createDataFrame([], "doc_id long, phash string")
    res = hamming_index.match(spark, d, empty)
    assert res.collect() == []
    release_cached(res)
    res2 = hamming_index.match(spark, d, empty, precollected_rows=[])
    assert res2.collect() == []
    release_cached(res2)


def test_wide_band_geometry_keeps_the_cluster_plan(spark, tmp_path,
                                                   monkeypatch):
    """npb > 4 (e.g. bits=64 / bands=2): the driver-side bucket replay
    int(bv,16) % n diverges from _band_bucket_expr's conv→cast('int')
    for band values ≥ 2^31 — match() must not engage the inline path
    at all (r11 ADVICE), and must still match correctly through the
    cluster plan."""
    calls = []
    orig = hamming_index.inline_rows
    monkeypatch.setattr(
        hamming_index, "inline_rows",
        lambda *a, **k: calls.append(1) or orig(*a, **k),
    )
    # every 8-nibble band value kept under 2^31 (leading nibble ≤ 7):
    # ANSI cast raises outright on wider values, so such hashes cannot
    # even be indexed — the divergence the gate closes is the driver
    # replay consulting buckets the cluster expression cannot compute
    corpus = [(1, "00ff00ff00ff00ff"), (2, "7123456712345678")]
    batch = [(10, "00ff00ff00ff00fe")]  # hamming 1 from corpus 1
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, corpus), d, bits=64, bands=2,
                        max_hamming=1)
    res = hamming_index.match(spark, d, _hashes(spark, batch))
    got = {(r.id_new, r.id_corpus, r.hamming) for r in res.collect()}
    release_cached(res)
    assert got == {(10, 1, 1)}
    assert not calls  # the driver-side replay never engaged


def test_malformed_batch_hashes_keep_the_cluster_plan(spark, tmp_path):
    """A batch carrying a NULL or wrong-width hash must fall back to
    the cluster plan (driver-side substring/conv replication is only
    proven for exact-width hex) and still match correctly on its
    well-formed rows."""
    corpus = [(1, "00ff00ff00ff00ff"), (2, "a5a5a5a5a5a5a5a5")]
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, corpus), d, bits=64, bands=8,
                        max_hamming=4)
    batch = spark.createDataFrame(
        [(10, "00ff00ff00ff00ff"), (11, None), (12, "beef")],
        "doc_id long, phash string",
    )
    res = hamming_index.match(spark, d, batch)
    got = {(r.id_new, r.id_corpus, r.hamming) for r in res.collect()}
    release_cached(res)
    assert got == {(10, 1, 0)}

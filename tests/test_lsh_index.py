"""Persistent LSH index lifecycle (operators/lsh_index.py): append
matches the pre-append generation only, compaction preserves content
while collapsing files, and the manifest pins generations."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafkaconnect_spark.operators import lsh_index


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = [
    (1, "a b c d e f g h"),
    (2, "a b c d e f g x"),   # near-dup of 1
    (3, "p q r s t u v w"),
]
BATCH1 = [
    (10, "a b c d e f g h"),  # exact dup of 1
    (11, "m n o p q r s t"),  # overlaps 3 partially
]
BATCH2 = [
    (20, "m n o p q r s t"),  # exact dup of 11 — only matches via the APPEND
    (21, "zz yy xx ww vv uu"),
]


@pytest.fixture()
def index(spark, tmp_path):
    d = str(tmp_path / "idx")
    lsh_index.build(_docs(spark, BASE), d, num_hashes=16, bands=4)
    return d


def test_append_matches_only_preappend_state(spark, index):
    p1 = lsh_index.append(spark, index, _docs(spark, BATCH1), threshold=0.5)
    got1 = {(r.id_new, r.id_corpus) for r in p1.collect()}
    assert (10, 1) in got1
    # batch1 members never pair with each other or themselves
    assert all(c in {1, 2, 3} for _, c in got1)

    p2 = lsh_index.append(spark, index, _docs(spark, BATCH2), threshold=0.5)
    got2 = {(r.id_new, r.id_corpus) for r in p2.collect()}
    # 20 duplicates 11, which entered the index via batch1's append
    assert (20, 11) in got2
    assert all(c in {1, 2, 3, 10, 11} for _, c in got2)
    # the report is durable: re-collect after further writes
    lsh_index.compact(spark, index)
    assert {(r.id_new, r.id_corpus) for r in p1.collect()} == got1


def test_compact_preserves_content_and_collapses_files(spark, index):
    lsh_index.append(spark, index, _docs(spark, BATCH1), threshold=0.5)
    lsh_index.append(spark, index, _docs(spark, BATCH2), threshold=0.5)
    sh_before, bands_before, m = lsh_index._tables(spark, index)
    v = m["version"]
    docs_before = {r[0] for r in sh_before.select("doc_id").collect()}
    band_rows_before = bands_before.distinct().count()
    stats = lsh_index.compact(spark, index)
    assert stats["version"] == v + 1
    assert stats["n_docs"] == len(docs_before) == 7
    assert stats["n_band_rows"] == band_rows_before
    sh_after, _, m_after = lsh_index._tables(spark, index)
    assert m_after["version"] == v + 1
    assert {r[0] for r in sh_after.select("doc_id").collect()} == docs_before
    # old generation stays on disk for pinned readers
    assert os.path.isdir(lsh_index._table_path(index, "bands", v))
    with open(os.path.join(index, "MANIFEST.json")) as fh:
        assert json.load(fh)["version"] == v + 1


def test_append_after_compact_uses_new_generation(spark, index):
    lsh_index.compact(spark, index)
    p = lsh_index.append(spark, index, _docs(spark, BATCH1), threshold=0.5)
    assert (10, 1) in {(r.id_new, r.id_corpus) for r in p.collect()}


def test_build_refuses_overwrite(spark, index):
    with pytest.raises(Exception):
        lsh_index.build(_docs(spark, BASE), index)


def test_manifest_pins_banding_params(spark, index):
    """An append/match with banding params that differ from what
    build() used must raise, not silently sign in a different hash
    space (r5 ADVICE); omitted params resolve from the manifest."""
    with open(os.path.join(index, "MANIFEST.json")) as fh:
        m = json.load(fh)
    assert (m["num_hashes"], m["bands"], m["n"]) == (16, 4, 3)
    with pytest.raises(ValueError, match="manifest"):
        lsh_index.append(spark, index, _docs(spark, BATCH1), bands=8)
    with pytest.raises(ValueError, match="manifest"):
        lsh_index.match(spark, index, _docs(spark, BATCH1), num_hashes=32)
    # matching explicit params and manifest-default params both work
    p = lsh_index.match(
        spark, index, _docs(spark, BATCH1), threshold=0.5, num_hashes=16, bands=4
    )
    assert (10, 1) in {(r.id_new, r.id_corpus) for r in p.collect()}


def test_match_is_read_only(spark, index):
    before = sorted(os.listdir(lsh_index._table_path(index, "shingles", 1)))
    p = lsh_index.match(spark, index, _docs(spark, BATCH1), threshold=0.5)
    assert (10, 1) in {(r.id_new, r.id_corpus) for r in p.collect()}
    assert sorted(os.listdir(lsh_index._table_path(index, "shingles", 1))) == before
    assert not os.path.exists(os.path.join(index, "reports"))


def test_delete_suppresses_matches_then_compact_drops_rows(spark, index):
    # doc 1 is BATCH1 doc 10's duplicate; tombstone it
    assert lsh_index.delete(spark, index, [1]) == 1
    # idempotent: re-deleting the same id adds nothing
    assert lsh_index.delete(spark, index, [1]) == 0
    p = lsh_index.append(spark, index, _docs(spark, BATCH1), threshold=0.5)
    got = {(r.id_new, r.id_corpus) for r in p.collect()}
    assert not any(c == 1 for _, c in got)  # deleted id stops matching NOW
    # other ids still match: 10 is also a near-dup of 2 at 0.5 (7/9)
    assert (10, 2) in got
    stats = lsh_index.compact(spark, index)
    assert stats["n_tombstones_dropped"] == 1
    sh, bands, m = lsh_index._tables(spark, index)
    assert 1 not in {r[0] for r in sh.select("doc_id").collect()}
    assert 1 not in {r[0] for r in bands.select("doc_id").collect()}
    # tombstone log cleared — erasure is physical in the new generation
    assert (
        lsh_index._tombstones(spark, index, m["version"]).count() == 0
    )
    # post-compact, a fresh append can legitimately re-add the id
    p2 = lsh_index.append(
        spark, index, _docs(spark, [(1, "a b c d e f g h")]), threshold=0.5
    )
    assert (1, 10) in {(r.id_new, r.id_corpus) for r in p2.collect()}


def test_compact_recovers_from_interrupted_predecessor(spark, index):
    """A stale unreferenced v2 dir (crash between table write and
    manifest commit) must not wedge compaction forever."""
    stale = lsh_index._table_path(index, "shingles", 2)
    os.makedirs(stale)
    open(os.path.join(stale, "part-orphan.parquet"), "w").close()
    stats = lsh_index.compact(spark, index)
    assert stats["version"] == 2
    sh, _, _ = lsh_index._tables(spark, index)
    assert {r[0] for r in sh.select("doc_id").collect()} == {1, 2, 3}


def test_degree_distribution_buckets(spark):
    """length(bin(d)) - 1 is exact at powers of two (the float-log2
    edge the query avoids)."""
    df = spark.createDataFrame(
        [(d,) for d in (1, 2, 3, 4, 7, 8, 1024)], "d long"
    )
    got = {
        r.d: r.k
        for r in df.select(
            "d", (F.length(F.bin(F.col("d"))) - 1).cast("int").alias("k")
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 7: 2, 8: 3, 1024: 10}


def test_writer_lock_excludes_second_writer(spark, index):
    """append/delete/compact are single-writer (r6 ADVICE): a held
    lock makes any concurrent mutation raise instead of silently
    losing its work at the next compact."""
    with lsh_index._writer_lock(index):
        with pytest.raises(lsh_index.IndexWriterLockError, match="single-writer"):
            lsh_index.delete(spark, index, [1])
        with pytest.raises(lsh_index.IndexWriterLockError):
            lsh_index.append(spark, index, _docs(spark, BATCH1))
        with pytest.raises(lsh_index.IndexWriterLockError):
            lsh_index.compact(spark, index)
    # released on exit: mutations work again
    assert lsh_index.delete(spark, index, [3]) == 1


def test_writer_lock_sweeps_stale_staging(spark, index):
    stale = os.path.join(index, ".staging", "deadbeef")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-junk.parquet"), "w") as fh:
        fh.write("x")
    lsh_index.append(spark, index, _docs(spark, BATCH1), threshold=0.5)
    # an interrupted writer's orphaned staging dir is gone, and the
    # append's own staging left nothing behind
    staging_root = os.path.join(index, ".staging")
    assert not os.path.isdir(stale)
    assert not os.path.isdir(staging_root) or not os.listdir(staging_root)


def test_compact_carries_forward_late_tombstones(spark, index):
    """A tombstone written after compact's snapshot (lock bypassed —
    simulated via the post-snapshot test seam) survives into the v+1
    log instead of being cleared wholesale: the GDPR erasure stays
    suppressed."""
    import shutil as _sh

    lsh_index.delete(spark, index, [2])  # applied by the compact below
    v = lsh_index._read_manifest(index)["version"]
    tomb_dir = lsh_index._table_path(index, "tombstones", v)

    def late_delete():
        # a late delete() lands after compact's snapshot: write a
        # tombstone part file for doc 3 directly (the real delete()
        # would block on the lock)
        late = spark.createDataFrame([(3,)], "doc_id long")
        tmp = os.path.join(index, "__late")
        late.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                _sh.move(os.path.join(tmp, f), os.path.join(tomb_dir, "late-" + f))
        _sh.rmtree(tmp)

    try:
        lsh_index._POST_SNAPSHOT_HOOK = late_delete
        res = lsh_index.compact(spark, index)
    finally:
        lsh_index._POST_SNAPSHOT_HOOK = None
    assert res["n_tombstones_dropped"] == 1  # doc 2 (the snapshot)
    # doc 2 physically gone, doc 3's late tombstone carried forward
    sh_new, _, m = lsh_index._tables(spark, index)
    assert m["version"] == v + 1
    ids = {r.doc_id for r in sh_new.select("doc_id").collect()}
    assert 2 not in ids and 3 in ids  # 3 compacts later, suppressed now
    carried = {
        r.doc_id
        for r in lsh_index._tombstones(spark, index, v + 1).collect()
    }
    assert carried == {3}
    # and the suppression is live: a near-dup of 3 must not match it
    pairs = lsh_index.match(
        spark, index, _docs(spark, [(30, "p q r s t u v w")]), threshold=0.5
    )
    assert all(r.id_corpus != 3 for r in pairs.collect())


def test_append_shingles_batch_exactly_once(spark, index, monkeypatch):
    """append writes its index deltas from match's live batch-shingle
    cache — one shingle_arrays call per append (r6 ADVICE), not two."""
    calls: list[int] = []
    orig = lsh_index.shingle_arrays

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(lsh_index, "shingle_arrays", counted)
    lsh_index.append(spark, index, _docs(spark, BATCH1), threshold=0.5)
    assert len(calls) == 1

"""FingerprintDedupIndex SMT — the third streaming×index fusion
(hamming_index.streaming_fingerprint_dedup_transform): within-batch
winner rule, corpus drops, replay convergence, SimHash derivation
mode, registry wiring."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkaconnect_spark.operators import hamming_index, index_fs


def _hashes(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, phash string")


def _records(spark, rows):
    return _hashes(spark, rows).select(F.struct("doc_id", "phash").alias("value"))


CORPUS = [
    (1, "00ff00ff00ff00ff"),
    (3, "0123456789abcdef"),
]
# 10: hamming 2 from corpus doc 1 -> corpus drop
# 20/21: same-batch near-dup pair (hamming 1), both fresh -> 21 drops
# 30: stranger -> survives
BATCH = [
    (10, "00ff00ff00ff03ff"),
    (20, "f0f0f0f0f0f0f0f0"),
    (21, "f0f0f0f0f0f0f0f1"),
    (30, "fedcba9876543210"),
]


def _stored_ids(spark, d):
    m = hamming_index._read_manifest(d)
    return {
        r.doc_id
        for r in spark.read.parquet(
            hamming_index._table_path(d, "hashes", m["version"])
        )
        .select("doc_id")
        .distinct()
        .collect()
    }


def test_within_batch_winner_rule_and_corpus_drop(spark, tmp_path):
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    t = hamming_index.streaming_fingerprint_dedup_transform(
        d, hash_field="phash"
    )
    surv = {r["value"]["doc_id"] for r in t(_records(spark, BATCH)).collect()}
    # 10 drops (corpus dup of 1), 21 drops (same-batch mate of 20,
    # higher id), 20 and 30 survive and enter the index
    assert surv == {20, 30}
    assert _stored_ids(spark, d) == {1, 3, 20, 30}
    # report rows name both drop kinds
    reports = [
        os.path.join(d, "reports", r)
        for r in index_fs.listdir(os.path.join(d, "reports"))
    ]
    rows = {
        (r.id_new, r.id_corpus, r.hamming)
        for r in spark.read.parquet(*reports).collect()
    }
    assert (10, 1, 2) in rows
    assert (21, 20, 1) in rows


def test_replay_converges_byte_identically(spark, tmp_path):
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    t = hamming_index.streaming_fingerprint_dedup_transform(
        d, hash_field="phash"
    )
    t(_records(spark, BATCH)).collect()
    files_after_run1 = sorted(
        index_fs.parquet_files(
            hamming_index._table_path(d, "hashes", 1)
        )
    )
    surv2 = {
        r["value"]["doc_id"] for r in t(_records(spark, BATCH)).collect()
    }
    # replay: 20/30 are now the INDEXED mates — 10 still drops (corpus),
    # 21 drops to its indexed mate 20, the redelivered survivors pass
    # through and are NOT re-appended
    assert surv2 == {20, 30}
    assert _stored_ids(spark, d) == {1, 3, 20, 30}
    assert (
        sorted(
            index_fs.parquet_files(hamming_index._table_path(d, "hashes", 1))
        )
        == files_after_run1
    )


def test_text_field_mode_derives_simhash(spark, tmp_path):
    from kafkaconnect_spark.operators.dedup import simhash_hex64

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "zz yy xx ww vv uu")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "ham")
    hamming_index.build(
        simhash_hex64(docs).withColumnRenamed("simhash_hex", "phash"),
        d, bits=64, bands=8, max_hamming=4,
    )
    t = hamming_index.streaming_fingerprint_dedup_transform(
        d, text_field="text"
    )
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
         (11, "totally different words here friend")],
        "doc_id long, text string",
    ).select(F.struct("doc_id", "text").alias("value"))
    surv = {r["value"]["doc_id"] for r in t(batch).collect()}
    assert surv == {11}
    assert _stored_ids(spark, d) == {1, 2, 11}


def test_registry_builds_and_validates(spark):
    import pytest

    from kafkaconnect_spark.operators.transforms import TRANSFORM_REGISTRY
    from kafkaconnect_spark.plans.spec import SpecError

    build = TRANSFORM_REGISTRY["FingerprintDedupIndex"]
    with pytest.raises(SpecError):
        build({"hash.field": "phash"})  # no index.dir
    with pytest.raises(SpecError):
        build({"index.dir": "/x"})  # neither hash nor text field
    with pytest.raises(SpecError):
        build({"index.dir": "/x", "hash.field": "a", "text.field": "b"})
    assert callable(build({"index.dir": "/x", "hash.field": "phash"}))


def test_null_and_wrong_width_hashes_never_enter_the_index(spark, tmp_path):
    """r9 ADVICE #2: a NULL or wrong-width fingerprint can never
    band-match, so it must pass through as a survivor WITHOUT being
    appended (a null band_val would land in the hive default
    partition and pollute membership counts)."""
    d = str(tmp_path / "ham")
    hamming_index.build(_hashes(spark, CORPUS), d, bits=64, bands=8,
                        max_hamming=4)
    t = hamming_index.streaming_fingerprint_dedup_transform(
        d, hash_field="phash"
    )
    bad = [(50, None), (51, "abcd"), (52, "fedcba9876543210")]
    surv = {r["value"]["doc_id"] for r in t(_records(spark, bad)).collect()}
    assert surv == {50, 51, 52}       # malformed rows still flow through
    assert _stored_ids(spark, d) == {1, 3, 52}  # but never enter the index


def test_text_mode_requires_a_64_bit_index(spark, tmp_path):
    """r9 ADVICE #1: simhash_hex64 emits 16 nibbles — against an index
    built at another width the SMT must refuse instead of silently
    no-op matching and appending mixed-width hashes."""
    import pytest

    d = str(tmp_path / "ham32")
    hamming_index.build(
        spark.createDataFrame([(1, "00ff00ff")], "doc_id long, phash string"),
        d, bits=32, bands=4, max_hamming=2,
    )
    t = hamming_index.streaming_fingerprint_dedup_transform(
        d, text_field="text"
    )
    recs = spark.createDataFrame(
        [(2, "some text here")], "doc_id long, text string"
    ).select(F.struct("doc_id", "text").alias("value"))
    with pytest.raises(ValueError, match="bits=32"):
        t(recs)

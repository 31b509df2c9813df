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


# ---------------------------------------------------------------------------
# r11: refusal fallback — the escape hatch the refusal message names,
# made executable (spec key fallback.index=minhash)
# ---------------------------------------------------------------------------

# standing corpus / batch for the fallback tests: duplicate pairs use
# IDENTICAL texts (jaccard 1.0 → minhash band collision is certain,
# no S-curve luck in a unit test)
_FB_STANDING = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten"),
]
_FB_BATCH = [
    (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
    (20, "red orange yellow green blue indigo violet pink black white"),
    (21, "red orange yellow green blue indigo violet pink black white"),  # dup of 20
    (30, "completely unrelated words nobody else ever used anywhere at all"),
]


def _fb_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fb_records(spark, rows):
    return _fb_docs(spark, rows).select(
        F.struct("doc_id", "text").alias("value")
    )


def _fb_indexes(spark, tmp_path, tag=""):
    from kafkaconnect_spark.operators import lsh_index
    from kafkaconnect_spark.operators.dedup import simhash_hex64

    standing = _fb_docs(spark, _FB_STANDING)
    dh = str(tmp_path / f"ham{tag}")
    hamming_index.build(
        simhash_hex64(standing).withColumnRenamed("simhash_hex", "phash"),
        dh, bits=64, bands=8, max_hamming=4,
    )
    dl = str(tmp_path / f"lsh{tag}")
    lsh_index.build(standing, dl, num_hashes=16, bands=4, n=3, threshold=0.2)
    return dh, dl


def _lsh_state(spark, dl):
    from kafkaconnect_spark.operators import lsh_index

    m = lsh_index._read_manifest(dl)
    members = {
        r.doc_id
        for r in spark.read.parquet(
            lsh_index._table_path(dl, "shingles", m["version"])
        ).select("doc_id").distinct().collect()
    }
    pairs = set()
    for rep in index_fs.listdir(os.path.join(dl, "reports")):
        pairs |= {
            (r.id_new, r.id_corpus)
            for r in spark.read.parquet(
                os.path.join(dl, "reports", rep)
            ).collect()
        }
    return members, pairs


def test_fallback_reroutes_refused_batch_and_matches_lsh_only(
    spark, tmp_path
):
    """max_hot_pairs=-1 makes the WITHIN-BATCH guard refuse
    unconditionally (any volume, even zero, exceeds the line); the
    rerouted batch's survivors, drop report, and index appends must
    equal running the MinHash SMT directly on a twin index — and the
    refused hamming index must be left byte-untouched."""
    import pytest

    from kafkaconnect_spark.operators import lsh_index

    dh, dl = _fb_indexes(spark, tmp_path)
    _, dl_ref = _fb_indexes(spark, tmp_path, tag="_ref")

    t = hamming_index.streaming_fingerprint_dedup_transform(
        dh, text_field="text", max_hot_pairs=-1, fallback_index_dir=dl
    )
    with pytest.warns(UserWarning, match="MinHash fallback"):
        surv = {
            r["value"]["doc_id"]
            for r in t(_fb_records(spark, _FB_BATCH)).collect()
        }
    ref = lsh_index.streaming_dedup_transform(dl_ref)
    surv_ref = {
        r["value"]["doc_id"]
        for r in ref(_fb_records(spark, _FB_BATCH)).collect()
    }
    assert surv == surv_ref == {20, 30}  # 10 corpus-dups 1; 21 loses to 20
    assert _lsh_state(spark, dl) == _lsh_state(spark, dl_ref)
    # the refused fingerprint index: no appends, no reports
    assert _stored_ids(spark, dh) == {1, 2}
    assert not os.path.exists(os.path.join(dh, "reports")) or not (
        index_fs.listdir(os.path.join(dh, "reports"))
    )


def test_fallback_fires_from_the_corpus_match_refusal_site(spark, tmp_path):
    """A single-record batch has zero within-batch collision volume
    (Σ n·(n−1) = 0), so with max_hot_pairs=0 the refusal can only
    come from match()'s hot-pair line — the original r10 refusal
    site. The rerouted answer must still be the MinHash one."""
    import pytest

    dh, dl = _fb_indexes(spark, tmp_path)
    t = hamming_index.streaming_fingerprint_dedup_transform(
        dh, text_field="text", hot_df_cap=0, hot_route_min_pairs=0,
        max_hot_pairs=0, fallback_index_dir=dl,
    )
    one = [(10, _FB_STANDING[0][1])]  # exact dup of standing doc 1
    with pytest.warns(UserWarning, match="MinHash fallback"):
        surv = {
            r["value"]["doc_id"]
            for r in t(_fb_records(spark, one)).collect()
        }
    assert surv == set()  # dropped as a corpus dup via the fallback
    members, pairs = _lsh_state(spark, dl)
    assert (10, 1) in pairs and 10 not in members
    assert _stored_ids(spark, dh) == {1, 2}


def test_refusal_without_fallback_still_raises(spark, tmp_path):
    import pytest

    dh, _dl = _fb_indexes(spark, tmp_path)
    t = hamming_index.streaming_fingerprint_dedup_transform(
        dh, text_field="text", max_hot_pairs=-1
    )
    with pytest.raises(hamming_index.HotPairRefusalError, match="MinHash"):
        t(_fb_records(spark, _FB_BATCH))


def test_fallback_requires_text_mode(spark):
    import pytest

    with pytest.raises(ValueError, match="text.field mode"):
        hamming_index.streaming_fingerprint_dedup_transform(
            "/x", hash_field="phash", fallback_index_dir="/y"
        )


def test_fallback_spec_keys_build_and_validate(spark):
    import pytest

    from kafkaconnect_spark.operators.transforms import TRANSFORM_REGISTRY
    from kafkaconnect_spark.plans.spec import SpecError

    build = TRANSFORM_REGISTRY["FingerprintDedupIndex"]
    assert callable(
        build({
            "index.dir": "/x", "text.field": "text",
            "fallback.index": "minhash", "fallback.index.dir": "/y",
            "max.hot.pairs": "0", "hot.df.cap": "0",
            "hot.route.min.pairs": "0",
        })
    )
    with pytest.raises(SpecError, match="unsupported"):
        build({"index.dir": "/x", "text.field": "text",
               "fallback.index": "faiss", "fallback.index.dir": "/y"})
    with pytest.raises(SpecError, match="fallback.index.dir"):
        build({"index.dir": "/x", "text.field": "text",
               "fallback.index": "minhash"})

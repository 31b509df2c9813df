"""Round-6 batch-3 operators: estimator/banding audits, neighbor
similarity, int8 recall, survivorship bias, filter sweeps, bot
screening, blob/chunk dedup, KMV k sweep, fertility, PQ distortion.
Catalog-level value equality vs DuckDB is the driver's gate; these
pin the SEMANTIC invariants the value hash can't express
(monotonicity, cross-operator consistency, hand-checkable cases)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_band_sweep_monotone(spark):
    """More bands ⇒ more candidates and ≥ recall (the S-curve's only
    a-priori guarantees); precision/recall stay in [0, 1]."""
    from kafkaconnect_spark.queries_r6b import dedup_band_sweep

    rows = {r.bands: r for r in dedup_band_sweep(spark, SF).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].n_candidates <= rows[2].n_candidates <= rows[4].n_candidates
    assert rows[1].recall <= rows[2].recall <= rows[4].recall
    for r in rows.values():
        assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.precision <= 1.0
        assert r.rows_per_band * r.bands == 16


def test_minhash_estimate_exact_for_identical_docs(spark):
    """Identical docs agree on every signature component: est = 1,
    exact Jaccard = 1, error = 0 — the estimator's fixed point."""
    from kafkaconnect_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    sharr = dedup.shingle_arrays(docs)
    sigs = dedup._signatures_from_arrays(sharr, 16, "doc_id")
    got = {r.doc_id: r.sig for r in sigs.collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_estimate_error_bounded(spark):
    """16-hash estimator: per-bucket mean |err| within the loose
    4-sigma envelope of the binomial SE (sqrt(.25/16) = .125)."""
    from kafkaconnect_spark.queries_r6b import dedup_minhash_estimate_error

    rows = dedup_minhash_estimate_error(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0.0 <= r.mean_abs_err <= 0.5
        assert r.mean_abs_err <= r.max_abs_err <= 1.0


def test_neighbor_jaccard_bounds(spark):
    from kafkaconnect_spark.queries_r6b import parts_neighbor_jaccard

    rows = parts_neighbor_jaccard(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.common_neighbors <= min(r.deg_a, r.deg_b)
        assert 0.0 < r.jaccard <= 1.0


def test_int8_recall_reasonable(spark):
    """Symmetric int8 on 64-dim unit-scale embeddings is mild: top-10
    recall should stay high (and is deterministic on the fixed SF)."""
    from kafkaconnect_spark.queries_r6b import embedding_int8_recall_audit

    rows = embedding_int8_recall_audit(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert r.n_overlap == round(r.recall_at_10 * 10)
    assert sum(r.recall_at_10 for r in rows) / len(rows) >= 0.8


def test_removal_bias_reconciles_with_exact_dedup(spark):
    """Σ n_removed across sources == corpus docs − distinct
    fingerprints (the keep-policy removes exactly one doc per
    duplicate beyond each group's keeper)."""
    from kafkaconnect_spark.functions import text as TX
    from kafkaconnect_spark.queries_r6b import docs_dedup_removal_bias
    from kafkaconnect_spark.query_base import _t

    rows = docs_dedup_removal_bias(spark, SF).collect()
    total_removed = sum(r.n_removed for r in rows)
    docs = _t(spark, SF, "documents")
    n_docs = docs.count()
    n_fp = docs.select(TX.fingerprint_md5("text")).distinct().count()
    assert total_removed == n_docs - n_fp
    assert sum(r.n_docs for r in rows) == n_docs


def test_perplexity_sweep_monotone(spark):
    from kafkaconnect_spark.queries_r6b import docs_perplexity_threshold_sweep

    rows = sorted(
        docs_perplexity_threshold_sweep(spark, SF).collect(),
        key=lambda r: r.tau,
    )
    assert [r.tau for r in rows] == [4.8, 4.85, 4.9, 5.0]
    kept = [r.n_kept for r in rows]
    assert kept == sorted(kept)  # higher threshold keeps more
    for r in rows:
        assert r.frac_kept == pytest.approx(r.n_kept / r.n_scored, abs=1e-6)


def test_bot_regularity_flags_periodic_user(spark, tmp_path):
    """Hand-built telemetry: a metronome user (gap exactly 60 s) gets
    cv = 0 / flagged; a bursty user (gaps 1 s…1 h) does not."""
    from kafkaconnect_spark.queries_r6b import events_bot_regularity_audit

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(12):  # bot: exact 60 s cadence
        rows.append((eid, t0 + datetime.timedelta(seconds=60 * i), 1))
        eid += 1
    offsets = [0, 1, 4, 9, 100, 140, 3600, 3610, 3620, 7000, 7003, 20000]
    for s in offsets:  # human: bursts and silences
        rows.append((eid, t0 + datetime.timedelta(seconds=s), 2))
        eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.user_id: r
        for r in events_bot_regularity_audit(spark, str(tmp_path)).collect()
    }
    assert got[1].cv == 0.0 and got[1].is_regular
    assert got[1].mean_gap_s == 60.0 and got[1].n_events == 12
    assert got[2].cv > 0.8 and not got[2].is_regular


def test_kmv_k_sweep_exact_below_k(spark):
    """sf0.001 has fewer distinct users than every swept k, so all
    three sketch estimates must be EXACT (n_seen < k ⇒ est = n_seen)."""
    from kafkaconnect_spark.queries_r6b import events_kmv_k_sweep

    rows = events_kmv_k_sweep(spark, SF).collect()
    assert {r.k for r in rows} == {64, 256, 1024}
    for r in rows:
        assert r.n_seen < r.k
        assert r.kmv_est == r.exact_distinct
        assert r.rel_err == 0.0


def test_chunk_dedup_reconciles_with_chunker(spark):
    from kafkaconnect_spark.operators import pipeline
    from kafkaconnect_spark.queries_r6b import docs_chunk_dedup
    from kafkaconnect_spark.query_base import _t

    row = docs_chunk_dedup(spark, SF).collect()[0]
    n_chunks = pipeline.chunk_documents(
        _t(spark, SF, "documents"), window=50, stride=50
    ).count()
    assert row.n_chunks == n_chunks
    assert row.n_unique_chunks <= row.n_chunks
    assert 0.0 <= row.dup_chunk_rate < 1.0
    assert row.n_boilerplate_chunks <= row.n_unique_chunks


def test_blob_dedup_reconciles_with_meta(spark):
    from kafkaconnect_spark.operators.multimodal import (
        attach_media_meta,
        make_fake_media,
    )
    from kafkaconnect_spark.queries_r6b import multimodal_exact_dedup
    from kafkaconnect_spark.query_base import _t

    row = multimodal_exact_dedup(spark, SF).collect()[0]
    meta = attach_media_meta(make_fake_media(_t(spark, SF, "documents")))
    agg = meta.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("media_meta.n_bytes").alias("b"),
    ).collect()[0]
    assert row.n_blobs == agg.n
    assert row.bytes_total == agg.b
    assert row.n_dup_blobs == row.n_blobs - row.n_unique
    assert 0.0 <= row.saveable_frac < 1.0


def test_fertility_at_least_one(spark):
    """Every word segments into ≥ 1 BPE token, so per-lang fertility
    ≥ 1; languages partition the corpus."""
    from kafkaconnect_spark.queries_r6b import text_tokenizer_fertility
    from kafkaconnect_spark.query_base import _t

    rows = text_tokenizer_fertility(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.fertility >= 1.0
        assert r.n_tokens >= r.n_words
    n_docs = _t(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_pq_distortion_sums_to_quant_err(spark):
    """Σ_s per-subspace mean distortion == corpus mean quant_err of
    the production pq_codes (same books, same rounding) — the
    distortion view is an exact decomposition, not a re-derivation."""
    from kafkaconnect_spark.operators.similarity import pq_codes
    from kafkaconnect_spark.queries_r6b import embedding_pq_distortion_by_dim
    from kafkaconnect_spark.query_base import _t

    rows = embedding_pq_distortion_by_dim(spark, SF).collect()
    assert {r.subspace for r in rows} == {0, 1, 2, 3}
    n_vecs = {r.n_vecs for r in rows}
    assert len(n_vecs) == 1
    emb = _t(spark, SF, "embeddings").where(F.size("embedding") > 0)
    mean_err = (
        pq_codes(emb, n_sub=4, n_codes=8, dim=64)
        .agg(
            (
                F.sum(F.col("quant_err").cast("decimal(20,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()[0]
        .m
    )
    assert sum(r.mse for r in rows) == pytest.approx(mean_err, abs=1e-5)

"""Round-6 batch-4 operators: winnowing, prefix-truncation dups,
threshold sensitivity, vector dedup, range search, CMS width sweep,
cluster-size histogram, Markov stationary, DAU/MAU, power-iteration
PCA. Value equality vs DuckDB is the driver's gate; these pin the
semantic invariants (coverage guarantees, monotone sweeps,
cross-operator reconciliation, convergence where the spectrum
allows it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_winnowing_coverage_guarantee(spark, tmp_path):
    """Schleimer et al.'s guarantee: a shared token run of length L
    yields ≥ ceil((L-k+1-w+1)/w) distinct shared fingerprints (one
    selected min can serve at most w consecutive windows). A 16-token
    shared run → 14 shared grams → 11 windows → ≥ 3 shared
    fingerprints, clearing the query's ≥ 2 screen; two
    disjoint-vocabulary docs must not pair."""
    from kafkaconnect_spark.queries_r6c import docs_winnowing_plagiarism

    shared = (
        "the quick brown fox jumps over the lazy dog while rain "
        "falls on green hills today"
    )
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta"),
        (2, f"one two three {shared} four five six seven"),
        (3, "completely different words entirely unrelated content here now"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r.id_a, r.id_b): r.n_shared_fps
        for r in docs_winnowing_plagiarism(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_prefix_truncation_verification(spark, tmp_path):
    """A doc that IS a prefix of another verifies is_truncation=true;
    docs sharing only the first 20 tokens then diverging verify
    false."""
    from kafkaconnect_spark.queries_r6c import docs_prefix_truncation_dups

    base = " ".join(f"w{i}" for i in range(40))
    trunc = " ".join(f"w{i}" for i in range(25))
    diverge = " ".join(f"w{i}" for i in range(22)) + " xxx yyy zzz"
    rows = [(1, base, len(base)), (2, trunc, len(trunc)), (3, diverge, len(diverge))]
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.id_a, r.id_b): r.is_truncation
        for r in docs_prefix_truncation_dups(spark, str(tmp_path)).collect()
    }
    assert got[(1, 2)] is True
    assert got[(1, 3)] is False and got[(2, 3)] is False


def test_threshold_sensitivity_monotone(spark):
    from kafkaconnect_spark.queries_r6c import dedup_threshold_sensitivity

    rows = sorted(
        dedup_threshold_sensitivity(spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.2, 0.4, 0.6, 0.8]
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs_affected for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    for r in rows:
        assert r.n_docs_affected <= 2 * r.n_pairs


def test_duplicate_vectors_reconcile(spark):
    from kafkaconnect_spark.queries_r6c import embedding_duplicate_vectors
    from kafkaconnect_spark.query_base import _t

    row = embedding_duplicate_vectors(spark, SF).collect()[0]
    n = (
        _t(spark, SF, "embeddings")
        .where(F.size("embedding") > 0)
        .count()
    )
    assert row.n_vectors == n
    assert row.n_dup_vectors == row.n_vectors - row.n_distinct
    assert row.max_group_size >= 1


def test_range_search_consistent_with_topk(spark):
    """If the exact top-1 cosine clears the 0.3 floor, range search
    must report it as max_cosine; if not, the anchor reports 0."""
    from kafkaconnect_spark.operators.similarity import brute_force_topk
    from kafkaconnect_spark.queries_r6c import similarity_range_search
    from kafkaconnect_spark.query_base import _t

    got = {
        r.query_id: r for r in similarity_range_search(spark, SF).collect()
    }
    assert len(got) == 10
    emb = _t(spark, SF, "embeddings").where(F.size("embedding") > 0)
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = {
        r.query_id: r.cosine
        for r in brute_force_topk(emb, q, k=1).collect()
    }
    for qid, r in got.items():
        if top1[qid] >= 0.3:
            assert r.max_cosine == top1[qid]
            assert r.n_neighbors >= 1
        else:
            assert r.n_neighbors == 0 and r.max_cosine is None


def test_cms_width_sweep_monotone(spark):
    """Wider counter tables can only reduce collisions: over-count
    totals non-increasing, exact-key counts non-decreasing."""
    from kafkaconnect_spark.queries_r6c import events_cms_width_sweep

    rows = {r.width: r for r in events_cms_width_sweep(spark, SF).collect()}
    assert set(rows) == {64, 256, 1024}
    assert (
        rows[64].sum_overcount
        >= rows[256].sum_overcount
        >= rows[1024].sum_overcount
    )
    assert rows[64].n_exact <= rows[256].n_exact <= rows[1024].n_exact
    assert rows[64].n_keys == rows[256].n_keys == rows[1024].n_keys


def test_cluster_histogram_accounts_every_doc(spark):
    from kafkaconnect_spark.queries_r6c import (
        docs_dedup_cluster_size_histogram,
    )
    from kafkaconnect_spark.query_base import _t

    rows = docs_dedup_cluster_size_histogram(spark, SF).collect()
    n_docs = _t(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        if r.bucket_exp == 0:  # singletons: one doc per "cluster"
            assert r.n_clusters == r.n_docs
        else:  # real clusters: 2^exp ≤ size < 2^(exp+1)
            assert r.n_docs >= r.n_clusters * (2**r.bucket_exp)
            assert r.n_docs < r.n_clusters * (2 ** (r.bucket_exp + 1))


def test_markov_stationary_is_distribution(spark):
    from kafkaconnect_spark.queries_r6c import events_markov_stationary

    rows = events_markov_stationary(spark, SF).collect()
    assert len(rows) == 5
    total = sum(r.stationary_prob for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)  # rounded-matrix drift
    for r in rows:
        assert 0.0 <= r.stationary_prob <= 1.0
        assert r.delta == pytest.approx(
            r.stationary_prob - r.empirical_prob, abs=2e-6
        )


def test_dau_mau_bounds(spark):
    from kafkaconnect_spark.queries_r6c import events_dau_mau_stickiness

    rows = events_dau_mau_stickiness(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.mau
        assert 0.0 < r.stickiness <= 1.0


def test_power_iteration_converges_on_anisotropic_corpus(spark):
    """On a corpus with a dominant direction (one coordinate's
    variance 100× the rest), 6 rounds of the SAME operator recover
    the true top eigenvector: |cos| ≥ 0.99 vs numpy's eigh on the
    exact covariance. (The driver corpus is near-isotropic — gap
    ≈ 1.07 — which is WHY the catalog query pins 2 rounds as
    semantics rather than claiming convergence.)"""
    np = pytest.importorskip("numpy")
    from kafkaconnect_spark.operators.spectral import (
        power_iteration_top_component,
    )

    rng = np.random.RandomState(7)
    D, N = 16, 400
    X = rng.randn(N, D) * 0.1
    X[:, 3] += rng.randn(N) * 3.0  # dominant direction = e3 + noise
    rows = [(i, [float(x) for x in X[i]]) for i in range(N)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = power_iteration_top_component(emb, rounds=6, dim=D)
    comp = np.array(
        [r.component for r in sorted(got.collect(), key=lambda r: r.dim)]
    )
    Xc = X - X.mean(0)
    w, V = np.linalg.eigh(Xc.T @ Xc)
    top = V[:, -1]
    assert abs(float(np.dot(comp, top))) >= 0.99
    assert float(np.linalg.norm(comp)) == pytest.approx(1.0, abs=1e-4)


def test_power_iteration_two_rounds_deterministic(spark):
    """Same input → bit-identical output across invocations (the
    fixed-point + power-of-two-rescale discipline leaves nothing to
    partial-sum order)."""
    from kafkaconnect_spark.queries_r6c import embedding_power_iteration_pca

    a = {
        r.dim: (r.mean, r.component)
        for r in embedding_power_iteration_pca(spark, SF).collect()
    }
    spark.catalog.clearCache()
    b = {
        r.dim: (r.mean, r.component)
        for r in embedding_power_iteration_pca(spark, SF).collect()
    }
    assert a == b and len(a) == 64


def test_norm_agg_survives_huge_coefficients(spark):
    """The final-norm aggregation must stay finite (not NULL) when the
    fixed-point coefficients approach the bigint range — the
    decimal(19,0)² formulation overflowed decimal(38,0) to NULL there
    (r6 ADVICE). Prescaled integer form: exact to ~2⁻²⁶ relative."""
    import math

    from kafkaconnect_spark.operators.spectral import _norm_agg

    vals = [(-1) ** j * (9_000_000_000_000_000_000 - j * 17) for j in range(64)]
    s_df = spark.createDataFrame([(v,) for v in vals], "s long")
    k = max(abs(v) for v in vals).bit_length()
    got = _norm_agg(s_df, k).collect()[0]["__norm"]
    want = math.sqrt(sum(v * v for v in vals))  # exact python ints
    assert got is not None and math.isfinite(got)
    assert abs(got - want) / want < 1e-7

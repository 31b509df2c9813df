"""Cross-query cache hygiene.

A persisted intermediate whose _kc_cached tag is lost in a wrapper
outlives release_cached() and silently feeds LATER queries
plan-fragment cache hits (Spark's CacheManager matches analyzed
subplans) — measured in r5 as dedup_incremental "running" 1.2 s
in-suite vs 20.5 s standalone because dedup_keep_policy leaked the
full-docs shingle/band caches. These tests pin the three defenses:

1. carry_cached propagates tags through derivations,
2. the eager cluster operators release their input's caches,
3. query-level wrappers leave the CacheManager empty after
   release_cached (the property bench.py's fence also enforces).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkaconnect_spark.operators import dedup


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def _clear(spark) -> None:
    spark.catalog.clearCache()


def test_carry_cached_propagates_tags(spark):
    a = spark.range(4).persist()
    b = spark.range(4, 8).persist()
    src1 = dedup._track_cached(spark.range(2), [a])
    src2 = dedup._track_cached(spark.range(2), [b])
    out = dedup.carry_cached(spark.range(1), src1, src2)
    assert getattr(out, "_kc_cached") == [a, b]
    # carrying onto an already-tagged frame merges, not replaces
    c = spark.range(8, 12).persist()
    out2 = dedup.carry_cached(dedup._track_cached(spark.range(1), [c]), src1)
    assert getattr(out2, "_kc_cached") == [c, a]
    for df in (a, b, c):
        df.unpersist()


def test_carry_cached_noop_without_tags(spark):
    out = dedup.carry_cached(spark.range(1), spark.range(1))
    assert getattr(out, "_kc_cached", []) == []


def test_duplicate_clusters_releases_input_caches(spark):
    _clear(spark)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 3} common tail text") for i in range(12)],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.0, num_hashes=16, bands=4)
    assert getattr(pairs, "_kc_cached")  # the producer tracks
    clusters = dedup.duplicate_clusters(pairs)
    clusters.count()
    # the eager loop released the pair pipeline's shingle/band caches
    assert _cache_manager_empty(spark)


def test_keep_policy_query_leaves_cache_empty(spark, sf_dir):
    _clear(spark)
    from kafkaconnect_spark.queries_r5 import dedup_keep_policy

    df = dedup_keep_policy(spark, sf_dir)
    df.count()
    dedup.release_cached(df)
    assert _cache_manager_empty(spark)


def test_minhash_histogram_carries_and_releases(spark, sf_dir):
    _clear(spark)
    from kafkaconnect_spark.queries_r5 import docs_minhash_similarity_histogram

    df = docs_minhash_similarity_histogram(spark, sf_dir)
    assert getattr(df, "_kc_cached")  # the wrapper carried the tags
    df.count()
    dedup.release_cached(df)
    assert _cache_manager_empty(spark)


def test_semdedup_tracks_and_releases(spark, sf_dir):
    _clear(spark)
    from kafkaconnect_spark.queries import similarity_semdedup

    df = similarity_semdedup(spark, sf_dir)
    assert getattr(df, "_kc_cached")  # the persisted corpus is tagged
    df.count()
    dedup.release_cached(df)
    assert _cache_manager_empty(spark)

"""Connected-component equivalence and scalability regressions for
the two clustering algorithms (min-label propagation vs alternating
large-star/small-star)."""

from __future__ import annotations

import random

from pyspark.sql import Row

from kafkaconnect_spark.operators import dedup


def _both(spark, rows):
    df = spark.createDataFrame(rows)
    a = {(r.doc_id, r.cluster_id) for r in dedup.duplicate_clusters(df).collect()}
    b = {(r.doc_id, r.cluster_id) for r in dedup.duplicate_clusters_star(df).collect()}
    return a, b


def test_long_chain_no_plan_blowup(spark):
    # regression: iterative lineage must be truncated per round —
    # a diameter-30 chain used to OOM the driver on plan analysis
    a, b = _both(spark, [Row(id_a=i, id_b=i + 1) for i in range(30)])
    assert a == b == {(i, 0) for i in range(31)}


def test_random_graph_equivalence(spark):
    random.seed(7)
    rows = [
        Row(id_a=random.randrange(120), id_b=random.randrange(120)) for _ in range(90)
    ]
    rows = [r for r in rows if r.id_a != r.id_b]
    a, b = _both(spark, rows)
    assert a == b and len(a) > 0


def test_cliques_and_isolated_pair(spark):
    rows = [Row(id_a=i, id_b=j) for i in range(5) for j in range(i + 1, 5)]
    rows += [Row(id_a=100 + i, id_b=100 + j) for i in range(4) for j in range(i + 1, 4)]
    rows += [Row(id_a=900, id_b=901)]
    a, b = _both(spark, rows)
    assert a == b
    labels = dict(b)
    assert all(labels[i] == 0 for i in range(5))
    assert all(labels[100 + i] == 100 for i in range(4))
    assert labels[900] == labels[901] == 900


def test_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    """checkpoint_dir (reliable checkpoint, cluster mode) must produce
    the identical labeling as the localCheckpoint default."""
    rows = [Row(id_a=i, id_b=i + 1) for i in range(12)]  # one 13-node chain
    rows += [Row(id_a=50, id_b=51), Row(id_a=51, id_b=52)]
    df = spark.createDataFrame(rows)
    for fn in (dedup.duplicate_clusters, dedup.duplicate_clusters_star):
        local = sorted(map(tuple, fn(df).collect()))
        reliable = sorted(
            map(tuple, fn(df, checkpoint_dir=str(tmp_path / fn.__name__)).collect())
        )
        assert local == reliable and len(local) == 16


def test_ngram_df_cap_keeps_exact_jaccard(spark):
    # 30 docs all share one boilerplate shingle run; two true near-dups
    base = "alpha beta gamma"
    rows = [Row(doc_id=i, text=f"{base} filler{i} mid{i} tail{i}") for i in range(30)]
    rows += [
        Row(doc_id=100, text="x y z w v u t"),
        Row(doc_id=101, text="x y z w v u q"),
    ]
    df = spark.createDataFrame(rows)
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5, max_doc_freq=10).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5, max_doc_freq=None).collect()
    }
    # the true near-dup pair survives the cap with the EXACT jaccard
    assert (100, 101) in capped and capped[(100, 101)] == exact[(100, 101)]
    # boilerplate-only links (jaccard < threshold anyway here) absent
    assert all(k[0] == 100 or exact.get(k) is not None for k in capped)


def test_ngram_cap_defaults_on_and_prunes_hot_join(spark):
    """The pipeline-facing default is CAPPED (opt-in to fully exact):
    the candidate join must carry the hot-shingle anti-join, and with
    a tiny cap the hot shingle's quadratic links vanish while true
    near-dup pairs keep exact values (same fixture as above)."""
    base = "alpha beta gamma"
    rows = [Row(doc_id=i, text=f"{base} filler{i} mid{i} tail{i}") for i in range(30)]
    rows += [
        Row(doc_id=100, text="x y z w v u t"),
        Row(doc_id=101, text="x y z w v u q"),
    ]
    df = spark.createDataFrame(rows)

    default_plan = dedup.ngram_jaccard_pairs(df, threshold=0.5)._jdf.queryExecution().toString()
    assert "LeftAnti" in default_plan  # hot-shingle pruning in the default plan
    exact_plan = (
        dedup.ngram_jaccard_pairs(df, threshold=0.5, max_doc_freq=None)
        ._jdf.queryExecution()
        .toString()
    )
    assert "LeftAnti" not in exact_plan  # fully-exact opt-in skips it

    # with the cap low enough to catch the df-30 boilerplate shingles,
    # the candidate join is free of the hot key: only the true pair joins
    capped = dedup.ngram_jaccard_pairs(df, threshold=0.5, max_doc_freq=10)
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    assert got == {(100, 101): 0.666667}  # 4 shared / 6 union shingles, exact
    dedup.release_cached(capped)

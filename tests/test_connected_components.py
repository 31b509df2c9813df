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

    # a cap that BINDS (df-30 boilerplate > 10) keeps the anti-join
    capped_plan = (
        dedup.ngram_jaccard_pairs(df, threshold=0.5, max_doc_freq=10)
        ._jdf.queryExecution()
        .toString()
    )
    assert "LeftAnti" in capped_plan  # hot-shingle pruning when hot exists
    # the default cap (10k) finds NO hot shingle here: the control-
    # plane probe elides the correction machinery entirely
    default_plan = dedup.ngram_jaccard_pairs(df, threshold=0.5)._jdf.queryExecution().toString()
    assert "LeftAnti" not in default_plan
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


def test_span_dup_stats_flags_shared_windows(spark):
    # docs 1 and 2 share a 25-token run; doc 3 is disjoint; doc 4 too short
    shared = " ".join(f"s{i}" for i in range(25))
    rows = [
        Row(doc_id=1, text=shared + " u1 u2 u3 u4 u5"),
        Row(doc_id=2, text="v1 v2 v3 v4 v5 " + shared),
        Row(doc_id=3, text=" ".join(f"x{i}" for i in range(30))),
        Row(doc_id=4, text="too short"),
    ]
    out = {r.doc_id: r for r in dedup.span_dup_stats(
        spark.createDataFrame(rows), k=20
    ).collect()}
    assert 4 not in out  # < k tokens → no windows
    assert out[3].n_dup_spans == 0 and out[3].dup_frac == 0.0
    # 25-token shared run → 6 shared 20-windows; each doc has 11 windows
    assert out[1].n_spans == out[2].n_spans == 11
    assert out[1].n_dup_spans == out[2].n_dup_spans == 6
    assert abs(out[1].dup_frac - 6 / 11) < 1e-12


def test_containment_is_asymmetric(spark):
    # doc 2 fully contains doc 1; Jaccard is diluted but containment
    # of 1-in-2 is 1.0 while 2-in-1 is small
    quote = " ".join(f"q{i}" for i in range(10))
    rows = [
        Row(doc_id=1, text=quote),
        Row(doc_id=2, text=quote + " " + " ".join(f"f{i}" for i in range(40))),
    ]
    out = {(r.id_a, r.id_b): r.containment for r in dedup.containment_pairs(
        spark.createDataFrame(rows), threshold=0.0
    ).collect()}
    assert out[(1, 2)] == 1.0  # all of doc 1's shingles are in doc 2
    assert out[(2, 1)] < 0.2   # doc 2 is mostly novel


def test_semdedup_prunes_higher_id_within_cell(spark):
    from kafkaconnect_spark.operators import similarity

    # two exact-duplicate vector groups + singletons; duplicates must
    # prune the higher ids, lowest id survives as representative
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 0.0]),
        Row(vec_id=5, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=6, embedding=[0.0, 1.0, 0.0, 0.0]),
        Row(vec_id=7, embedding=[0.0, 0.0, 1.0, 0.0]),
    ]
    out = {r.vec_id: r for r in similarity.semdedup_prune(
        spark.createDataFrame(rows), threshold=0.99, n_cells=2
    ).collect()}
    assert not out[0].pruned and not out[1].pruned  # lowest ids kept
    assert out[5].pruned and out[6].pruned          # exact dups pruned
    assert not out[7].pruned                        # unique direction kept


def test_exact_substring_dedup_removes_noncanonical_spans(spark):
    """r10 corpus-wide span removal (Lee et al. shape): the lowest-
    (doc_id, pos) occurrence of a duplicated 20-token window stays,
    every other occurrence's covered tokens are cut; disjoint and
    short docs pass through intact."""
    shared = " ".join(f"s{i}" for i in range(25))
    rows = [
        Row(doc_id=1, text=shared + " u1 u2 u3 u4 u5"),   # canonical holder
        Row(doc_id=2, text="v1 v2 v3 v4 v5 " + shared),   # loses the run
        Row(doc_id=3, text=" ".join(f"x{i}" for i in range(30))),  # disjoint
        Row(doc_id=4, text="too short"),                  # < k: intact
    ]
    res = dedup.exact_substring_dedup(spark.createDataFrame(rows), k=20)
    out = {r.doc_id: r for r in res.collect()}
    dedup.release_cached(res)
    # doc 1 is canonical for every duplicated window -> nothing removed
    assert out[1].n_removed == 0 and out[1].clean_text.startswith("s0 s1")
    # doc 2: its 6 duplicate windows start at pos 5..10 and cover
    # tokens 5..29 -> the whole 25-token shared run is cut, the v-prefix stays
    assert out[2].n_tokens == 30 and out[2].n_removed == 25
    assert out[2].clean_text == "v1 v2 v3 v4 v5"
    assert out[3].n_removed == 0
    assert out[4].n_removed == 0 and out[4].clean_text == "too short"


def test_exact_substring_dedup_within_doc_repeats(spark):
    """POSITION semantics: the same window twice in ONE doc is a
    duplicate; the first occurrence is canonical, later tokens only
    survive where no non-canonical window covers them."""
    run = " ".join(f"r{i}" for i in range(20))
    rows = [Row(doc_id=1, text=run + " mid " + run)]
    res = dedup.exact_substring_dedup(spark.createDataFrame(rows), k=20)
    out = res.collect()[0]
    dedup.release_cached(res)
    # tokens: 20 (canonical run) + 1 ('mid') + 20 (repeat, removed)
    assert out.n_tokens == 41 and out.n_removed == 20
    assert out.clean_text == run + " mid"

"""ANN quality: LSH and IVF recall against the exact brute-force
baseline — the scale paths must stay useful, not just fast."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkaconnect_spark.operators import similarity
from kafkaconnect_spark.queries import _t


def _queries(emb, n=20):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def recall(approx_df, exact_df, k):
    exact = {}
    for r in exact_df.collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in approx_df.collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    return hits / sum(len(s) for s in exact.values())


def test_lsh_and_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = _queries(emb)
    exact = similarity.brute_force_topk(emb, q, k=10)
    # few planes / many probes → high recall at reduced candidate cost
    lsh = similarity.lsh_ann_topk(emb, q, k=10, num_planes=2, dim=64)
    ivf = similarity.ivf_ann_topk(emb, q, k=10, n_cells=4, n_probe=2)
    r_lsh = recall(lsh, exact, 10)
    r_ivf = recall(ivf, exact, 10)
    assert r_lsh >= 0.3, f"LSH recall collapsed: {r_lsh}"
    assert r_ivf >= 0.3, f"IVF recall collapsed: {r_ivf}"
    # candidate sets are actually pruned (sub-linear path is real)
    assert lsh.count() <= exact.count()
    assert ivf.count() <= exact.count()


def test_multi_probe_improves_or_matches_recall(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = _queries(emb)
    exact = similarity.brute_force_topk(emb, q, k=10)
    single = similarity.lsh_ann_topk(emb, q, k=10, num_planes=4, dim=64)
    multi = similarity.lsh_ann_topk(
        emb, q, k=10, num_planes=4, dim=64, multi_probe=True
    )
    r_single = recall(single, exact, 10)
    r_multi = recall(multi, exact, 10)
    assert r_multi >= r_single, (r_single, r_multi)
    assert r_multi >= 0.4, f"multi-probe recall collapsed: {r_multi}"

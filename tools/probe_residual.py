"""Adjudicate the sf100 superlinear residuals (r8 judge directive #5).

`SCALE_LADDER.json sf100_subset` flagged two lifecycle queries well
over the subset's 3.54x total on 10x rows: `dedup_lsh_index_erasure`
7.25x and `embedding_pq_index_lifecycle` 6.24x. A whole-query wall
can't name the term, so this probe re-runs each query DECOMPOSED into
its lifecycle stages — the same operator calls in the same order, each
stage timed to its own materialization barrier (every stage of both
queries is eager: build/append/compact/retrain commit parquet under
the writer lock, match phases are written out exactly as the query
materializes them) — at sf10 and sf100, so each stage gets its own
ratio and the dominant superlinear term is measured, not guessed.

Also measures `pq_index.retrain()` at both scales (r8 judge directive
#4's ladder entry): membership resolve + Lloyd training + one-pass
re-code should be corpus-linear.

Protocol mirrors tools/scale_sf100.py: sf10 runs twice (first pass
JIT/shuffle warm-up for the session, second timed), sf100 once
(multi-minute walls need no GC-noise stripping); shuffle_partitions
128 at sf10 -> 256 at sf100. Results merge into SCALE_LADDER.json
under "residual_probe_r9" and "pq_retrain".

Usage: python tools/probe_residual.py [--skip-gen] [--key NAME]
(--key defaults to residual_probe_r9; the post-fix re-run after the
_spread_for_write change merges under residual_probe_r9_after_fix so
both decompositions stay in the record)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

RUNS = [("sf10", "gen_sf10", 128, 2), ("sf100", "gen_sf100", 256, 1)]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def lsh_erasure_stages(spark, sf_dir: str) -> dict[str, float]:
    """dedup_lsh_index_erasure (queries_r6.py:159), stage-timed."""
    from kafkaconnect_spark.operators import lsh_index
    from kafkaconnect_spark.query_base import _t

    docs = _t(spark, sf_dir, "documents", spread=True)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    erased = corpus.where(F.col("doc_id") % 3 == 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    d = tempfile.mkdtemp(prefix="probe_lsh_erasure_")
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        lsh_index.build(corpus, d, num_hashes=16, bands=4, threshold=0.2)
        out["build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        lsh_index.delete(spark, d, erased.select("doc_id"))
        out["delete"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        p1 = lsh_index.append(spark, d, batch)
        _noop(p1)
        out["append_batch_p1"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        lsh_index.compact(spark, d, keep_generations=0)
        out["compact_gc"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        p2 = lsh_index.append(spark, d, erased)
        _noop(p2)
        out["append_erased_p2"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def pq_lifecycle_stages(spark, sf_dir: str) -> dict[str, float]:
    """embedding_pq_index_lifecycle (queries_r7.py:48), stage-timed."""
    from kafkaconnect_spark.operators import pq_index
    from kafkaconnect_spark.query_base import _t

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    d = tempfile.mkdtemp(prefix="probe_pq_lifecycle_")
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        pq_index.build(corpus, d, n_cells=8, n_sub=4, n_codes=8, dim=64)
        out["build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        _noop(pq_index.match(spark, d, q, emb, k=10, n_probe=2, rerank=30))
        out["match_p1"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        pq_index.append(spark, d, batch)
        out["append"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        _noop(pq_index.match(spark, d, q, emb, k=10, n_probe=2, rerank=30))
        out["match_p2"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def pq_retrain_stages(spark, sf_dir: str) -> dict[str, float]:
    """build(train_rounds=2) then retrain() over the full membership —
    the rotation lifecycle the staleness audit triggers."""
    from kafkaconnect_spark.operators import pq_index
    from kafkaconnect_spark.query_base import _t

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    d = tempfile.mkdtemp(prefix="probe_pq_retrain_")
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        pq_index.build(
            corpus, d, n_cells=8, n_sub=4, n_codes=8, dim=64, train_rounds=2
        )
        out["build_trained"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        pq_index.retrain(spark, d, emb, keep_generations=0)
        out["retrain"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


PROBES = {
    "dedup_lsh_index_erasure": lsh_erasure_stages,
    "embedding_pq_index_lifecycle": pq_lifecycle_stages,
    "pq_retrain": pq_retrain_stages,
}


def main() -> int:
    skip_gen = "--skip-gen" in sys.argv
    from tools.gen_testdata import gen

    dirs: dict[str, str] = {}
    for tag, sub, _parts, _passes in RUNS:
        out = os.path.join(ROOT, ".data", sub)
        if not skip_gen and not os.path.exists(
            os.path.join(out, "documents.parquet")
        ):
            print(f"== generating {tag}", flush=True)
            gen(100.0 if tag == "sf100" else 10.0, out,
                tables={"documents", "embeddings"})
        dirs[tag] = out

    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-probe-residual", master="local[32]",
        shuffle_partitions=128,
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {n: {} for n in PROBES}
    for tag, _sub, parts, passes in RUNS:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        for name, fn in PROBES.items():
            stages: dict[str, float] = {}
            for _ in range(passes):
                stages = fn(spark, dirs[tag])
                spark.catalog.clearCache()
            results[name][tag] = {k: round(v, 3) for k, v in stages.items()}
            total = round(sum(stages.values()), 3)
            results[name][tag]["total"] = total
            print(f"{tag} {name}: {results[name][tag]}", flush=True)
    spark.stop()

    for name, row in results.items():
        row["stage_ratios"] = {
            k: round(row["sf100"][k] / row["sf10"][k], 2)
            for k in row["sf10"]
            if row["sf10"][k] > 0
        }

    key = "residual_probe_r9"
    if "--key" in sys.argv:
        key = sys.argv[sys.argv.index("--key") + 1]
    ladder_path = os.path.join(ROOT, "SCALE_LADDER.json")
    with open(ladder_path) as fh:
        ladder = json.load(fh)
    ladder[key] = {
        "note": (
            "stage-level decomposition of the two sf100_subset residuals "
            "plus the pq retrain rotation, sf10 (warm, 2nd pass) vs sf100 "
            "(single pass) on 10x rows; shuffle_partitions 128->256; "
            "stage_ratios name the superlinear term"
        ),
        "queries": results,
    }
    with open(ladder_path, "w") as fh:
        json.dump(ladder, fh, indent=1, sort_keys=True)
    print(f"merged {key} into {ladder_path}")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

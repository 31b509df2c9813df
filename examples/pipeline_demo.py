"""End-to-end training-data pipeline demo — the composition story.

Chains the real operators over the driver testdata exactly the way a
100 TB curation run would (same plan shapes, small inputs):

  read documents
    → quality screen        (Gopher repetition rules)
    → exact dedup           (md5 fingerprint groupBy)
    → near dedup            (MinHash+LSH banded candidates + verify,
                             connected components, keep min-id)
    → decontaminate         (zero-join Bloom probe vs the test split)
    → tokenize              (learned BPE merge table)
    → pack + shard          (sequence packing, shard assignment)

Run: python examples/pipeline_demo.py [sf_dir]
Prints one line per stage: docs in → docs out.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafkaconnect_spark.operators import dedup, pipeline
from kafkaconnect_spark.operators.bpe import apply_bpe, learn_bpe_merges
from kafkaconnect_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pipeline-demo", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from kafkaconnect_spark.queries import _t

    docs = _t(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"ingest            : {n0} docs")

    # 1. quality screen
    kept = pipeline.gopher_repetition_stats(docs).where(F.col("keep"))
    quality = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    n1 = quality.count()
    print(f"quality screen    : {n0} -> {n1}")

    # 2. exact dedup (keep one representative per fingerprint)
    reps = dedup.exact_dedup(quality)
    exact = quality.join(reps.select("doc_id"), "doc_id", "left_semi")
    n2 = exact.count()
    print(f"exact dedup       : {n1} -> {n2}")

    # 3. near dedup: banded candidates -> verified pairs -> components
    pairs = dedup.minhash_dedup_pairs(exact, threshold=0.5)
    clusters = dedup.duplicate_clusters(pairs)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    near = exact.join(drop, "doc_id", "left_anti")
    n3 = near.count()
    dedup.release_cached(pairs)
    print(f"near dedup        : {n2} -> {n3}")

    # 3b. image dedup: perceptual aHash buckets over the decoded
    # media column (fixture images here; same plan on real binaries)
    from kafkaconnect_spark.operators.multimodal import (
        make_fake_ppm,
        perceptual_ahash,
    )

    hashes = perceptual_ahash(make_fake_ppm(near))
    img_reps = hashes.groupBy("phash").agg(F.min("doc_id").alias("doc_id"))
    near = near.join(img_reps.select("doc_id"), "doc_id", "left_semi")
    n3b = near.count()
    print(f"image dedup       : {n3} -> {n3b} (aHash buckets)")

    # 3c. corpus health: deterministic KMV distinct-content estimate
    from kafkaconnect_spark.functions.text import fingerprint_md5
    from kafkaconnect_spark.operators.sketches import kmv_cardinality_sketch

    card = kmv_cardinality_sketch(
        near.withColumn("__fp", fingerprint_md5("text")), "lang", "__fp"
    )
    for r in sorted(card.collect()):
        print(f"  kmv[{r.lang}]         : {r.n_rows} rows, ~{r.kmv_distinct} distinct")

    # 4. decontamination vs a held-out split (zero-join Bloom probe)
    test_split = pipeline.split_assign(near, "doc_id").where(
        F.col("split") == "test"
    )
    train_split = near.join(
        test_split.select("doc_id"), "doc_id", "left_anti"
    )
    flagged = pipeline.bloom_contamination(train_split, test_split)
    n_contaminated = flagged.where(F.col("contamination") > 0.5).count()
    print(
        f"decontaminate     : {test_split.count()} held-out docs, "
        f"{n_contaminated} flagged >50% contaminated"
    )

    # 5. tokenize with a learned BPE table
    merges = learn_bpe_merges(train_split, num_merges=8)
    seg = apply_bpe(train_split, merges)
    total_tokens = seg.agg(F.sum("n_tokens")).collect()[0][0]
    print(f"bpe tokenize      : {len(merges)} merges, {total_tokens} tokens")

    # 5b. curriculum: entropy-quartile phases (easy/boilerplate first)
    ent = pipeline.token_entropy(train_split).select("doc_id", "norm_entropy")
    fence = ent.agg(
        F.round(F.expr("percentile(norm_entropy, cast(0.5 as double))"), 6).alias(
            "p50"
        )
    )
    phases = (
        ent.crossJoin(F.broadcast(fence))
        .select(
            (F.col("norm_entropy") > F.col("p50")).cast("int").alias("late_phase")
        )
        .groupBy("late_phase")
        .count()
        .collect()
    )
    by_phase = {r.late_phase: r["count"] for r in phases}
    print(
        f"curriculum        : {by_phase.get(0, 0)} early-phase docs, "
        f"{by_phase.get(1, 0)} late-phase"
    )

    # 6. pack + shard
    packed = pipeline.pack_sequences(
        train_split.withColumn("lang", F.lit("en")), budget=512
    )
    n_bins = packed.select("lang", "bin_id").distinct().count()
    shards = pipeline.shard_assignment(train_split, shards=4)
    print(
        f"pack + shard      : {n_bins} bins of 512 tokens, "
        f"{shards.select('shard_id').distinct().count()} shards"
    )

    # 7. contrastive negatives over the embeddings table: the
    # hard-negative mining stage of a retrieval-training pipeline
    from kafkaconnect_spark.operators.similarity import hard_negative_topk

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    negs = hard_negative_topk(emb, anchors, k=4)
    print(f"hard negatives    : {negs.count()} pairs for 5 anchors (k=4)")
    spark.stop()


if __name__ == "__main__":
    main()

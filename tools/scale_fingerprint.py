"""Scale ladder for the r10 fingerprint-index family (sf1 → sf10,
50k → 500k docs): the r9 run measured the blowup and STOPPED; this one
re-runs the stopped sf10 text lifecycle to COMPLETION through the
r10 hot-band-value routing (hamming_index.match: cold values bounded
at bands × hot_df_cap × n_batch candidates, hot values through the
salted distinct-hash verify with a narrow pre-shuffle Hamming filter).

Hamming banding collides RANDOMLY on non-dup fingerprints: each band
is a 2^band_bits-value key, so candidate volume grows ~ n_batch ×
n_corpus × bands / 2^band_bits — quadratic in the corpus with a
constant set by band WIDTH. The gate-scale catalog queries use the
8 × 8-bit geometry (recall-exact to hamming 7, right for sf0.001–0.1);
at corpus scale the knob is wider bands: 4 × 16-bit slices trade the
recall bound down to hamming ≤ 3 for a 256× collision reduction.
This tool measures BOTH:

  candidates  shared-band pair volume per geometry per scale (the
              n²/2^band_bits law, measured)
  lifecycle   build → match(batch) → delete → match → add → match
              through operators/hamming_index at the SCALE geometry
              (bands=4, max_hamming=3) on 64-bit SimHash fingerprints

Protocol: two passes per scale (second timed), shuffle_partitions
64 → 128. Results merge into SCALE_LADDER.json under
"fingerprint_ladder_r10".

Usage: python tools/scale_fingerprint.py [--skip-gen]
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

RUNS = [("sf1", "gen_sf1", 64, 2), ("sf10", "gen_sf10", 128, 2)]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def candidate_volume(spark, hashes, band_bits: int) -> int:
    """Batch(doc_id%10=0) × corpus shared-band pair count at the given
    band width — computed from per-(band, value) counts, never by
    materializing the pairs."""
    bands = 64 // band_bits
    npb = band_bits // 4
    subs = F.array(
        *[F.substring("simhash_hex", b * npb + 1, npb) for b in range(bands)]
    )
    bnd = hashes.select(
        "doc_id", F.posexplode(subs).alias("band", "bv")
    )
    sz = (
        bnd.groupBy("band", "bv")
        .agg(
            F.sum(F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0)).alias("nb"),
            F.sum(F.when(F.col("doc_id") % 10 != 0, 1).otherwise(0)).alias("nc"),
        )
    )
    return sz.agg(F.sum(F.col("nb") * F.col("nc"))).collect()[0][0] or 0


def routed_volume(spark, hashes, band_bits: int, cap: int = 256) -> dict:
    """What the r10 routed match actually joins at this geometry:
    cold pairs (df ≤ cap, provably ≤ bands × cap × n_batch) plus the
    hot values' DISTINCT-hash pair volume — computed from per-value
    counts, never by materializing the pairs."""
    bands = 64 // band_bits
    npb = band_bits // 4
    subs = F.array(
        *[F.substring("simhash_hex", b * npb + 1, npb) for b in range(bands)]
    )
    bnd = hashes.select(
        "doc_id", "simhash_hex", F.posexplode(subs).alias("band", "bv")
    )
    per_val = bnd.groupBy("band", "bv").agg(
        F.sum(F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("doc_id") % 10 != 0, 1).otherwise(0)).alias("nc"),
        F.count_distinct(
            F.when(F.col("doc_id") % 10 == 0, F.col("simhash_hex"))
        ).alias("db"),
        F.count_distinct(
            F.when(F.col("doc_id") % 10 != 0, F.col("simhash_hex"))
        ).alias("dc"),
    )
    row = per_val.agg(
        F.sum(F.when(F.col("nc") <= cap, F.col("nb") * F.col("nc"))).alias("cold"),
        F.sum(F.when(F.col("nc") > cap, F.col("db") * F.col("dc"))).alias("hot"),
        F.sum(F.when(F.col("nc") > cap, 1).otherwise(0)).alias("n_hot"),
        F.max("nc").alias("max_df"),
    ).collect()[0]
    return {
        "cold_pairs": int(row["cold"] or 0),
        "hot_distinct_pairs": int(row["hot"] or 0),
        "n_hot_values": int(row["n_hot"] or 0),
        "max_corpus_df": int(row["max_df"] or 0),
    }


def lifecycle(spark, hashes) -> dict[str, float]:
    """The dedup_simhash_index lifecycle shape at the SCALE geometry
    (bands=4, max_hamming=3): build standing → match batch → delete →
    match (tombstone-immediate) → add batch → match (batch-mates)."""
    from kafkaconnect_spark.operators import hamming_index
    from kafkaconnect_spark.operators.dedup import release_cached

    def _run_match(d, batch):
        df = hamming_index.match(spark, d, batch)
        _noop(df)
        release_cached(df)  # match persists b_new + cands — free per stage

    standing = hashes.where(F.col("doc_id") % 10 != 0)
    batch = hashes.where(F.col("doc_id") % 10 == 0)
    erased = standing.where(F.col("doc_id") % 3 == 0)
    d = tempfile.mkdtemp(prefix="fp_ladder_")
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        hamming_index.build(
            standing, d, bits=64, bands=4, max_hamming=3,
            hash_col="simhash_hex",
        )
        out["build"] = time.perf_counter() - t0
        for tag, action in [
            ("match_p1", lambda: _run_match(d, batch)),
            ("delete", lambda: hamming_index.delete(
                spark, d, erased.select("doc_id"))),
            ("match_p2", lambda: _run_match(d, batch)),
            ("add", lambda: hamming_index.add(spark, d, batch)),
            ("match_p3", lambda: _run_match(d, batch)),
        ]:
            t0 = time.perf_counter()
            action()
            out[tag] = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


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
            gen(10.0 if tag == "sf10" else 1.0, out,
                tables={"documents", "embeddings"})
        dirs[tag] = out

    from kafkaconnect_spark.operators.dedup import simhash_hex64
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-scale-fingerprint", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark import StorageLevel

    results: dict = {"candidates": {}, "routed": {}, "lifecycle": {}}
    for tag, _sub, parts, passes in RUNS:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        docs = spark.read.parquet(
            os.path.join(dirs[tag], "documents.parquet")
        )
        hashes = simhash_hex64(docs).persist(StorageLevel.MEMORY_AND_DISK)
        hashes.count()
        # volume measurements come from tools/probe_fingerprint_skew.py
        # (merged below) — re-measuring them here at sf10 costs tens of
        # minutes of count_distinct aggregation for numbers we already
        # hold; this run is the LIFECYCLE-to-completion measurement
        probe_path = os.path.join(ROOT, ".data", "probe_fp_skew.json")
        if os.path.exists(probe_path):
            with open(probe_path) as fh:
                probe = json.load(fh)[tag]
            results["candidates"][tag] = {
                f"band_bits_{bb}": probe[f"bits{bb}_cap256"]["hot_raw_pairs"]
                + probe[f"bits{bb}_cap256"]["cold_pairs"]
                for bb in (8, 16)
            }
            results["routed"][tag] = {
                f"band_bits_{bb}": probe[f"bits{bb}_cap256"] for bb in (8, 16)
            }
            results["routed"][tag]["n_distinct_hashes"] = probe[
                "n_distinct_hashes"
            ]
        stages: dict[str, float] = {}
        for _ in range(passes):
            stages = lifecycle(spark, hashes)
        stages = {k: round(v, 3) for k, v in stages.items()}
        stages["total"] = round(sum(stages.values()), 3)
        results["lifecycle"][tag] = stages
        print(f"{tag} lifecycle: {stages}", flush=True)
        hashes.unpersist()
        spark.catalog.clearCache()
    spark.stop()

    results["lifecycle"]["stage_ratios"] = {
        k: round(
            results["lifecycle"]["sf10"][k] / results["lifecycle"]["sf1"][k], 2
        )
        for k in results["lifecycle"]["sf1"]
        if results["lifecycle"]["sf1"][k] > 0
    }
    for tag in ("sf1", "sf10"):
        c = results["candidates"][tag]
        c["reduction_16_vs_8"] = round(
            c["band_bits_8"] / max(c["band_bits_16"], 1), 1
        )
    out = {
        "note": (
            "r10 fingerprint family at sf1 -> sf10 (50k -> 500k docs): "
            "raw candidate volume per band geometry (the law that "
            "killed the r9 run) vs what the r10 ROUTED match joins "
            "(cold pairs bounded by bands x cap x n_batch + hot "
            "values' salted distinct-hash pairs, Hamming-filtered "
            "narrow before any shuffle), plus the full index "
            "lifecycle at the scale geometry (bands=4, max_hamming=3) "
            "run TO COMPLETION — the r9 run was stopped at sf10; "
            "2 passes per scale (2nd timed), shuffle_partitions "
            "64 -> 128"
        ),
        **results,
    }
    ladder_path = os.path.join(ROOT, "SCALE_LADDER.json")
    with open(ladder_path) as fh:
        ladder = json.load(fh)
    ladder["fingerprint_ladder_r10"] = out
    with open(ladder_path, "w") as fh:
        json.dump(ladder, fh, indent=1, sort_keys=True)
    print(f"merged fingerprint_ladder_r10 into {ladder_path}")
    print(json.dumps({"fingerprint_ladder_r10": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

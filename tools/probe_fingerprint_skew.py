"""One-off r10 probe: does distinct-hash compression defeat the
Hamming-band candidate blowup on the ladder's template-text corpus?

For sf1/sf10 SimHash fingerprints at both band geometries, measures
per hot band value (corpus df > cap): raw candidate volume
sum(B(v) * C(v)) vs distinct-hash volume sum(Bd(v) * Cd(v)) — the
latter is what the r10 hot-routed match will shuffle.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from tools.gen_testdata import gen

    dirs = {}
    for tag, sf in (("sf1", 1.0), ("sf10", 10.0)):
        out = os.path.join(ROOT, ".data", f"gen_{tag}")
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            print(f"== generating {tag}", flush=True)
            gen(sf, out, tables={"documents", "embeddings"})
        dirs[tag] = out

    from kafkaconnect_spark.operators.dedup import simhash_hex64
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-probe-fp-skew", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark import StorageLevel

    res: dict = {}
    for tag in ("sf1", "sf10"):
        docs = spark.read.parquet(os.path.join(dirs[tag], "documents.parquet"))
        hashes = simhash_hex64(docs).persist(StorageLevel.MEMORY_AND_DISK)
        n = hashes.count()
        nd = hashes.select("simhash_hex").distinct().count()
        r = {"n_docs": n, "n_distinct_hashes": nd}
        for band_bits in (8, 16):
            bands = 64 // band_bits
            npb = band_bits // 4
            subs = F.array(
                *[F.substring("simhash_hex", b * npb + 1, npb)
                  for b in range(bands)]
            )
            bnd = hashes.select(
                "doc_id", "simhash_hex",
                F.posexplode(subs).alias("band", "bv"),
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
            ).persist(StorageLevel.MEMORY_AND_DISK)
            for cap in (256, 1024):
                hot = per_val.where(F.col("nc") > cap)
                cold = per_val.where(F.col("nc") <= cap)
                row = hot.agg(
                    F.count(F.lit(1)).alias("n_hot_values"),
                    F.sum(F.col("nb") * F.col("nc")).alias("raw_pairs"),
                    F.sum(F.col("db") * F.col("dc")).alias("distinct_pairs"),
                    F.max("nc").alias("max_df"),
                ).collect()[0]
                cold_row = cold.agg(
                    F.sum(F.col("nb") * F.col("nc")).alias("cold_pairs")
                ).collect()[0]
                r[f"bits{band_bits}_cap{cap}"] = {
                    "n_hot_values": row["n_hot_values"],
                    "hot_raw_pairs": int(row["raw_pairs"] or 0),
                    "hot_distinct_pairs": int(row["distinct_pairs"] or 0),
                    "max_corpus_df": int(row["max_df"] or 0),
                    "cold_pairs": int(cold_row["cold_pairs"] or 0),
                }
            per_val.unpersist()
        res[tag] = r
        print(tag, json.dumps(r, indent=1), flush=True)
        hashes.unpersist()
    spark.stop()
    with open(os.path.join(ROOT, ".data", "probe_fp_skew.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Per-action decomposition of the routed match at sf1 scale geometry."""

from __future__ import annotations

import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from pyspark import StorageLevel

    from kafkaconnect_spark.operators import hamming_index as H
    from kafkaconnect_spark.operators.dedup import simhash_hex64
    from kafkaconnect_spark.operators.index_base import (
        _maybe_broadcast_tombstones,
        _shingle_bucket_expr,
        _table_path,
    )
    from kafkaconnect_spark.session import get_spark

    spark = get_spark("kc-probe-acts", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(ROOT, ".data/gen_sf1/documents.parquet"))
    hashes = simhash_hex64(docs).persist(StorageLevel.MEMORY_AND_DISK)
    hashes.count()
    standing = hashes.where(F.col("doc_id") % 10 != 0)
    new_hashes = hashes.where(F.col("doc_id") % 10 == 0)
    d = tempfile.mkdtemp(prefix="fp_acts_")
    H.build(standing, d, bits=64, bands=4, max_hamming=3, hash_col="simhash_hex")

    m = H._read_manifest(d)
    id_col, hash_col = m["id_col"], m["hash_col"]
    mh = m["max_hamming"]
    npb = H._check_geometry(m["bits"], m["bands"], mh)
    v = m["version"]

    T = time.perf_counter
    t0 = T()
    idx_hashes = spark.read.parquet(_table_path(d, "hashes", v))
    b_new = H._banded(new_hashes, m["bands"], npb, id_col, hash_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hit = sorted({r[0] for r in b_new.select(
        H._band_bucket_expr(m["band_buckets"]).alias("bb")).distinct().collect()})
    print(f"A hit-buckets: {T()-t0:.2f}s", flush=True); t0 = T()

    idx_b = (spark.read.parquet(_table_path(d, "bands", v))
             .where(F.col("band_bucket").isin(hit)).drop("band_bucket"))
    tomb_dir = _table_path(d, "tombstones", v)
    tomb = _maybe_broadcast_tombstones(spark.read.parquet(tomb_dir), tomb_dir)
    idx_b = idx_b.join(tomb, id_col, "left_anti")
    batch_vals = b_new.select("band", "band_val").distinct()
    hot_rows = (idx_b.join(F.broadcast(batch_vals), ["band", "band_val"], "left_semi")
                .groupBy("band", "band_val").agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") > 256).collect())
    print(f"B histogram: {T()-t0:.2f}s ({len(hot_rows)} hot)", flush=True); t0 = T()

    hot_vals = F.broadcast(spark.createDataFrame(
        [(r["band"], r["band_val"]) for r in hot_rows], "band int, band_val string"))
    cold_idx_b = idx_b.join(hot_vals, ["band", "band_val"], "left_anti")
    cands = (b_new.withColumnRenamed(id_col, "id_new")
             .join(cold_idx_b.withColumnRenamed(id_col, "id_corpus"),
                   ["band", "band_val"])
             .where(F.col("id_new") != F.col("id_corpus"))
             .select("id_new", "id_corpus").distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    hit_hb = sorted({r[0] for r in cands.select(
        _shingle_bucket_expr(m["hash_buckets"], "id_corpus").alias("hb"))
        .distinct().collect()})
    print(f"C cold-cands+buckets: {T()-t0:.2f}s", flush=True); t0 = T()

    out = (cands.join(new_hashes.select(F.col(id_col).alias("id_new"),
                                        F.col(hash_col).alias("__ha")), "id_new")
           .join(idx_hashes.where(F.col("hash_bucket").isin(hit_hb))
                 .drop("hash_bucket")
                 .select(F.col(id_col).alias("id_corpus"),
                         F.col(hash_col).alias("__hb")), "id_corpus")
           .select("id_new", "id_corpus",
                   H._hamming_expr("__ha", "__hb").alias("hamming"))
           .where(F.col("hamming") <= mh))
    out.write.format("noop").mode("overwrite").save()
    print(f"D cold-verify noop: {T()-t0:.2f}s", flush=True); t0 = T()

    hot_b = b_new.join(hot_vals, ["band", "band_val"], "left_semi").join(
        new_hashes.select(F.col(id_col), F.col(hash_col).alias("__ha")), id_col)
    hb_d = (hot_b.select("band", "band_val", "__ha").distinct()
            .persist(StorageLevel.MEMORY_AND_DISK))
    hcd = (idx_b.join(hot_vals, ["band", "band_val"], "left_semi")
           .join(idx_hashes.drop("hash_bucket").withColumnRenamed(hash_col, "__hb"),
                 id_col)
           .select("band", "band_val", F.col(id_col).alias("id_corpus"), "__hb")
           .persist(StorageLevel.MEMORY_AND_DISK))
    hc_d = hcd.select("band", "band_val", "__hb").distinct()
    est = (hb_d.groupBy("band", "band_val").agg(F.count(F.lit(1)).alias("nb"))
           .join(hc_d.groupBy("band", "band_val").agg(F.count(F.lit(1)).alias("nc")),
                 ["band", "band_val"])
           .agg(F.sum(F.col("nb") * F.col("nc"))).collect()[0][0] or 0)
    print(f"E est guard: {T()-t0:.2f}s (est={est:,})", flush=True); t0 = T()

    n_salt = 32
    hb_s = hb_d.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    hc_s = hc_d.withColumn("__salt", F.pmod(F.hash("__hb"), F.lit(n_salt)).cast("int"))
    hp = (hb_s.join(hc_s, ["band", "band_val", "__salt"])
          .withColumn("hamming", H._hamming_expr("__ha", "__hb"))
          .where(F.col("hamming") <= mh)
          .select("__ha", "__hb", "hamming").distinct())
    hp.write.format("noop").mode("overwrite").save()
    print(f"F hot salted join: {T()-t0:.2f}s", flush=True); t0 = T()

    out_hot = (hp.join(new_hashes.select(F.col(id_col).alias("id_new"),
                                         F.col(hash_col).alias("__ha")), "__ha")
               .join(hcd.select("id_corpus", "__hb").distinct(), "__hb")
               .where(F.col("id_new") != F.col("id_corpus"))
               .select("id_new", "id_corpus", "hamming"))
    full = out.unionByName(out_hot).distinct()
    full.write.format("noop").mode("overwrite").save()
    print(f"G full union noop: {T()-t0:.2f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""One-off r10 profiler: stage-by-stage decomposition of the routed
hamming_index.match at the ladder's sf1 scale geometry (bands=4,
max_hamming=3) — sf1 match_p1 measured 50 s vs r9's 6 s; find the
term before recording ladder numbers.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402


def t(tag, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{tag}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main() -> int:
    from kafkaconnect_spark.operators import hamming_index as H
    from kafkaconnect_spark.operators.dedup import release_cached, simhash_hex64
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kc-probe-match", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark import StorageLevel

    docs = spark.read.parquet(os.path.join(ROOT, ".data/gen_sf1/documents.parquet"))
    hashes = simhash_hex64(docs).persist(StorageLevel.MEMORY_AND_DISK)
    hashes.count()
    standing = hashes.where(F.col("doc_id") % 10 != 0)
    batch = hashes.where(F.col("doc_id") % 10 == 0)
    d = tempfile.mkdtemp(prefix="fp_prof_")
    t("build", lambda: H.build(standing, d, bits=64, bands=4, max_hamming=3,
                               hash_col="simhash_hex"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return df

    # full routed match
    for _ in range(2):
        res = t("match_routed", lambda: noop(H.match(spark, d, batch)))
        release_cached(res)
        spark.catalog.clearCache()
    n = res and None
    # routed OFF (r9 plan)
    for _ in range(2):
        res = t("match_caps_off", lambda: noop(
            H.match(spark, d, batch, hot_df_cap=None)))
        release_cached(res)
        spark.catalog.clearCache()
    # output size
    res = H.match(spark, d, batch)
    print("routed rows:", res.count(), flush=True)
    release_cached(res)
    spark.catalog.clearCache()
    res = H.match(spark, d, batch, hot_df_cap=None)
    print("off rows:", res.count(), flush=True)
    release_cached(res)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

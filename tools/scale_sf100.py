"""Third decade of the scale ladder: sf10 → sf100 on the five
index-lifecycle shapes (r7 judge directive #5).

The sf1→sf10 ladder (tools/scale_subset.py) covers 23 shapes; the
100 TB claim rests most heavily on the PERSISTED-INDEX paths, so
those five get one more measured decade — sf100 = 5M documents / 2M
embeddings, generated for the documents/embeddings families only
(the TPC-H fact tables would be 600M lineitem rows and none of these
queries read them):

  dedup_incremental             steady-state batch match against the
                                durable LSH index (index built in an
                                untimed warm pass at each scale —
                                the steady state IS the measurement)
  dedup_lsh_index_lifecycle     build + append + match (full lifecycle)
  dedup_lsh_index_erasure       build + delete + append + compact + append
  embedding_pq_index_lifecycle  build + match + append + match
  embedding_pq_index_erasure    build + delete + match + compact + append

Protocol: sf10 runs first (2 passes: warmup + timed — the warmup also
JIT-warms the shuffle path for the whole session), then sf100 with a
SINGLE timed pass per lifecycle query — at 10²-scale these walls are
minutes, where best-of-2 exists to strip ~100 ms GC noise, not 5% of
a 40-minute build; dedup_incremental keeps its untimed index-building
warm pass at both scales. shuffle_partitions scales with the data
(128 at sf10 → 256 at sf100), as a real cluster would.

Results merge into SCALE_LADDER.json under "sf100_subset".

Usage: python tools/scale_sf100.py [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = [
    "dedup_incremental",
    "dedup_lsh_index_lifecycle",
    "dedup_lsh_index_erasure",
    "embedding_pq_index_lifecycle",
    "embedding_pq_index_erasure",
]
RUNS = [("sf10", "gen_sf10", 128, 2), ("sf100", "gen_sf100", 256, 1)]


def main() -> int:
    skip_gen = "--skip-gen" in sys.argv
    from tools.gen_testdata import gen

    dirs: dict[str, str] = {}
    for tag, sub, _parts, _passes in RUNS:
        out = os.path.join(ROOT, ".data", sub)
        if not skip_gen and not os.path.exists(
            os.path.join(out, "documents.parquet")
        ):
            print(f"== generating {tag} (documents/embeddings only)", flush=True)
            gen(100.0 if tag == "sf100" else 10.0, out,
                tables={"documents", "embeddings"})
        dirs[tag] = out

    from kafkaconnect_spark.operators.dedup import release_cached
    from kafkaconnect_spark.queries import QUERY_CATALOG
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-scale-sf100", master="local[32]", shuffle_partitions=128
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {n: {} for n in QUERIES}
    for tag, _sub, parts, passes in RUNS:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        for name in QUERIES:
            fn = QUERY_CATALOG[name].fn
            if name == "dedup_incremental":
                # untimed warm pass builds the durable index so the
                # timed pass is the steady state (the ladder semantic)
                df = fn(spark, dirs[tag])
                df.write.format("noop").mode("overwrite").save()
                release_cached(df)
                spark.catalog.clearCache()
            best = float("inf")
            for i in range(passes):
                t0 = time.perf_counter()
                df = fn(spark, dirs[tag])
                df.write.format("noop").mode("overwrite").save()
                took = time.perf_counter() - t0
                if i == passes - 1:
                    best = min(best, took)
                release_cached(df)
                spark.catalog.clearCache()
            results[name][f"sec_{tag}"] = round(best, 3)
            print(f"{tag} {name}: {best:.3f}s", flush=True)
    spark.stop()

    for name, row in results.items():
        row["time_ratio"] = (
            round(row["sec_sf100"] / row["sec_sf10"], 2)
            if row.get("sec_sf10")
            else None
        )
    out = {
        "note": (
            "5 index-lifecycle shapes, sf10 and sf100 generated "
            "documents/embeddings (5M docs / 2M vectors at sf100) in one "
            "session; shuffle_partitions 128->256 with the data; sf100 is "
            "a single timed pass per lifecycle query (multi-minute walls "
            "need no GC-noise stripping); ratio is sf100/sf10 on 10x rows"
        ),
        "queries": results,
        "totals": {
            "sec_sf10": round(sum(r["sec_sf10"] for r in results.values()), 3),
            "sec_sf100": round(sum(r["sec_sf100"] for r in results.values()), 3),
        },
    }
    out["totals"]["time_ratio"] = round(
        out["totals"]["sec_sf100"] / out["totals"]["sec_sf10"], 2
    )
    ladder_path = os.path.join(ROOT, "SCALE_LADDER.json")
    with open(ladder_path) as fh:
        ladder = json.load(fh)
    ladder["sf100_subset"] = out
    with open(ladder_path, "w") as fh:
        json.dump(ladder, fh, indent=1, sort_keys=True)
    print(f"merged sf100_subset into {ladder_path}")
    print(json.dumps({"sf100_subset": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

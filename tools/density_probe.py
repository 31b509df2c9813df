"""Dedup density probe: re-measure the two superlinear ladder
outliers on a realistic-vocabulary corpus.

The sf0.1→sf1 ladder (SCALE_LADDER.json) flags dedup_containment and
dedup_simhash_pairs as superlinear — but both are capped-inverted-
index / banded equi-join operators whose candidate volume is driven
by shingle-space density, and the driver-family corpus has a 31-word
vocabulary: at sf1 (50k docs) nearly every document shares nearly
every shingle with every other, so TRUE near-dup pairs (the output
itself) grow quadratically. That is a property of the corpus, not the
plan. This probe is the measured proof: regenerate ONLY the documents
table with a 20k-token vocabulary (same Zipf slope, same doc-length
mix, same scales) and re-time the same two catalog queries — on a
realistic corpus the ratios must come back ~linear.

Writes a "density_probe" section into SCALE_LADDER.json (leaving the
ladder numbers untouched) and prints one JSON summary line.

Usage: python tools/density_probe.py [--vocab 20000]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.gen_testdata import gen  # noqa: E402

QUERIES = ["dedup_containment", "dedup_simhash_pairs"]
RUNS = [("sf01", 0.1), ("sf1", 1.0)]


def main() -> int:
    args = sys.argv[1:]
    vocab_n = 20_000
    if "--vocab" in args:
        vocab_n = int(args[args.index("--vocab") + 1])
    # r7: the probe generalizes to any flagged query/scale pair —
    # --queries a,b --scales sf1:1,sf10:10 --section <ladder key>
    # (defaults keep the r5 invocation byte-identical)
    queries = QUERIES
    runs = RUNS
    section = "density_probe"
    if "--queries" in args:
        queries = args[args.index("--queries") + 1].split(",")
    if "--scales" in args:
        runs = [
            (p.split(":")[0], float(p.split(":")[1]))
            for p in args[args.index("--scales") + 1].split(",")
        ]
    if "--section" in args:
        section = args[args.index("--section") + 1]
    note = (
        "same catalog queries as the ladder, documents regenerated "
        "with a realistic vocabulary — the ladder's superlinear "
        "flags on these two are corpus-density artifacts, not plan "
        "defects (see SCALE.md)"
    )
    if "--note" in args:
        note = args[args.index("--note") + 1]
    shuffle_partitions = 32
    if "--shuffle-partitions" in args:
        shuffle_partitions = int(args[args.index("--shuffle-partitions") + 1])

    dirs: dict[str, str] = {}
    for tag, sf in runs:
        out = os.path.join(ROOT, ".data", f"genw_{tag}")
        marker = os.path.join(out, f".vocab{vocab_n}")
        if not os.path.exists(marker):
            gen(sf, out, vocab_n=vocab_n, tables={"documents"})
            open(marker, "w").close()
        dirs[tag] = out

    from kafkaconnect_spark.operators.dedup import release_cached
    from kafkaconnect_spark.queries import QUERY_CATALOG
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-density-probe",
        master="local[32]",
        shuffle_partitions=shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")

    probe: dict[str, dict] = {}
    tags = [t for t, _ in runs]
    for name in queries:
        fn = QUERY_CATALOG[name].fn
        row: dict[str, float | int | None] = {}
        for tag, _sf in runs:
            # warmup + best-of-2, same protocol as bench.py — INCLUDING
            # its cache fence: both probed queries persist shingle/
            # signature intermediates (_track_cached), and without
            # release + clearCache between passes, passes 2-3 would hit
            # pass 1's caches via CacheManager plan-fragment matching
            # and time cached reads (the in-suite-vs-standalone
            # contamination the bench was fenced against; r5 ADVICE)
            best = float("inf")
            n_rows = 0
            for i in range(3):
                t0 = time.perf_counter()
                df = fn(spark, dirs[tag])
                df.write.format("noop").mode("overwrite").save()
                if i == 0:
                    n_rows = df.count()
                else:
                    best = min(best, time.perf_counter() - t0)
                release_cached(df)
                spark.catalog.clearCache()
            row[f"sec_{tag}"] = round(best, 3)
            row[f"pairs_{tag}"] = n_rows
        lo, hi = f"sec_{tags[0]}", f"sec_{tags[-1]}"
        row["time_ratio"] = round(row[hi] / row[lo], 2) if row[lo] else None
        probe[name] = row
        print(json.dumps({name: row}), flush=True)
    spark.stop()

    out = {
        "vocab_n": vocab_n,
        "shuffle_partitions": shuffle_partitions,
        "note": note,
        "queries": probe,
    }
    ladder_path = os.path.join(ROOT, "SCALE_LADDER.json")
    if os.path.exists(ladder_path):
        with open(ladder_path) as fh:
            ladder = json.load(fh)
        ladder[section] = out
        with open(ladder_path, "w") as fh:
            json.dump(ladder, fh, indent=1, sort_keys=True)
        print(f"merged density_probe into {ladder_path}")
    print(json.dumps({section: out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

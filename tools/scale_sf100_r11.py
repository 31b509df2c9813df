"""r11 ladder closure (r10 judge #3): the ONE shape whose sf100 entry
was stopped — ``semdedup_wb_scale_geom``, the SemDeDupIndex SMT 3-run
lifecycle at the SCALE geometry (n_cells=256, fixed 50k batch) —
re-run end-to-end now that the IVF-PQ coding/probing path is
vectorized past the folded-literal codegen ceiling
(operators/veccode.py, dispatched at n_cells > 64; the r10 run's
jstack showed the n_cells=256 cell-scores expression evaluating as
interpreted HOF folds at ~40 ms/row, the named sf10/sf100 wall).

Also re-times ``fingerprint_wb_replay_scale_geom`` at sf10 with the
r11-sized hot-routing (the machinery now engages only past the
measured route line) so the ladder's scale-geometry entry reflects
shipped code; its sf100 refusal-by-design is unchanged and re-recorded.

Protocol identical to scale_sf100_r10.py: one timed cold pass per sf,
shuffle_partitions 128 (sf10) → 256 (sf100), new-generator data
(documents+embeddings only). Merges into SCALE_LADDER.json under
"sf100_subset_r11".

Usage: python tools/scale_sf100_r11.py [--skip-gen] [--sf10-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS = [("sf10", "gen_sf10", 128), ("sf100", "gen_sf100", 256)]


def main() -> int:
    skip_gen = "--skip-gen" in sys.argv
    sf10_only = "--sf10-only" in sys.argv
    from tools.gen_testdata import gen
    from tools.scale_sf100_r10 import (
        fingerprint_wb_replay_scale_geom,
        semdedup_wb_scale_geom,
    )

    runs = [r for r in RUNS if not (sf10_only and r[0] == "sf100")]
    dirs: dict[str, str] = {}
    for tag, sub, _parts in runs:
        out = os.path.join(ROOT, ".data", sub)
        if not skip_gen and not os.path.exists(
            os.path.join(out, "documents.parquet")
        ):
            print(f"== generating {tag} (documents/embeddings only)", flush=True)
            gen(100.0 if tag == "sf100" else 10.0, out,
                tables={"documents", "embeddings"})
        dirs[tag] = out

    from kafkaconnect_spark.operators.dedup import release_cached
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-scale-sf100-r11", master="local[32]",
        shuffle_partitions=128,
    )
    spark.sparkContext.setLogLevel("ERROR")

    fns = {
        "semdedup_wb_scale_geom": semdedup_wb_scale_geom,
        "fingerprint_wb_replay_scale_geom": fingerprint_wb_replay_scale_geom,
    }
    results: dict[str, dict] = {n: {} for n in fns}
    for tag, _sub, parts in runs:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        # r11: the fingerprint SMT's sf100 refusal is now enforced IN
        # CODE (the within-batch guard fires before any join) rather
        # than recorded from an extrapolated estimate — run it and
        # catch HotPairRefusalError to prove it.
        from kafkaconnect_spark.operators.hamming_index import (
            HotPairRefusalError,
        )

        for name, fn in fns.items():
            try:
                t0 = time.perf_counter()
                df = fn(spark, dirs[tag])
                df.write.format("noop").mode("overwrite").save()
                took = time.perf_counter() - t0
            except HotPairRefusalError as e:
                took = time.perf_counter() - t0
                results[name][f"{tag}_refused_in_code"] = (
                    f"after {took:.1f}s, before any candidate join: "
                    f"{e}"[:400]
                )
                print(f"{tag} {name}: refused-in-code ({took:.1f}s)",
                      flush=True)
                spark.catalog.clearCache()
                continue
            except Exception as e:  # noqa: BLE001 -- record, keep laddering
                results[name][f"error_{tag}"] = f"{type(e).__name__}: {e}"[:300]
                print(f"{tag} {name}: ERROR {e}", flush=True)
                spark.catalog.clearCache()
                continue
            release_cached(df)
            spark.catalog.clearCache()
            results[name][f"sec_{tag}"] = round(took, 3)
            print(f"{tag} {name}: {took:.3f}s", flush=True)
    spark.stop()

    for name, row in results.items():
        row["time_ratio"] = (
            round(row["sec_sf100"] / row["sec_sf10"], 2)
            if row.get("sec_sf10") and row.get("sec_sf100")
            else None
        )
    out = {
        "note": (
            "r11 closure of the r10 ladder: semdedup_wb_scale_geom "
            "(n_cells=256 SCALE geometry, fixed 50k batches) with the "
            "vectorized coding/probing path (veccode mapInPandas "
            "kernels past the 64-cell codegen ceiling) — the r10 run "
            "was stopped in its sf100 standing build with interpreted "
            "HOF folds at ~40ms/row; fingerprint_wb_replay_scale_geom "
            "re-timed at sf10 with the r11-sized hot routing (engages "
            "only past the measured route line), sf100 refusal "
            "unchanged. One timed cold pass per sf, shuffle_partitions "
            "128 (sf10) -> 256 (sf100)."
        ),
        "queries": results,
    }
    done = [r for r in results.values() if r.get("sec_sf100")]
    if done:
        out["totals"] = {
            "sec_sf10": round(sum(r["sec_sf10"] for r in done), 3),
            "sec_sf100": round(sum(r["sec_sf100"] for r in done), 3),
        }
        out["totals"]["time_ratio"] = round(
            out["totals"]["sec_sf100"] / out["totals"]["sec_sf10"], 2
        )
    ladder_path = os.path.join(ROOT, "SCALE_LADDER.json")
    with open(ladder_path) as fh:
        ladder = json.load(fh)
    key = "sf100_subset_r11" if not sf10_only else "sf10_subset_r11"
    ladder[key] = out
    with open(ladder_path, "w") as fh:
        json.dump(ladder, fh, indent=1, sort_keys=True)
    print(f"merged {key} into {ladder_path}")
    print(json.dumps({key: out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""r11 standalone re-profile of dedup_lsh_index_lifecycle (r10 judge
#5: 7.4 s in the builder's round-end bench vs 14.6 s in the driver's
r10 re-run with untouched code — same signature as the
multimodal_audio_stats case adjudicated in r10: adjudicate in-suite
variance vs regression with the r8/r4 template: a fresh session, N
timed standalone runs, full collect(), calibration matmul alongside).

The query builds a fresh on-disk LSH index per run (_tmp_index_dir),
so repeated runs are cold by construction; only the JVM is warm.

Usage: python tools/probe_lsh_lifecycle.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _calib() -> float:
    import numpy as np

    a = np.random.default_rng(7).random((1200, 1200))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a
        a /= np.abs(a).max()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from kafkaconnect_spark.queries_r5 import dedup_lsh_index_lifecycle
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-probe-lsh-lifecycle",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    walls = []
    for i in range(n_runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows = dedup_lsh_index_lifecycle(spark, sf_dir).collect()
        walls.append(round(time.perf_counter() - t0, 3))
        print(f"run {i}: {walls[-1]} s ({len(rows)} rows)", flush=True)
    spark.stop()
    out = {
        "sf_dir": sf_dir,
        "walls_sec": walls,
        "min": min(walls),
        "median": sorted(walls)[len(walls) // 2],
        "cpu_matmul_sec": round(_calib(), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

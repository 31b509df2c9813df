"""r10 standalone re-profile of multimodal_audio_stats (r9 judge #6:
0.88 s (r8) → 1.53 s (r9 commit) → 2.55 s (r9 driver re-run) at sf0.1
with no change to multimodal.py's wav path — adjudicate noise vs
regression with the r8/r4 template: a fresh session, N timed
standalone runs, full collect(), calibration matmul alongside).

Usage: python tools/probe_audio_stats.py [sf_dir] [n_runs]
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

    from kafkaconnect_spark.queries import multimodal_audio_stats
    from kafkaconnect_spark.session import get_spark

    spark = get_spark(
        "kafkaconnect-probe-audio",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    walls = []
    for i in range(n_runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows = multimodal_audio_stats(spark, sf_dir).collect()
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

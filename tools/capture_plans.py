"""Capture .explain("formatted") for catalog queries into files —
the r11 plan evidence (plans/r11/<query>_{before,after}.txt).

Usage: python tools/capture_plans.py <outdir> <suffix> <query> [...]

Note: index-lifecycle queries execute their build/mutate phases
eagerly during construction; the captured plan is the returned
frame's (the final match/report union), which is where the join-shape
changes of this round show up.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from kafkaconnect_spark.operators.dedup import release_cached
    from kafkaconnect_spark.queries import QUERY_CATALOG
    from kafkaconnect_spark.session import get_spark

    spark = get_spark("kc-capture-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERY_CATALOG[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        release_cached(df)
        spark.catalog.clearCache()
        print(f"wrote {path} ({len(txt.splitlines())} lines)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Scale ladder: run the full headline bench on self-generated data
at sf0.1 AND sf1 (tools/gen_testdata.py — same distribution family,
10× the rows) and record per-query wall-time AND shuffle-byte scaling
ratios. The r4 judge directive: a query whose cost grows ≫10× on 10×
data is a real scale-killer the sf0.1 bench cannot see.

Output: SCALE_LADDER.json at the repo root —
  {"queries": {name: {"sec_sf01", "sec_sf1", "time_ratio",
                      "shuffle_mb_sf01", "shuffle_mb_sf1",
                      "shuffle_ratio"}},
   "superlinear": [names with time_ratio > 12 and sec_sf1 > 1.5],
   "totals": {...}}

Both runs use SPARK_GRAFT_BENCH_OUT so neither touches the committed
driver-data baseline record (bench_full_sf0.1.json) or its vs_prev
chain. Run time: ~5 min for sf0.1, ~20-40 min for sf1 on local[32].

Usage: python tools/scale_ladder.py [--skip-gen]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, ".data")
RUNS = [("sf01", 0.1, "gen_sf0.1"), ("sf1", 1.0, "gen_sf1.0")]

# flag thresholds: 10× data ⇒ linear cost ≤ ~10× time; allow AQE /
# fixed-overhead slack, and ignore sub-1.5 s absolute times where
# scheduler noise dominates the ratio
RATIO_FLAG = 12.0
ABS_FLAG_SEC = 1.5


def _run_bench(sf_dir: str, record: str) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_BENCH_OUT": record,
            "SPARK_GRAFT_DRIVER_MEM": env.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        }
    )
    print(f"== bench {sf_dir}", flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench failed for {sf_dir}")
    with open(record) as fh:
        return json.load(fh)


def main() -> int:
    skip_gen = "--skip-gen" in sys.argv
    records = {}
    for tag, sf, dirname in RUNS:
        sf_dir = os.path.join(DATA, dirname)
        if not skip_gen and not os.path.exists(
            os.path.join(sf_dir, "lineitem.parquet")
        ):
            subprocess.run(
                [
                    sys.executable,
                    os.path.join(ROOT, "tools", "gen_testdata.py"),
                    str(sf),
                    sf_dir,
                ],
                check=True,
            )
        record = os.path.join(DATA, f"bench_{tag}.json")
        records[tag] = _run_bench(sf_dir, record)

    lo, hi = records["sf01"], records["sf1"]
    sm_lo = lo.get("stage_metrics", {})
    sm_hi = hi.get("stage_metrics", {})

    def shuffle_mb(sm: dict, name: str) -> float | None:
        m = sm.get(name)
        if not m:
            return None
        return round(
            (m["shuffle_read_bytes"] + m["shuffle_write_bytes"]) / 2**20, 2
        )

    queries = {}
    for name, t_lo in lo["queries"].items():
        t_hi = hi["queries"].get(name)
        if t_hi is None:
            continue
        s_lo, s_hi = shuffle_mb(sm_lo, name), shuffle_mb(sm_hi, name)
        queries[name] = {
            "sec_sf01": t_lo,
            "sec_sf1": t_hi,
            "time_ratio": round(t_hi / t_lo, 2) if t_lo else None,
            "shuffle_mb_sf01": s_lo,
            "shuffle_mb_sf1": s_hi,
            "shuffle_ratio": round(s_hi / s_lo, 2) if s_lo and s_hi is not None else None,
        }
    superlinear = sorted(
        n
        for n, q in queries.items()
        if q["time_ratio"] and q["time_ratio"] > RATIO_FLAG
        and q["sec_sf1"] > ABS_FLAG_SEC
    )
    out = {
        "generator": "tools/gen_testdata.py (self-generated, driver-shape family)",
        "sf_ratio": 10.0,
        "totals": {
            "sec_sf01": lo["value"],
            "sec_sf1": hi["value"],
            "time_ratio": round(hi["value"] / lo["value"], 2),
            "spill_bytes_sf1": sum(
                m["memory_spill_bytes"] + m["disk_spill_bytes"]
                for m in sm_hi.values()
            ),
        },
        "dml_parity_sf_independent": hi.get("dml_parity_wall"),
        "superlinear": superlinear,
        "queries": queries,
    }
    path = os.path.join(ROOT, "SCALE_LADDER.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"totals": out["totals"], "superlinear": superlinear}))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Physical-plan anti-pattern audit over the query catalog — the
scale-discipline checklist (SCALE.md) as a tool.

For every catalog query (or the names given), renders the formatted
plan and flags:

- CARTESIAN        CartesianProduct (unbounded pairwise blowup)
- ROW_PYTHON       BatchEvalPython (row-at-a-time Python in the path;
                   Arrow-batched ArrowEvalPython/mapInPandas is fine)
- GLOBAL_WINDOW    windowspecdefinition without partition columns —
                   serializes the frame through one task (allowed
                   only for calendar/top-k-bounded frames; those are
                   listed in _ALLOWED_GLOBAL_WINDOW with the reason)
- WIDE_BNLJ        BroadcastNestedLoopJoin where neither side is the
                   1-row global-scalar pattern (heuristic: flag only
                   when the plan has no 1-row aggregate feeding it)

Exit code 1 if any UNDOCUMENTED flag fires — usable as a CI gate.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# global windows that are justified (bounded frames), with the reason
_ALLOWED_GLOBAL_WINDOW = {
    "orders_monthly_growth": "lag over month-aggregated frame (calendar-bounded)",
    "events_cumulative_users": "running sum over day-aggregated frame (calendar-bounded)",
    "events_key_skew_report": "rank over a post-limit 10-row frame",
    "sampling_reservoir": "keyed window (partition col parsed from spec)",
    "docs_zipf_slope": "row_number over a post-limit 100-row frame",
    "events_kmv_daily_merge": (
        "bottom-k merge over the union of per-day KMV sketches — "
        "frame is ≤ days×256 rows (calendar-bounded), the whole point "
        "of the mergeable-sketch contract"
    ),
    # docs_trigram_vocab_growth / events_watermark_late_drop /
    # orders_open_backlog_monthly were de-listed in r4: their
    # cumulative aggregates now run as tiled prefix scans
    # (operators/prefix.py) with no partitionless window in the plan.
}


def audit(plan: str, name: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BatchEvalPython" in plan:
        flags.append("ROW_PYTHON")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        # a partitioned spec leads with partition attrs (no ASC/DESC
        # marker on the first element); a global one starts straight
        # with an ordered column
        if re.match(r"^\s*\w+#\d+ (ASC|DESC)", args):
            if name not in _ALLOWED_GLOBAL_WINDOW:
                flags.append("GLOBAL_WINDOW")
            break
    return flags


def main() -> int:
    from kafkaconnect_spark.queries import QUERY_CATALOG
    from kafkaconnect_spark.session import get_spark

    only = sys.argv[1:]
    names = only or list(QUERY_CATALOG)
    unknown = [n for n in names if n not in QUERY_CATALOG]
    if unknown:
        print(f"error: unknown query name(s): {unknown}")
        return 2
    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    bad = 0
    for n in names:
        try:
            df = QUERY_CATALOG[n].fn(spark, sf)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {n}: {type(e).__name__}: {e}")
            bad += 1
            continue
        flags = audit(p, n)
        if flags:
            bad += 1
            print(f"FLAG {n}: {' '.join(flags)}")
        elif only:
            print(f"ok   {n}")
    print(f"\n{bad} flagged of {len(names)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Sketch aggregations — sub-linear state for 100 TB cardinality and
quantile questions (SURVEY §2.7 north-star mapping; no reference
citation by definition — the reference has no aggregations at all).

Why sketches are the scale path:

- exact count-distinct shuffles every distinct key; HyperLogLog++
  (`approx_count_distinct`) reduces each partition to a ~few-KB
  register set that merges associatively — constant state per group
  regardless of input size, one narrow exchange of sketch bytes.
- exact percentiles need a sort or a full value shuffle per group;
  `approx_percentile` (Greenwald-Khanna / T-digest style) keeps a
  bounded summary per partition and merges — again constant state.

Both are built-in Catalyst aggregates (JVM partial + merge), so they
pick up map-side partial aggregation automatically. Accuracy contracts
are tested against exact answers in tests/test_sketches.py; results
are approximate by design so the driver's oracle gate records the
rows-only check for the catalog query (the error-bound tests are the
real correctness statement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_cardinality_sketch(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group HLL++ distinct-count estimate (relative std dev
    ``rsd``) next to the group's row count. State per group is
    O(1/rsd²) registers, not O(distinct keys)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key_col, rsd=rsd).alias("approx_distinct"),
    )


def group_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles with bounded-error summaries
    (1/accuracy relative rank error)."""
    qs = F.percentile_approx(
        value_col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
    )
    out = df.groupBy(group_col).agg(qs.alias("__qs"))

    def _pname(q: float) -> str:
        # collision-safe: 0.975 → p97_5, not p98 (round() would collapse
        # 0.975/0.98 into duplicate column names and mislabel 0.999 as
        # the max)
        s = f"{q * 100:.10f}".rstrip("0").rstrip(".")
        return "p" + s.replace(".", "_")

    names = [_pname(q) for q in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantiles requested: {quantiles}")
    return out.select(
        group_col,
        *[F.col("__qs")[i].alias(n) for i, n in enumerate(names)],
    )

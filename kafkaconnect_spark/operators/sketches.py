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


def frequent_items_sketch(
    df: DataFrame,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """Distributed Misra–Gries heavy hitters: per-partition MG(k)
    summaries merged by summing counters and keeping the top-k —
    O(k) state per partition and one k-row-per-partition exchange,
    never a full groupBy of the key space.

    Guarantees (the sketch contract, partitioning-independent even
    though the counter VALUES are not): every key with true frequency
    > n/(k+1) is present, and each reported count lower-bounds the
    true count with error ≤ n/(k+1). Error bounds are asserted vs
    exact counts in tests/test_sketches.py; like the other sketches
    this is approximate by design, so it carries no value-hash oracle.

    Returns (key, min_count, n_total) — min_count is the MG
    lower-bound counter after the merge."""
    import pandas as pd

    col = df.select(F.col(key_col).cast("string").alias("k"))

    def partition_mg(batches):
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            for v in pdf["k"]:
                n += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step (dict comp, drop zeros)
                    counters = {c: m - 1 for c, m in counters.items() if m > 1}
        yield pd.DataFrame(
            {
                "k": list(counters) + ["\x00__n__"],
                "cnt": list(counters.values()) + [n],
            }
        )

    import pyspark.sql.types as T

    summaries = col.mapInPandas(
        partition_mg, T.StructType(
            [T.StructField("k", T.StringType()), T.StructField("cnt", T.LongType())]
        )
    )
    merged = summaries.groupBy("k").agg(F.sum("cnt").alias("cnt"))
    n_total = merged.where(F.col("k") == "\x00__n__")
    items = merged.where(F.col("k") != "\x00__n__")
    return (
        items.crossJoin(
            F.broadcast(n_total.select(F.col("cnt").alias("n_total")))
        )
        .orderBy(F.col("cnt").desc(), F.col("k").asc())
        .limit(k)
        .select(F.col("k").alias(key_col), F.col("cnt").alias("min_count"), "n_total")
    )

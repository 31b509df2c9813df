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
are tested against exact answers in tests/test_sketches.py. The KMV
estimators below are the DETERMINISTIC alternative (shared md5 hash64,
partitioning-independent bottom-k), which is why the sketch catalog
queries carry full value-hash oracles while HLL++/percentile_approx —
whose state is engine-internal — stay tests-only.
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
    summaries combined with the standard mergeable-summaries merge
    (Agarwal et al. 2013, "Mergeable Summaries", public): sum the
    counters key-wise, then subtract the (k+1)-th largest merged
    counter from every key and keep the strictly-positive ones. The
    subtraction is what preserves the single-summary error bound
    under merging — a bare top-k truncation of the summed counters
    can evict a barely-heavy key behind > k moderate ones.

    State is O(k) per partition and the exchange is ≤ k rows per
    partition — never a full groupBy of the key space. NULL keys are
    excluded up front (same convention as count(DISTINCT)); n_total
    counts non-null rows.

    Guarantees (partitioning-independent even though the counter
    VALUES are not): every key with true frequency > n/(k+1) is
    present, and each reported count lower-bounds the true count with
    error ≤ n/(k+1). Asserted vs exact counts in
    tests/test_sketches.py; approximate by design → no value-hash
    oracle.

    Returns (key, min_count, n_total) — min_count is the MG
    lower-bound counter after the merge."""
    import pandas as pd

    col = df.select(F.col(key_col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )

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
    # ≤ k·partitions rows total — persist so the offset pass and the
    # final filter don't re-run the sketch scan
    merged = merged.persist()
    n_total = merged.where(F.col("k") == "\x00__n__")
    items = merged.where(F.col("k") != "\x00__n__")
    # (k+1)-th largest merged counter = the merge-step offset
    # (control plane: k+1 counter VALUES, not data)
    top = items.select("cnt").orderBy(F.col("cnt").desc()).limit(k + 1).collect()
    offset = int(top[-1].cnt) if len(top) == k + 1 else 0
    out = (
        items.withColumn("cnt", F.col("cnt") - F.lit(offset))
        .where(F.col("cnt") > 0)  # ≤ k rows survive by construction
        .crossJoin(F.broadcast(n_total.select(F.col("cnt").alias("n_total"))))
        .select(
            F.col("k").alias(key_col), F.col("cnt").alias("min_count"), "n_total"
        )
    )
    from kafkaconnect_spark.operators.dedup import _track_cached

    return _track_cached(out, [merged])


def count_min_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Count-Min sketch counter table (Cormode & Muthukrishnan 2005,
    "An improved data stream summary: the count-min sketch and its
    applications", public): ``depth`` independent md5-derived hash
    rows of ``width`` counters each. The build is one explode (depth
    rows per input row) into a groupBy of BOUNDED cardinality
    (depth·width groups, e.g. 1024) — map-side combine collapses each
    partition to ≤ depth·width partial rows, so the exchange is
    constant-size regardless of input rows. This is the production
    artifact at 100 TB: a point-frequency estimate for ANY key from
    O(depth·width) integers, over-count-only error ≤ ε·n with
    ε = e/width at failure probability e^-depth.

    Deterministic (shared md5 hash64) → oracle-able, unlike
    engine-internal sketch registers. NULL keys excluded. Returns
    (depth, bucket, cnt)."""
    from kafkaconnect_spark.functions.text import hash64

    keyed = df.select(F.col(key_col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    # posexplode keeps (depth index, bucket) together in one pass
    pairs = keyed.select(
        F.posexplode(
            F.array(
                *[
                    (hash64(F.col("k"), f"{seed}{d}") % width)
                    for d in range(depth)
                ]
            )
        ).alias("depth", "bucket")
    )
    return pairs.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """Per-distinct-key CMS point estimates next to the exact counts —
    the sketch-accuracy AUDIT (the estimate-vs-truth comparison a
    pipeline runs at small scale to size width/depth before trusting
    the counters alone at 100 TB; it necessarily groups by key, same
    cost as the exact count it validates against — the production
    read path is count_min_counters + a constant-time probe).

    Returns (key, exact_count, cms_est); cms_est ≥ exact_count always
    (CMS never undercounts), asserted in tests/test_sketches.py."""
    from kafkaconnect_spark.functions.text import hash64

    counters = count_min_counters(df, key_col, depth, width, seed)
    keyed = df.select(F.col(key_col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    keys = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("exact_count"))
    kd = keys.select(
        "k",
        "exact_count",
        F.posexplode(
            F.array(
                *[(hash64(F.col("k"), f"{seed}{d}") % width) for d in range(depth)]
            )
        ).alias("depth", "bucket"),
    )
    return (
        kd.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy("k", "exact_count")
        .agg(F.min("cnt").alias("cms_est"))
        .select(F.col("k").alias(key_col), "exact_count", "cms_est")
    )


def _kmv_bottom_hashes(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    seed: str,
) -> DataFrame:
    """Per-group global bottom-k DISTINCT hash64 values — the shared
    substrate of the KMV estimators. Per-partition bottom-k partials
    (mapInPandas, O(k) state) bound the exchange to ≤ k rows per
    (group, partition); the union of per-partition bottom-ks contains
    the global bottom-k, so the window merge is exact. NULL keys
    excluded. Returns (g, h) with ≤ k rows per group."""
    import pandas as pd

    from kafkaconnect_spark.functions.text import hash64

    hashed = df.select(
        F.col(group_col).alias("g"),
        hash64(F.col(key_col).cast("string"), seed).alias("h"),
    ).where(F.col("h").isNotNull())

    def partial(batches):
        best: dict[object, set[int]] = {}
        for pdf in batches:
            for g, h in zip(pdf["g"], pdf["h"]):
                s = best.setdefault(g, set())
                s.add(int(h))
                if len(s) > 8 * k:  # amortized trim
                    best[g] = set(sorted(s)[:k])
        rows_g, rows_h = [], []
        for g, s in best.items():
            for h in sorted(s)[:k]:
                rows_g.append(g)
                rows_h.append(h)
        yield pd.DataFrame({"g": rows_g, "h": rows_h})

    import pyspark.sql.types as T

    g_type = df.schema[group_col].dataType
    partials = hashed.mapInPandas(
        partial,
        T.StructType(
            [T.StructField("g", g_type), T.StructField("h", T.LongType())]
        ),
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h")
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("g", "h")
    )


def _kmv_estimate(n_seen, kth, k: int):
    """KMV estimator as a Column: exact below k, else (k-1)/U(k) over
    the 2^60 hash space (all factors double-exact)."""
    space = float(2**60)
    return F.when(n_seen < k, n_seen).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(space) / kth.cast("double"))
        .cast("long")
    )


def kmv_set_overlap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """Pairwise set-overlap estimates between groups from their KMV
    sketches — the sketch-algebra payoff (Beyer et al. 2007, "On
    synopses for distinct-value estimation under multiset
    operations", public): for groups A, B the bottom-k of H(A)∪H(B)
    is computable from the two bottom-k sketches alone, |A∪B| follows
    from the KMV estimator on it, Jaccard ≈ ρ/|K| where ρ counts
    union-sketch members present in BOTH sketches (membership against
    a bottom-k sketch is exact for members of the union sketch), and
    |A∩B| ≈ J·|A∪B|. Everything derives from the shared md5 hash64 —
    deterministic across engines → value-hash oracle-able, unlike
    HLL intersection heuristics.

    Scale shape: sketches are ≤ k rows per group; the pair frame is
    group-cardinality², never data-sized. Returns one row per
    unordered group pair: (group_a, group_b, union_est, inter_est,
    jaccard_est)."""
    bottoms = _kmv_bottom_hashes(df, group_col, key_col, k, seed).persist()
    groups = bottoms.select(F.col("g")).distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .join(groups.select(F.col("g").alias("gb")))
        .where(F.col("ga") < F.col("gb"))
    )
    ua = pairs.join(bottoms, pairs.ga == bottoms.g).select(
        "ga", "gb", "h", F.lit(1).alias("__in_a"), F.lit(0).alias("__in_b")
    )
    ub = pairs.join(bottoms, pairs.gb == bottoms.g).select(
        "ga", "gb", "h", F.lit(0).alias("__in_a"), F.lit(1).alias("__in_b")
    )
    merged = (
        ua.unionByName(ub)
        .groupBy("ga", "gb", "h")
        .agg(F.max("__in_a").alias("__a"), F.max("__in_b").alias("__b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ga", "gb").orderBy("h")
    union_k = merged.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    agg = union_k.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("__n_seen"),
        F.max("h").alias("__kth"),
        F.sum((F.col("__a") * F.col("__b")).cast("long")).alias("__rho"),
    )
    union_est = _kmv_estimate(F.col("__n_seen"), F.col("__kth"), k)
    out = agg.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        union_est.alias("union_est"),
        F.round(
            F.col("__rho") * union_est.cast("double") / F.col("__n_seen")
        ).cast("long").alias("inter_est"),
        F.round(F.col("__rho") / F.col("__n_seen"), 6).alias("jaccard_est"),
    )
    from kafkaconnect_spark.operators.dedup import _track_cached

    return _track_cached(out, [bottoms])


def kmv_cardinality_sketch(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """Per-group K-Minimum-Values distinct-count sketch (Bar-Yossef
    et al. 2002, "Counting distinct elements in a data stream",
    public): keep the k smallest distinct 60-bit hashes per group;
    with U(k) the k-th smallest hash as a fraction of the hash space,
    estimate = (k-1) / U(k). Groups with fewer than k distinct hashes
    report the exact distinct count (the sketch is exact below k).

    Unlike HLL++ (group_cardinality_sketch) whose register layout is
    engine-internal, KMV over the shared md5 hash64 is DETERMINISTIC
    across engines, runs, and partitionings — so this estimator can
    carry a value-hash oracle; `approx_count_distinct` remains the
    built-in production alternative.

    Scale shape: a per-partition bottom-k partial (mapInPandas, O(k)
    state) bounds the exchange to ≤ k rows per (group, partition) —
    the global bottom-k of distinct hashes is contained in the union
    of per-partition bottom-ks, so the merge is exact. NULL keys are
    excluded (count(DISTINCT) convention).

    Returns (group, n_rows, kmv_distinct)."""
    bottom = _kmv_bottom_hashes(df, group_col, key_col, k, seed)
    sk = bottom.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth")
    )
    n_rows = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # hash space = 2^60 (15 hex chars); (k-1)·2^60 exceeds BIGINT so
    # the ratio is formed in double — exact: both factors are powers
    # of two times small ints
    space = float(2**60)
    est = F.when(F.col("n_seen") < k, F.col("n_seen")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(space) / F.col("kth").cast("double"))
        .cast("long")
    )
    return (
        n_rows.join(sk, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_rows",
            F.coalesce(est, F.lit(0)).cast("long").alias("kmv_distinct"),
        )
    )

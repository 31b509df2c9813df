"""Error-bound contracts for the sketch aggregations — the catalog
query for sketches takes the driver's rows-only check (approx values
are engine-specific), so THESE assertions are the correctness
statement: estimates must land within the configured bounds of the
exact answers on real testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkaconnect_spark.operators import sketches

@pytest.fixture()
def events(spark, sf_dir):
    from kafkaconnect_spark.queries import _events

    return _events(spark, sf_dir)


def test_hll_within_rsd(spark, events):
    est = {
        r[0]: r.approx_distinct
        for r in sketches.group_cardinality_sketch(
            events, "event_type", "user_id", rsd=0.02
        ).collect()
    }
    exact = {
        r[0]: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        # 5 sigma of the configured 2% rsd
        assert abs(est[k] - n) <= max(1, 0.1 * n), (k, est[k], n)


def test_quantile_sketch_rank_error(spark, events):
    approx = {
        r[0]: (r.p50, r.p95)
        for r in sketches.group_quantile_sketch(
            events, "event_type", "value", quantiles=(0.5, 0.95)
        ).collect()
    }
    for etype, (p50, p95) in approx.items():
        vals = sorted(
            r.value
            for r in events.where(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)

        def rank_of(v):
            import bisect

            return bisect.bisect_right(vals, v) / n

        # percentile_approx guarantees rank error <= 1/accuracy; allow
        # slack for duplicate-value plateaus on small groups
        assert 0.5 - 0.02 <= rank_of(p50) and rank_of(p50 - 1e-9) <= 0.5 + 0.02
        assert 0.95 - 0.02 <= rank_of(p95) and rank_of(p95 - 1e-9) <= 0.95 + 0.02


def test_quantile_column_names_are_collision_safe(spark):
    from kafkaconnect_spark.operators.sketches import group_quantile_sketch

    df = spark.createDataFrame([("a", float(i)) for i in range(100)], "g string, v double")
    out = group_quantile_sketch(df, "g", "v", quantiles=(0.975, 0.98, 0.999))
    assert out.columns == ["g", "p97_5", "p98", "p99_9"]
    import pytest

    with pytest.raises(ValueError):
        group_quantile_sketch(df, "g", "v", quantiles=(0.5, 0.5))


def test_minhash_banding_validation():
    import pytest

    from kafkaconnect_spark.operators.dedup import _check_banding

    _check_banding(16, 4)
    with pytest.raises(ValueError):
        _check_banding(4, 8)   # rows-per-band 0 → all docs collide
    with pytest.raises(ValueError):
        _check_banding(18, 4)  # remainder silently dropped


def test_frequent_items_guarantees(spark):
    """MG contract with the mergeable-summaries merge (sum, subtract
    the (k+1)-th largest, keep positive): every key above n/(k+1)
    reported; counts lower-bound truth within n/(k+1) — the SINGLE-
    summary bound, independent of partitioning."""
    import random

    from kafkaconnect_spark.operators.sketches import frequent_items_sketch

    rng = random.Random(7)
    # skewed stream: two heavy keys + a long tail
    vals = (["hot1"] * 4000 + ["hot2"] * 2500
            + [f"t{rng.randrange(500)}" for _ in range(3500)])
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "key STRING")
    exact = {r.key: r.n for r in df.groupBy("key").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    n, k = len(vals), 32
    bound = n / (k + 1)
    for parts in (1, 7):
        out = frequent_items_sketch(df.repartition(parts), "key", k=k).collect()
        assert len(out) <= k
        got = {r.key: r.min_count for r in out}
        # heavy keys must be present
        assert "hot1" in got and "hot2" in got
        for key, cnt in got.items():
            assert cnt <= exact[key]                   # lower bound
            assert exact[key] - cnt <= bound + 1e-9    # merged ≤ n/(k+1)
        # every key above the threshold appears — partitioning-free
        for key, true_n in exact.items():
            if true_n > bound:
                assert key in got, key


def test_frequent_items_null_keys_excluded(spark):
    from kafkaconnect_spark.operators.sketches import frequent_items_sketch

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], "key STRING"
    )
    out = frequent_items_sketch(df, "key", k=4).collect()
    keys = {r.key for r in out}
    assert None not in keys
    assert all(r.n_total == 3 for r in out)  # non-null rows only


def test_kmv_cardinality(spark):
    """KMV contract: exact below k; within ~3/sqrt(k) relative error
    above k; deterministic under repartitioning; nulls excluded."""
    from kafkaconnect_spark.operators.sketches import kmv_cardinality_sketch

    rows = [("small", f"s{i % 37}") for i in range(500)]
    rows += [("big", f"b{i}") for i in range(20000)]
    rows += [("nulls", None)] * 10
    df = spark.createDataFrame(rows, "g STRING, key STRING")
    k = 256
    for parts in (1, 13):
        got = {
            r.g: (r.n_rows, r.kmv_distinct)
            for r in kmv_cardinality_sketch(
                df.repartition(parts), "g", "key", k=k
            ).collect()
        }
        assert got["small"] == (500, 37)          # exact below k
        assert got["nulls"] == (10, 0)            # nulls excluded
        n_rows, est = got["big"]
        assert n_rows == 20000
        assert abs(est - 20000) <= 3 / (k ** 0.5) * 20000  # ~3σ
    # determinism across partitionings
    a = kmv_cardinality_sketch(df.repartition(1), "g", "key", k=k).collect()
    b = kmv_cardinality_sketch(df.repartition(13), "g", "key", k=k).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_set_overlap_accuracy_and_determinism(spark):
    """Known ground truth: A = 0..9999, B = 5000..14999 ->
    |A∪B| = 15000, |A∩B| = 5000, J = 1/3. Estimates must land within
    ~3/sqrt(k) and be identical across partitionings."""
    from kafkaconnect_spark.operators.sketches import kmv_set_overlap

    rows = [("A", i) for i in range(10000)] + [("B", i) for i in range(5000, 15000)]
    df = spark.createDataFrame(rows, "g STRING, key LONG")
    k = 256
    tol = 3 / (k ** 0.5)
    outs = []
    for parts in (1, 9):
        out = kmv_set_overlap(df.repartition(parts), "g", "key", k=k).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.group_a, r.group_b) == ("A", "B")
        assert abs(r.union_est - 15000) <= tol * 15000
        assert abs(r.inter_est - 5000) <= 2 * tol * 15000  # J and U errors compound
        assert abs(r.jaccard_est - 1 / 3) <= 2 * tol
        outs.append(sorted(map(tuple, out)))
    assert outs[0] == outs[1]


def test_count_min_never_undercounts_and_is_deterministic(spark):
    """CMS contract (Cormode & Muthukrishnan 2005): est >= exact for
    every key, exact for collision-free keys, error <= ~e/width * n in
    expectation, and bit-identical across partitionings (md5 hashes,
    no RNG)."""
    from kafkaconnect_spark.operators.sketches import (
        count_min_counters,
        count_min_estimates,
    )

    rows = [("hot", None)] * 500 + [(f"k{i}", None) for i in range(300)]
    df = spark.createDataFrame(rows, "key STRING, pad STRING")
    outs = []
    for parts in (1, 7):
        est = count_min_estimates(df.repartition(parts), "key", width=64)
        got = {r.key: (r.exact_count, r.cms_est) for r in est.collect()}
        assert got["hot"][0] == 500
        for key, (exact, cms) in got.items():
            assert cms >= exact, (key, exact, cms)
        # CMS bound: P[overcount > e*n/width] <= e^-depth per key;
        # with n=800, width=64 that's ~34 — allow the rare 2x outlier,
        # and the MEAN overcount should sit well under n/width (12.5)
        overs = [c - e for e, c in got.values()]
        assert max(overs) <= 2 * 2.718 * 800 / 64
        assert sum(overs) / len(overs) <= 800 / 64
        outs.append(sorted(got.items()))
    assert outs[0] == outs[1]
    # counter table is bounded by depth x width regardless of input
    counters = count_min_counters(df, "key", depth=4, width=64)
    assert counters.count() <= 4 * 64
    total = counters.groupBy("depth").sum("cnt").collect()
    assert all(r["sum(cnt)"] == 800 for r in total)  # each row sees every key


def test_count_min_null_keys_excluded(spark):
    from kafkaconnect_spark.operators.sketches import count_min_estimates

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "key STRING"
    )
    got = {r.key: r.exact_count for r in count_min_estimates(df, "key").collect()}
    assert got == {"a": 2}

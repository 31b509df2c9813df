"""Partitioned-layout contracts: one file per partition directory,
partition pruning visible in the physical plan, and clustered files
carrying tight row-group bounds."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkaconnect_spark.operators import layout
from kafkaconnect_spark.queries import _events


def test_partitioned_write_prunes_and_compacts(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    layout.write_partitioned(ev, path, ["event_type"], cluster_by=["value"])

    dirs = [d for d in os.listdir(path) if d.startswith("event_type=")]
    assert len(dirs) == ev.select("event_type").distinct().count()
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"small-file explosion in {d}: {len(files)}"

    back = layout.read_pruned(spark, path).where(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == ev.where(F.col("event_type") == "click").count()

    # round-trip fidelity: hash of the full content matches
    a = ev.selectExpr("sum(hash(event_id, event_type, cast(value as string)))").first()[0]
    b = (
        layout.read_pruned(spark, path)
        .selectExpr("sum(hash(event_id, event_type, cast(value as string)))")
        .first()[0]
    )
    assert a == b


def test_merge_into_partitioned_cdc(spark, tmp_path):
    from pyspark.sql import Row

    path = str(tmp_path / "lake")
    t0 = spark.createDataFrame(
        [
            Row(k=1, v="a", ver=1, day="d1"),
            Row(k=2, v="b", ver=1, day="d1"),
            Row(k=3, v="c", ver=1, day="d2"),
            Row(k=4, v="d", ver=1, day="d3"),
        ]
    )
    layout.merge_into_partitioned(spark, t0, path, ["k"], "day", "ver")

    untouched_before = sorted(os.listdir(os.path.join(path, "day=d3")))

    batch = spark.createDataFrame(
        [
            Row(k=1, v="a2", ver=2, day="d1", dead=False),   # update
            Row(k=2, v="b", ver=2, day="d1", dead=True),     # delete
            Row(k=5, v="e", ver=1, day="d4", dead=False),    # new partition
        ]
    )
    layout.merge_into_partitioned(
        spark, batch, path, ["k"], "day", "ver", delete_col="dead"
    )

    state = {r.k: (r.v, r.day) for r in spark.read.parquet(path).collect()}
    assert state == {1: ("a2", "d1"), 3: ("c", "d2"), 4: ("d", "d3"), 5: ("e", "d4")}
    # untouched partition's files were not rewritten (dynamic overwrite)
    assert sorted(os.listdir(os.path.join(path, "day=d3"))) == untouched_before

    # idempotent replay converges to the same state
    layout.merge_into_partitioned(
        spark, batch, path, ["k"], "day", "ver", delete_col="dead"
    )
    state2 = {r.k: (r.v, r.day) for r in spark.read.parquet(path).collect()}
    assert state2 == state


def test_merge_partition_emptying_delete(spark, tmp_path):
    from pyspark.sql import Row

    path = str(tmp_path / "lake2")
    layout.merge_into_partitioned(
        spark,
        spark.createDataFrame([Row(k=1, v="a", ver=1, day="d1"), Row(k=3, v="c", ver=1, day="d2")]),
        path, ["k"], "day", "ver",
    )
    # delete the ONLY row of d2 — the partition must actually empty
    layout.merge_into_partitioned(
        spark,
        spark.createDataFrame([Row(k=3, v="c", ver=2, day="d2", dead=True)]),
        path, ["k"], "day", "ver", delete_col="dead",
    )
    assert {r.k for r in spark.read.parquet(path).collect()} == {1}


def test_merge_same_order_ties_deterministic(spark, tmp_path):
    from pyspark.sql import Row

    path = str(tmp_path / "lake3")
    batch = spark.createDataFrame(
        [Row(k=1, v="x", ver=5, day="d1"), Row(k=1, v="y", ver=5, day="d1")]
    )
    layout.merge_into_partitioned(spark, batch, path, ["k"], "day", "ver")
    first = spark.read.parquet(path).collect()
    assert len(first) == 1 and first[0].v == "y"  # max of remaining cols wins
    # replay converges
    layout.merge_into_partitioned(spark, batch, path, ["k"], "day", "ver")
    again = spark.read.parquet(path).collect()
    assert len(again) == 1 and again[0].v == "y"


def test_merge_randomized_model_check(spark, tmp_path):
    """Model-based check: random CDC batches applied to the lake and to
    a plain dict model must agree on final state. Partition is a stable
    function of the key (the documented contract)."""
    import random

    from pyspark.sql import Row

    rng = random.Random(99)
    path = str(tmp_path / "lake_rand")
    model: dict[int, tuple] = {}
    ver = 0
    for _ in range(6):
        batch = []
        for _ in range(30):
            ver += 1
            k = rng.randrange(25)
            day = f"d{k % 4}"  # stable key→partition mapping
            if rng.random() < 0.2 and k in model:
                batch.append(Row(k=k, v=None, ver=ver, day=day, dead=True))
                model.pop(k, None)
            else:
                v = f"v{ver}"
                batch.append(Row(k=k, v=v, ver=ver, day=day, dead=False))
                model[k] = (v, day)
        layout.merge_into_partitioned(
            spark,
            spark.createDataFrame(batch),
            path,
            ["k"],
            "day",
            "ver",
            delete_col="dead",
        )
    got = {r.k: (r.v, r.day) for r in spark.read.parquet(path).collect()}
    assert got == model


def test_zorder_code_matches_python_interleave(spark):
    from kafkaconnect_spark.operators.layout import zorder_code

    def ref(a, b, bits=10):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(a, b) for a in (0, 1, 5, 511, 1023) for b in (0, 2, 7, 1000)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_code(["a", "b"], bits=10)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == ref(a, b)
    # locality: a at even bit positions, b at odd — (0,0),(1,0) are
    # codes 0,1; b=2 sets bit 3 so (0,2),(1,2) are codes 8,9
    assert sorted(got[p] for p in [(0, 0), (1, 0), (0, 2), (1, 2)]) == [0, 1, 8, 9]


def test_write_zordered_tightens_rowgroup_bounds(spark, tmp_path):
    """Z-ordered files must have small per-file spans in BOTH
    dimensions; a single-column sort leaves the other dimension's
    span at full range in every file."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from kafkaconnect_spark.operators.layout import write_zordered

    side = 64  # 64x64 grid
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(grid, zpath, ["x", "y"], bits=6, num_files=16)

    import glob as g

    spans_x, spans_y = [], []
    for f in g.glob(zpath + "/*.parquet"):
        md = pq.read_metadata(f)
        mins = {"x": [], "y": []}
        maxs = {"x": [], "y": []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        if mins["x"]:
            spans_x.append(max(maxs["x"]) - min(mins["x"]))
            spans_y.append(max(maxs["y"]) - min(mins["y"]))
    # 16 files over a 64x64 grid → each file covers a ~16x16 z-block:
    # both dimensions' spans must be far below the full range (63)
    assert spans_x and max(spans_x) <= 32 and max(spans_y) <= 32
    # round-trip completeness
    assert spark.read.parquet(zpath).count() == side * side


def test_bloom_filter_write_is_real_and_readable(spark, tmp_path):
    """The bloom filters must physically land in the files (this
    container's pyarrow/duckdb predate footer bloom introspection, so
    the check is the on-disk byte delta of an identical write with
    blooms off — ndv=100k split-block blooms are ~100KB+ per row
    group) and the data must read back identically, including under
    the equality predicate blooms accelerate."""
    import pathlib

    from kafkaconnect_spark.operators.layout import write_with_bloom_filters

    # HIGH-cardinality key: parquet-mr correctly OMITS the bloom when
    # a column is fully dictionary-encoded (the dictionary already
    # answers point lookups exactly), so the fixture must blow the 1MB
    # dictionary budget — md5 strings do
    df = spark.range(0, 60_000).selectExpr(
        "id", "md5(cast(id as string)) AS user_key"
    ).coalesce(1)
    dest = str(tmp_path / "bloomed")
    plain = str(tmp_path / "plain")
    write_with_bloom_filters(df, dest, ["user_key"], ndv=100_000)
    df.write.mode("overwrite").parquet(plain)

    def pq_bytes(d):
        return sum(
            p.stat().st_size for p in pathlib.Path(d).glob("*.parquet")
        )

    assert pq_bytes(dest) > pq_bytes(plain) + 50_000, (
        pq_bytes(dest), pq_bytes(plain),
    )

    back = spark.read.parquet(dest)
    assert back.count() == 60_000
    probe = "md5('123')"
    assert (
        back.where(f"user_key = {probe}").count()
        == df.where(f"user_key = {probe}").count()
        == 1
    )

"""Streaming == batch equivalence for the windowed/stateful operators,
driven as real Structured Streaming queries (file stream source,
availableNow trigger, memory sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkaconnect_spark.queries import _events
from kafkaconnect_spark.streaming.windows import (
    interval_attribution_join,
    sliding_event_counts,
    running_user_stats,
    session_window_stats,
    tumbling_event_counts,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Events re-materialized as micro-batch-sized parquet files with a
    plain microsecond timestamp (stream sources can't use the runtime
    nanos conf trick mid-plan)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = _events(spark, "/root/testdata/sf0.001")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, d):
    batch = spark.read.parquet(d)
    return spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(d)


def run_to_memory(spark, df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def as_set(df):
    return {tuple(r) for r in df.collect()}


# replayed files are not time-ordered, so equivalence needs a
# watermark wider than the dataset span (watermark = allowed lateness)
FULL_SPAN = "1000 hours"


def test_tumbling_stream_equals_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    expected = as_set(tumbling_event_counts(batch))
    got = run_to_memory(
        spark,
        tumbling_event_counts(_stream(spark, events_stream_dir), watermark=FULL_SPAN),
        "tumbling_out",
        "complete",
    )
    assert as_set(got) == expected and len(expected) > 0


def test_sliding_stream_equals_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    expected = as_set(sliding_event_counts(batch))
    got = run_to_memory(
        spark,
        sliding_event_counts(_stream(spark, events_stream_dir), watermark=FULL_SPAN),
        "sliding_out",
        "complete",
    )
    assert as_set(got) == expected and len(expected) > 0
    # each event expands into exactly window/slide = 4 windows
    n_events = batch.count()
    assert sum(r.n_events for r in got.collect()) == 4 * n_events


def test_session_window_stream_equals_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    expected = as_set(session_window_stats(batch))
    got = run_to_memory(
        spark,
        session_window_stats(_stream(spark, events_stream_dir), watermark=FULL_SPAN),
        "session_out",
        "complete",
    )
    assert as_set(got) == expected and len(expected) > 0


def test_session_watermark_drops_late_events(spark, events_stream_dir):
    """With a tight watermark and unordered replay, late events ARE
    dropped — the documented late-data semantics, observed."""
    batch = spark.read.parquet(events_stream_dir)
    full = session_window_stats(batch).count()
    got = run_to_memory(
        spark,
        session_window_stats(_stream(spark, events_stream_dir), watermark="2 hours"),
        "session_late_out",
        "complete",
    )
    assert got.count() < full


def test_interval_join_stream_equals_batch(spark, events_stream_dir):
    """Stream-stream watermarked interval join (purchase attributed to
    the user's clicks in the preceding hour) must emit exactly the
    batch range-join rows once every file is replayed."""
    batch = spark.read.parquet(events_stream_dir)
    b_clicks = batch.where(F.col("event_type") == "click")
    b_purch = batch.where(F.col("event_type") == "purchase")
    expected = as_set(interval_attribution_join(b_clicks, b_purch))
    s_clicks = _stream(spark, events_stream_dir).where(F.col("event_type") == "click")
    s_purch = _stream(spark, events_stream_dir).where(F.col("event_type") == "purchase")
    got = run_to_memory(
        spark,
        interval_attribution_join(s_clicks, s_purch, watermark=FULL_SPAN),
        "interval_join_out",
        "append",
    )
    assert as_set(got) == expected and len(expected) > 0


def test_running_user_stats_stateful(spark, events_stream_dir):
    """applyInPandasWithState: final emitted state per user must equal
    the batch aggregate (update mode emits one row per key per batch —
    take the last)."""
    batch = spark.read.parquet(events_stream_dir)
    expected = {
        (r.user_id, r.n)
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = run_to_memory(
        spark,
        running_user_stats(_stream(spark, events_stream_dir)),
        "user_stats_out",
        "update",
    )
    import pandas as pd

    pdf = out.toPandas()
    last = pdf.groupby("user_id").last().reset_index()
    got = {(int(r.user_id), int(r.n_events)) for r in last.itertuples()}
    assert got == expected
    # running totals match the batch sum too (rounded)
    sums = {
        r.user_id: float(r.s)
        for r in batch.groupBy("user_id")
        .agg(F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("s"))
        .collect()
    }
    for r in last.itertuples():
        assert abs(float(r.total_value) - sums[int(r.user_id)]) < 0.05


def test_dedup_within_watermark_drops_redelivery(spark, events_stream_dir, tmp_path):
    from kafkaconnect_spark.streaming.windows import dedup_within_watermark

    # re-deliver every file twice (at-least-once source retry)
    dup_dir = str(tmp_path / "dup")
    batch = spark.read.parquet(events_stream_dir)
    batch.write.mode("overwrite").parquet(dup_dir)
    batch.write.mode("append").parquet(dup_dir)

    stream = _stream(spark, dup_dir)
    got = run_to_memory(
        spark, dedup_within_watermark(stream, watermark=FULL_SPAN), "dedup_wm", "append"
    )
    assert got.count() == batch.count()  # every duplicate dropped
    assert as_set(got.select("event_id")) == as_set(batch.select("event_id"))


def test_stream_static_enrichment_equals_batch(spark, events_stream_dir):
    from kafkaconnect_spark.streaming.windows import enrich_with_dimension

    dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    batch = spark.read.parquet(events_stream_dir)
    expected = as_set(
        enrich_with_dimension(batch, dim, dim_cols=["c_mktsegment"])
        .groupBy("c_mktsegment").count()
    )
    stream = _stream(spark, events_stream_dir)
    got = run_to_memory(
        spark,
        enrich_with_dimension(stream, dim, dim_cols=["c_mktsegment"]),
        "enrich_dim",
        "append",
    )
    assert as_set(got.groupBy("c_mktsegment").count()) == expected


def test_running_user_stats_transform_with_state(spark, events_stream_dir):
    """Spark 4 transformWithState twin: final emitted state per user
    equals the batch aggregate (and the applyInPandasWithState
    implementation). Needs the RocksDB state store provider."""
    from kafkaconnect_spark.streaming.windows import (
        HAS_TRANSFORM_WITH_STATE,
        running_user_stats_tws,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        pytest.skip("transformWithState needs Spark >= 4.0 and google.protobuf")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = run_to_memory(
            spark,
            running_user_stats_tws(_stream(spark, events_stream_dir)),
            "user_stats_tws_out",
            "update",
        )
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    batch = spark.read.parquet(events_stream_dir)
    expected = {
        (r.user_id, r.n)
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    pdf = out.toPandas()
    # n_events is monotone per user — the max row is the final state
    last = pdf.loc[pdf.groupby("user_id")["n_events"].idxmax()]
    got = {(int(r.user_id), int(r.n_events)) for r in last.itertuples()}
    assert got == expected
    sums = {
        r.user_id: float(r.s)
        for r in batch.groupBy("user_id")
        .agg(F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("s"))
        .collect()
    }
    for r in last.itertuples():
        assert abs(float(r.total_value) - sums[int(r.user_id)]) < 0.05


def test_outer_interval_join_stream_equals_batch(spark, events_stream_dir):
    """Outer interval join: the attributed subset must match batch
    exactly. The NULL (unattributed) rows are watermark-gated in
    streaming — Structured Streaming emits them only when the
    watermark passes a row's join-window expiry, and with allowed
    lateness spanning the dataset the stream ends first. That is the
    documented contract (state not silently dropped, nulls deferred),
    so the stream assertion covers the attributed subset and the
    batch twin pins the full outer semantics."""
    from kafkaconnect_spark.streaming.windows import interval_attribution_join_outer

    batch = spark.read.parquet(events_stream_dir)
    clicks = batch.where(F.col("event_type") == "click")
    purchases = batch.where(F.col("event_type") == "purchase")
    full = interval_attribution_join_outer(clicks, purchases).collect()
    # batch twin: outer semantics fire — both attributed and not
    assert any(r.click_ts is None for r in full)
    assert any(r.click_ts is not None for r in full)
    expected_attributed = {tuple(r) for r in full if r.click_ts is not None}

    got = run_to_memory(
        spark,
        interval_attribution_join_outer(
            _stream(spark, events_stream_dir).where(F.col("event_type") == "click"),
            _stream(spark, events_stream_dir).where(F.col("event_type") == "purchase"),
            watermark=FULL_SPAN,
        ),
        "outer_interval_out",
        "append",
    )
    got_rows = got.collect()
    got_attributed = {tuple(r) for r in got_rows if r.click_ts is not None}
    assert got_attributed == expected_attributed and len(expected_attributed) > 0
    # no spurious nulls before watermark expiry
    assert all(r.click_ts is not None for r in got_rows)


def test_windowed_kmv_distinct_stream_equals_batch_sketch(spark, events_stream_dir):
    """The streaming KMV windowed-distinct must produce EXACTLY the
    batch sketch's numbers per window — k=8 forces the estimation
    path (per-hour distinct users exceed k), so this pins the shared
    estimator arithmetic, not just plumbing. Update-mode estimates
    are monotone nondecreasing, so the final value per window is the
    max. (k=3: per-hour distinct peaks at 6 on this data.)"""
    from kafkaconnect_spark.operators.sketches import kmv_cardinality_sketch
    from kafkaconnect_spark.streaming.windows import windowed_kmv_distinct

    k = 3  # max per-hour distinct is 6 at sf0.001 -> estimation fires
    out = run_to_memory(
        spark,
        windowed_kmv_distinct(_stream(spark, events_stream_dir), k=k),
        "kmv_windows",
        "update",
    )
    got = {
        r.window_start: r.m
        for r in out.groupBy("window_start")
        .agg(F.max("kmv_distinct").alias("m"))
        .collect()
    }
    ev = spark.read.parquet(events_stream_dir)
    b = ev.select(
        F.window("ts", "1 hour").alias("__w"), "user_id"
    ).select(F.col("__w.start").alias("ws"), "user_id")
    want = {
        r.ws: r.kmv_distinct
        for r in kmv_cardinality_sketch(b, "ws", "user_id", k=k).collect()
    }
    assert got == want
    # sanity: the estimation path actually fired somewhere
    exact = {r.ws: r.n for r in b.groupBy("ws").agg(
        F.countDistinct("user_id").alias("n")).collect()}
    assert any(exact[w] > k for w in exact)


def test_watermark_late_drop_replay_matches_real_stream(
    spark, tmp_path_factory
):
    """The batch micro-batch watermark replay (queries_r3b.
    watermark_late_flags) must predict EXACTLY which rows a real
    `withWatermark + dropDuplicates` stream drops, when the stream's
    micro-batches are the replay's blocks: one parquet file per
    100-event block, maxFilesPerTrigger=1, availableNow."""
    import glob
    import os
    import shutil

    from kafkaconnect_spark.queries import _events
    from kafkaconnect_spark.queries_r3b import watermark_late_flags

    ev = (
        _events(spark, "/root/testdata/sf0.001")
        .select("event_id", "ts", "event_type", "user_id")
        .withColumn(
            # the delayed-arrival cohort from events_watermark_late_drop,
            # scaled to the 100-row blocks of this fixture
            "arr",
            F.expr("event_id div 100")
            + F.when(F.col("user_id") % 20 == 0, F.lit(3)).otherwise(F.lit(0)),
        )
    )
    d = str(tmp_path_factory.mktemp("wm_blocks"))
    tmp = str(tmp_path_factory.mktemp("wm_stage"))
    block_rows, delay_us = 100, 600_000_000
    n_blocks = ev.agg(F.max("arr")).first()[0] + 1
    for b in range(n_blocks):
        stage = os.path.join(tmp, f"b{b}")
        ev.where(F.col("arr") == b).drop("arr").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        # sequential copy => strictly increasing mtimes => the file
        # stream source replays blocks in id order
        shutil.copy(part, os.path.join(d, f"block{b:04d}.parquet"))

    batch = spark.read.parquet(d)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_survivors")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    survived = {r.event_id for r in spark.table("wm_survivors").collect()}

    flagged = watermark_late_flags(
        ev, block_rows=block_rows, delay_us=delay_us, arrival_block_col="arr"
    )
    expected = {
        r.event_id for r in flagged.where(~F.col("__late")).collect()
    }
    dropped_expected = {
        r.event_id for r in flagged.where(F.col("__late")).collect()
    }
    assert dropped_expected, "fixture must actually contain late rows"
    assert survived == expected


def test_watermark_late_flags_matches_python_reference(spark):
    """Property-style check on randomized streams: the Spark replay's
    row-level late set must equal a direct Python simulation of
    Structured Streaming's rule (watermark entering block b =
    max event time over blocks < b, minus delay; late iff strictly
    older). Uses a seeded RNG grid instead of hypothesis (a Spark job
    per example is too slow for shrinking)."""
    import datetime
    import random

    from kafkaconnect_spark.queries_r3b import watermark_late_flags

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for i in range(400):
            # event time wanders around arrival order with heavy jitter
            ts = base + datetime.timedelta(
                seconds=i * 30 + rng.randint(-900, 900)
            )
            rows.append((i, ts))
        block_rows, delay_us = 50, 120_000_000  # 2-minute watermark
        # python reference
        blocks: dict[int, list] = {}
        for i, ts in rows:
            blocks.setdefault(i // block_rows, []).append((i, ts))
        expected_late = set()
        running_max = None
        for b in sorted(blocks):
            wm = (
                None
                if running_max is None
                else running_max - datetime.timedelta(microseconds=delay_us)
            )
            for i, ts in blocks[b]:
                if wm is not None and ts < wm:
                    expected_late.add(i)
            block_max = max(ts for _i, ts in blocks[b])
            running_max = (
                block_max if running_max is None else max(running_max, block_max)
            )
        df = spark.createDataFrame(rows, "event_id LONG, ts TIMESTAMP")
        flagged = watermark_late_flags(
            df, block_rows=block_rows, delay_us=delay_us
        )
        got_late = {r.event_id for r in flagged.where(F.col("__late")).collect()}
        assert got_late == expected_late, seed
        assert expected_late, f"seed {seed} produced no late rows"

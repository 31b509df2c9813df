"""Streaming analytics operators — watermarked windows + custom state.

The reference has no windowed/stateful query surface (SURVEY §2.7);
these are the Spark-native streaming shapes the north star adds. Each
has a batch twin in queries.py whose DuckDB oracle pins the semantics;
tests assert stream (availableNow) == batch on the same data.

Scale notes:
- Tumbling windows: partial aggregation happens map-side per
  micro-batch; state store holds one row per (window, key) — bounded
  by watermark eviction, so 100 TB/day with a 2 h watermark keeps
  state at O(keys × windows-in-watermark), not O(events).
- Session windows: built-in ``session_window`` (Spark ≥3.2) merges
  per-key intervals in the state store — no per-event state.
- ``running_user_stats`` shows the applyInPandasWithState escape
  hatch for semantics the built-ins can't express (per-key running
  aggregates with inactivity timeout): Arrow-batched, state is one
  small dict per key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sliding_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping-window counts + value sums per event_type (each
    event lands in window/slide windows; 1 h / 15 min → 4). Works on a
    stream or batch DataFrame — the streaming form is the watermarked
    sliding agg; the batch form is what the DuckDB oracle replays via
    an explicit slot expansion. The ×4 row expansion happens JVM-side
    inside the window operator BEFORE the keyed exchange, and map-side
    partial aggregation collapses it back to one row per (window,
    type) per task — so the shuffle carries agg states, not the
    expanded events."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window, slide).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value"), 2).cast(T.DecimalType(18, 2))
            ).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Hourly tumbling counts + value sums per event_type with late-data
    tolerance = watermark. Works on a stream or batch DataFrame."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value"), 2).cast(T.DecimalType(18, 2))
            ).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows with an inactivity gap — the built-in
    state-store path (merging intervals, no per-event state)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def interval_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``lookback`` — the attribution
    shape. Works on two streams (watermarked inner join; the
    event-time bound on both sides lets the state store evict matched
    rows, so state is O(events in watermark), not O(stream)) or on
    two batch DataFrames (plain range join) for the oracle twin.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col(ts_col).alias("click_ts")
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
        "inner",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )


def interval_attribution_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits —
    unattributed ones with NULL click columns, once the watermark
    proves no matching click can still arrive (Structured Streaming
    emits outer-join nulls only at watermark expiry; that's the
    correctness contract, not a latency bug). Same state eviction
    bound as the inner form. Batch twin: a plain left range join."""
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col(ts_col).alias("click_ts")
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
        "left_outer",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_ts",
        "purchase_value",
        F.col("click_ts").isNotNull().alias("attributed"),
    )


_USER_STATS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_USER_STATS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _user_stats_fn_factory(inactivity_timeout_ms: int | None):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        if inactivity_timeout_ms:
            state.setTimeoutDuration(inactivity_timeout_ms)  # evict idle keys
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return _fn


def running_user_stats(
    events: DataFrame, inactivity_timeout_ms: int | None = None
) -> DataFrame:
    """Custom stateful operator: running per-user event count + value
    total, emitted every micro-batch (applyInPandasWithState). This is
    the pattern for operators Spark's built-ins can't express.

    State is otherwise unbounded (one entry per user ever seen) — a
    CONTINUOUS deployment should pass ``inactivity_timeout_ms`` to
    evict idle keys via ProcessingTimeTimeout. The default stays
    NoTimeout because processing-time timeouts don't terminate under
    the availableNow trigger batch jobs and tests use."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if inactivity_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn_factory(inactivity_timeout_ms),
            outputStructType=_USER_STATS_OUT,
            stateStructType=_USER_STATS_STATE,
            outputMode="update",
            timeoutConf=conf,
        )
    )


try:  # Spark ≥4.0: the transformWithState successor API. Its state
    # client talks protobuf to the JVM, so a usable google.protobuf is
    # part of the availability probe (some minimal images ship pyspark
    # without it — the operator must degrade to NotImplementedError,
    # not crash the streaming query at runtime).
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover — older Spark or no protobuf
    HAS_TRANSFORM_WITH_STATE = False
    StatefulProcessor = object  # type: ignore[assignment,misc]


def running_user_stats_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """``running_user_stats`` on the Spark 4 ``transformWithState``
    API — same output contract, but state is a NAMED, TYPED ValueState
    with first-class TTL (``ttl_ms``) instead of a processing-time
    timeout dance, which is the right eviction story for a continuous
    100 TB/day deployment (idle keys age out of RocksDB without the
    processor ever seeing them again).

    Requires the RocksDB state store provider:
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    """
    if not HAS_TRANSFORM_WITH_STATE:  # pragma: no cover
        raise NotImplementedError("transformWithState requires Spark >= 4.0")

    # Defined INSIDE the function on purpose: Spark's transformWithState
    # driver worker is a separate Python process that can't import this
    # package; a nested class makes cloudpickle serialize it by VALUE,
    # so the worker needs only pyspark+pandas.
    class _Processor(StatefulProcessor):
        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._st = handle.getValueState(
                "agg", "n LONG, total DOUBLE", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._st.get() if self._st.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._st.update((int(n), float(total)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_Processor(),
            outputStructType=_USER_STATS_OUT,
            outputMode="Update",
            # TTL state REQUIRES a time mode — Spark rejects
            # ttlDurationMs under NoTime at query start
            timeMode="ProcessingTime" if ttl_ms else "None",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same logical
    event (at-least-once sources re-send on retry — reference behavior
    for every Connect source, SURVEY §2.6 O1).

    Streaming path uses ``dropDuplicatesWithinWatermark`` so the
    dedup state is evicted once the watermark passes — state stays
    O(events per watermark window), not O(stream history). Batch twin
    is a plain ``dropDuplicates`` (same result set when all data is in
    one batch)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on: tuple[str, str] = ("user_id", "c_custkey"),
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment join: a streaming fact joined to a
    batch dimension. The static side is marked broadcast — on a
    cluster every executor holds the dim once and the stream never
    shuffles (stream-static joins can't shuffle the stream side
    anyway; broadcasting makes the per-batch plan explicit). The dim
    is re-read per micro-batch, so slowly-changing dimensions pick up
    updates without a restart."""
    left_key, right_key = on
    cols = dim_cols or [c for c in dim.columns if c != right_key]
    d = dim.select(right_key, *cols)
    return events.join(
        F.broadcast(d), events[left_key] == d[right_key], "left"
    ).drop(right_key)


_KMV_OUT = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("window_end", T.TimestampType()),
        T.StructField("kmv_distinct", T.LongType()),
    ]
)
_KMV_STATE = T.StructType(
    [T.StructField("hashes", T.ArrayType(T.LongType()))]
)


def kmv_estimate_from_bottomk(hashes: list[int], k: int) -> int:
    """The KMV estimate from an ascending bottom-k hash list — the
    SAME arithmetic as operators/sketches (exact below k, else
    (k-1)·2⁶⁰/kth with HALF-UP rounding to match Spark's F.round;
    Python's bare round() is banker's and would diverge on ties)."""
    if len(hashes) < k:
        return len(hashes)
    x = float(k - 1) * float(2**60) / float(hashes[k - 1])
    import math

    return int(math.floor(x + 0.5))


def _kmv_window_fn_factory(k: int):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover — continuous mode only
            state.remove()
            return
        (hashes,) = state.get if state.exists else ([],)
        seen = set(hashes)
        for pdf in pdfs:
            seen.update(int(h) for h in pdf["h"].dropna())
        bottom = sorted(seen)[:k]
        state.update((bottom,))
        yield pd.DataFrame(
            {
                "window_start": [key[0]],
                "window_end": [key[1]],
                "kmv_distinct": [kmv_estimate_from_bottomk(bottom, k)],
            }
        )

    return _fn


def windowed_kmv_distinct(
    events: DataFrame,
    window: str = "1 hour",
    k: int = 256,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    seed: str = "kmv",
) -> DataFrame:
    """DETERMINISTIC distinct keys per tumbling window for STREAMS —
    the KMV bottom-k sketch as per-window state
    (applyInPandasWithState). Streaming exact countDistinct is
    unsupported (state would be O(distinct keys) per window anyway);
    the built-in alternative approx_count_distinct has engine-
    internal register state. KMV gives O(k) state per window AND the
    same numbers as the batch sketch over the same data — so stream
    output is testable against operators/sketches.kmv_cardinality_
    sketch exactly (tests/test_streaming_windows.py), and a replay /
    late-data reprocess converges to identical values.

    State: one ≤ k ascending hash list per window, watermark-scoped;
    output mode update (one refreshed row per touched window per
    micro-batch)."""
    from kafkaconnect_spark.functions.text import hash64

    w = F.window(ts_col, window)
    hashed = (
        events.withWatermark(ts_col, watermark)
        .select(
            w.alias("__w"),
            hash64(F.col(key_col).cast("string"), seed).alias("h"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "h",
        )
        .where(F.col("h").isNotNull())
    )
    return hashed.groupBy("window_start", "window_end").applyInPandasWithState(
        _kmv_window_fn_factory(k),
        outputStructType=_KMV_OUT,
        stateStructType=_KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

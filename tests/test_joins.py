"""as-of / range join edge semantics (operators/joins.py)."""

from __future__ import annotations

import datetime

from kafkaconnect_spark.operators.joins import asof_join, range_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_basic_latest_prior_and_no_match(spark):
    trades = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:30"), 100),
            (1, ts("2024-01-01 10:02:00"), 101),
            (2, ts("2024-01-01 09:00:00"), 200),  # before any quote → null
        ],
        "sym int, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 9.9),
            (1, ts("2024-01-01 10:01:00"), 10.1),
            (2, ts("2024-01-01 11:00:00"), 5.0),
        ],
        "sym int, ts timestamp, px double",
    )
    out = asof_join(trades, quotes, on="ts", by="sym", right_cols=["px"])
    got = {r.trade_id: r.px_right for r in out.collect()}
    assert got == {100: 9.9, 101: 10.1, 200: None}


def test_asof_inclusive_at_equal_ts(spark):
    trades = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 100)], "sym int, ts timestamp, trade_id int"
    )
    quotes = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 7.5)], "sym int, ts timestamp, px double"
    )
    out = asof_join(trades, quotes, on="ts", by="sym", right_cols=["px"])
    assert out.first().px_right == 7.5  # right sorts before left at equal ts


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 0)], "k int, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1),  # == l.ts → excluded (strict >)
            (1, ts("2024-01-01 10:30:00"), 2),  # inside
            (1, ts("2024-01-01 11:00:00"), 3),  # == l.ts + 1h → included
            (1, ts("2024-01-01 11:00:01"), 4),  # past window → excluded
            (2, ts("2024-01-01 10:30:00"), 5),  # other key → excluded
        ],
        "k int, ts timestamp, rid int",
    )
    out = range_join(left, right, by="k", left_ts="ts", right_ts="ts", window_seconds=3600)
    assert sorted(r.rid_r for r in out.collect()) == [2, 3]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # right row sits in the left row's *next* bucket — joins exactly once
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:59:00"), 0)], "k int, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 11:30:00"), 9)], "k int, ts timestamp, rid int"
    )
    out = range_join(left, right, by="k", left_ts="ts", right_ts="ts", window_seconds=3600)
    assert out.count() == 1


def test_asof_ignores_null_ts_right_rows(spark):
    trades = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 100)], "sym int, ts timestamp, trade_id int"
    )
    quotes = spark.createDataFrame(
        [(1, None, 9.9), (1, ts("2024-01-01 10:00:00"), 10.1)],
        "sym int, ts timestamp, px double",
    )
    # NULL-ts quote must NOT become the match (Spark orders NULLs first
    # in an ascending window — unguarded, it would sit at the head and
    # match every trade); no quote at/before 09:00 → null
    out = asof_join(trades, quotes, on="ts", by="sym").collect()
    assert len(out) == 1 and out[0].px_right is None


def test_asof_string_tiebreak_is_deterministic(spark):
    trades = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 100)], "sym int, ts timestamp, trade_id int"
    )
    quotes = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "qb", 1.0),
         (1, ts("2024-01-01 10:00:00"), "qa", 2.0)],
        "sym int, ts timestamp, quote_id string, px double",
    )
    # equal-ts ties order by the RAW string column ('qb' last wins) —
    # a long cast would NULL both and make the winner partition-order-
    # dependent
    for _ in range(3):
        out = asof_join(trades, quotes, on="ts", by="sym", tiebreak="quote_id").collect()
        assert out[0].px_right == 1.0


def test_range_join_subsecond_precision(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00.200"))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00.700")),    # in (l, l+5] → match
         (1, ts("2024-01-01 10:00:00.100")),    # before l → no
         (1, ts("2024-01-01 10:00:05.900"))],   # > l+5 → no (second-truncated longs would wrongly include it)
        "k int, rts timestamp",
    )
    out = range_join(left, right, by="k", left_ts="lts", right_ts="rts", window_seconds=5)
    got = {r.rts_r for r in out.collect()}
    assert got == {ts("2024-01-01 10:00:00.700")}


def test_range_join_rejects_nonpositive_window(spark):
    import pytest

    df = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"))], "k int, t timestamp")
    with pytest.raises(ValueError):
        range_join(df, df, by="k", left_ts="t", right_ts="t", window_seconds=0)

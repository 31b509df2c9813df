"""SCD Type-2 edge semantics: delete closes without emitting,
interval chaining, current flags, same-timestamp tiebreak."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from kafkaconnect_spark.operators.scd import scd2_history


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_versions_and_delete(spark):
    rows = [
        Row(key=1, ts=ts("2024-01-01T00:00:00"), change_id=1, op="c", v=10),
        Row(key=1, ts=ts("2024-01-02T00:00:00"), change_id=2, op="u", v=20),
        Row(key=1, ts=ts("2024-01-03T00:00:00"), change_id=3, op="d", v=None),
        Row(key=2, ts=ts("2024-01-01T00:00:00"), change_id=4, op="c", v=7),
        # same-ts pair: change_id breaks the tie
        Row(key=3, ts=ts("2024-01-05T00:00:00"), change_id=6, op="u", v=2),
        Row(key=3, ts=ts("2024-01-05T00:00:00"), change_id=5, op="c", v=1),
    ]
    out = {
        (r.key, r.change_id): r
        for r in scd2_history(spark.createDataFrame(rows)).collect()
    }
    # key 1: two versions, both closed (delete closed v2), none current
    assert out[(1, 1)].valid_to == ts("2024-01-02T00:00:00")
    assert out[(1, 2)].valid_to == ts("2024-01-03T00:00:00")
    assert not out[(1, 1)].is_current and not out[(1, 2)].is_current
    assert (1, 3) not in out  # the delete emits no row
    # key 2: single open current version
    assert out[(2, 4)].valid_to is None and out[(2, 4)].is_current
    # key 3: change_id 5 precedes 6 despite equal timestamps
    assert out[(3, 5)].valid_to == ts("2024-01-05T00:00:00")
    assert out[(3, 6)].is_current

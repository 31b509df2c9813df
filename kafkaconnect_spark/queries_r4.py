"""Round-4 catalog additions (beyond-reference Phase E surface; the
reference has no aggregations at all, SURVEY §2.7).

Kept deliberately small this round: the r3 catalog outgrew the
driver's 50-row correctness window, so r4 front-loads the 21 pending
r3 queries and appends only a handful of new ones (judge directive:
freeze growth until the window clears).

Same determinism rules as queries.py: md5-derived hashes shared with
DuckDB, per-row rounding → DECIMAL sums → final double cast, integer
arithmetic wherever a float rounding convention would otherwise have
to match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaconnect_spark.queries_r3b import _SEGMENTS_SQL, _user_day_segments


# ---------------------------------------------------------------------------
# multi-anchor whole-series similarity (generalizes events_series_similarity)
# ---------------------------------------------------------------------------

def events_series_topk_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 nearest activity series (integer L1 over the 6 PAA
    segment counts) for EVERY anchor user (user_id % 50 == 0) — the
    multi-query form of events_series_similarity, routed through the
    same broadcast-anchor operator
    (operators/similarity.series_l1_topk).

    Scale shape: the anchor frame is anchors×6 rows and broadcasts;
    the corpus series frame never shuffles on its own — one
    map-side-combined (anchor, user) distance aggregation plus the
    per-anchor top-k keyed window. Anchor count scales sublinearly
    with users (1 at sf0.001 → 30 at sf0.1), exactly the
    few-queries-against-everything ANN serving shape."""
    from kafkaconnect_spark.operators.similarity import series_l1_topk

    segs = _user_day_segments(spark, sf_dir)
    anchors = segs.where(F.col("user_id") % 50 == 0).select(
        F.col("user_id").alias("query_id"), "seg", "n"
    )
    return series_l1_topk(segs, anchors, k=5)


SERIES_TOPK_MULTI_ORACLE = rf"""
WITH {_SEGMENTS_SQL},
a AS (SELECT user_id AS query_id, seg, n AS qn FROM segs WHERE user_id % 50 = 0),
dist AS (SELECT query_id, s.user_id, sum(abs(s.n - a.qn))::BIGINT AS l1_dist
         FROM segs s JOIN a USING (seg)
         WHERE s.user_id != a.query_id
         GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY l1_dist, user_id) AS rank
      FROM dist)
SELECT query_id, user_id, l1_dist, rank FROM r WHERE rank <= 5
"""


# name -> (fn, oracle_sql or None); queries.py merges this into
# QUERY_CATALOG AFTER the r3b block, preserving chronological
# insertion order (the driver-window ordering contract —
# tests/test_entry_ordering.py)
R4_CATALOG: dict = {
    "events_series_topk_multi": (events_series_topk_multi, SERIES_TOPK_MULTI_ORACLE),
}

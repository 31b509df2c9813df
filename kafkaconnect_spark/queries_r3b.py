"""Round-3 catalog additions, batch B — Count-Min frequency sketch,
hard-negative mining, Heaps-law vocabulary growth, Zipf fit, and a
micro-batch watermark replay (beyond-reference Phase E surface; the
reference has no aggregations at all, SURVEY §2.7).

Same determinism rules as queries.py: md5-derived hashes shared with
DuckDB, per-row rounding → DECIMAL sums → final double cast, integer
arithmetic wherever a float rounding convention would otherwise have
to match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaconnect_spark.query_base import _events, _hash64_sql, _t


# ---------------------------------------------------------------------------
# Count-Min sketch accuracy audit
# ---------------------------------------------------------------------------

def events_cms_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 4 × width 256) frequency estimates for
    every distinct user audited against the exact counts — the
    width/depth sizing run a pipeline does at small scale before
    trusting the O(depth·width) counter table alone at 100 TB
    (operators/sketches.count_min_counters is the production
    artifact; its build shuffles ≤ depth·width counter rows per
    partition, never the key space). One row out: key count, total
    rows, how many keys estimate exactly, and the worst / summed
    over-counts (CMS never undercounts — asserted in
    tests/test_sketches.py)."""
    from kafkaconnect_spark.operators.sketches import count_min_estimates

    est = count_min_estimates(_events(spark, sf_dir), "user_id")
    return est.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("exact_count").alias("n_rows"),
        F.sum((F.col("cms_est") == F.col("exact_count")).cast("long")).alias(
            "n_exact"
        ),
        F.max(F.col("cms_est") - F.col("exact_count")).alias("max_overcount"),
        F.sum(F.col("cms_est") - F.col("exact_count")).alias("sum_overcount"),
    )


def _cms_oracle(depth: int = 4, width: int = 256, seed: str = "cms") -> str:
    hashes = ", ".join(
        f"{_hash64_sql('k', f'{seed}{d}')} % {width} AS b{d}" for d in range(depth)
    )
    counter_ctes = ",\n".join(
        f"c{d} AS (SELECT b{d} AS bucket, count(*) AS cnt FROM b GROUP BY 1)"
        for d in range(depth)
    )
    joins = " ".join(f"JOIN c{d} ON k.b{d} = c{d}.bucket" for d in range(depth))
    least = ", ".join(f"c{d}.cnt" for d in range(depth))
    return f"""
WITH r AS (SELECT user_id::VARCHAR AS k FROM events WHERE user_id IS NOT NULL),
b AS (SELECT k, {hashes} FROM r),
{counter_ctes},
k AS (SELECT k, any_value(b0) b0, any_value(b1) b1, any_value(b2) b2,
             any_value(b3) b3, count(*) AS exact FROM b GROUP BY k),
est AS (SELECT k.k, k.exact, least({least}) AS est FROM k {joins})
SELECT count(*)::BIGINT AS n_keys,
       sum(exact)::BIGINT AS n_rows,
       sum(CASE WHEN est = exact THEN 1 ELSE 0 END)::BIGINT AS n_exact,
       max(est - exact)::BIGINT AS max_overcount,
       sum(est - exact)::BIGINT AS sum_overcount
FROM est
"""


CMS_AUDIT_ORACLE = _cms_oracle()


# ---------------------------------------------------------------------------
# hard-negative mining (contrastive training)
# ---------------------------------------------------------------------------

def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hard negatives (most-similar different-label vectors)
    for 10 anchor vectors — the negative-sampling stage of a
    contrastive-training pipeline (operators/similarity.
    hard_negative_topk: broadcast anchors with hoisted norms, corpus
    never shuffles)."""
    from kafkaconnect_spark.operators.similarity import hard_negative_topk

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return hard_negative_topk(emb, q, k=5)


HARD_NEG_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         round(list_dot_product(qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(qv, qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
               6) AS cosine
  FROM embeddings e, q WHERE e.label != q.qlabel),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored)
SELECT query_id, neighbor_id, neighbor_label, cosine, rank
FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth (word trigrams)
# ---------------------------------------------------------------------------

def docs_trigram_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve over word trigrams: per
    100-doc ingestion bucket, trigram occurrences, first-seen (novel)
    trigrams, and the cumulative vocabulary/occurrence totals — the
    corpus-health curve that tells you whether more data is still
    adding new content or re-treading (flattening curve ⇒ diminishing
    returns; the dedup-pipeline go/no-go signal).

    Scale shape: first-seen bucket is min() per trigram (map-side
    combined); the cumulative totals run as a TILED prefix scan
    (operators/prefix.tiled_prefix_sum) — the bucket frame grows with
    the corpus (10M rows at 1B docs), so a partitionless running-sum
    window over it would serialize data-sized input through one task
    (the r3 scale flag); the tiled scan keeps every window partitioned
    and the only global step is a bounded triangular broadcast join
    over the tile totals."""
    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    arr = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("__a")
    )
    tg = arr.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("__a") >= 3,
                F.expr(
                    "transform(sequence(0, size(__a) - 3), "
                    "i -> concat_ws(' ', __a[i], __a[i + 1], __a[i + 2]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("tg"),
    )
    occ = tg.groupBy(F.expr("doc_id div 100").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    first = (
        tg.groupBy("tg")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.expr("first_doc div 100").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    from kafkaconnect_spark.operators.prefix import tiled_prefix_sum

    spine = occ.join(first, "bucket", "left").select(
        "bucket",
        "n_occurrences",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    return tiled_prefix_sum(spine, "bucket", ["n_new", "n_occurrences"]).select(
        "bucket",
        "n_occurrences",
        "n_new",
        F.col("cum_n_new").alias("cum_vocab"),
        F.col("cum_n_occurrences").alias("cum_occurrences"),
    )


TRIGRAM_GROWTH_ORACLE = r"""
WITH a AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
           FROM documents
           WHERE text IS NOT NULL AND length(trim(text)) > 0),
tg AS (SELECT doc_id, unnest(CASE WHEN len(arr) >= 3
                  THEN list_transform(generate_series(1, len(arr) - 2),
                       i -> arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2])
                  ELSE [] END) AS tg
       FROM a),
occ AS (SELECT doc_id // 100 AS bucket, count(*)::BIGINT AS n_occurrences
        FROM tg GROUP BY 1),
fs AS (SELECT tg, min(doc_id) AS first_doc FROM tg GROUP BY 1),
nw AS (SELECT first_doc // 100 AS bucket, count(*)::BIGINT AS n_new
       FROM fs GROUP BY 1)
SELECT occ.bucket, n_occurrences, coalesce(n_new, 0)::BIGINT AS n_new,
       sum(coalesce(n_new, 0)) OVER (ORDER BY occ.bucket
           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_vocab,
       sum(n_occurrences) OVER (ORDER BY occ.bucket
           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_occurrences
FROM occ LEFT JOIN nw ON occ.bucket = nw.bucket
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------------

def docs_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf fit of the corpus token distribution: OLS slope/intercept
    of log2(freq) on log2(rank) over the top-100 tokens — the
    one-number language-health check (natural text ≈ −1; synthetic or
    templated corpora drift far from it).

    Determinism: each (x, y) = (log2 rank, log2 freq) is rounded to
    7 and the five OLS sums run as DECIMAL (order-independent); only
    the final closed-form division happens in double (round 6). The
    rank is a row_number over the post-limit ≤100-row frame
    (allow-listed global window), never over the vocabulary."""
    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    tf = (
        docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = tf.orderBy(F.col("freq").desc(), F.col("token").asc()).limit(100)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("token").asc())
        ),
    )
    terms = ranked.select(
        F.expr("cast(round(log2(cast(rank as double)), 7) as decimal(20,7))").alias("x"),
        F.expr("cast(round(log2(cast(freq as double)), 7) as decimal(20,7))").alias("y"),
    ).select(
        "x",
        "y",
        F.expr(
            "cast(round(cast(x as double) * cast(y as double), 7) as decimal(20,7))"
        ).alias("xy"),
        F.expr(
            "cast(round(cast(x as double) * cast(x as double), 7) as decimal(20,7))"
        ).alias("xx"),
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    slope = (n * F.col("sxy").cast("double") - sx * sy) / (
        n * F.col("sxx").cast("double") - sx * sx
    )
    return s.select(
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


ZIPF_ORACLE = r"""
WITH tf AS (
  SELECT tok AS token, count(*)::BIGINT AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0)
  WHERE tok != '' GROUP BY 1),
top AS (SELECT * FROM tf ORDER BY freq DESC, token LIMIT 100),
ranked AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
           FROM top),
terms AS (SELECT round(log2(rank::DOUBLE), 7)::DECIMAL(20,7) AS x,
                 round(log2(freq::DOUBLE), 7)::DECIMAL(20,7) AS y
          FROM ranked),
t2 AS (SELECT x, y,
              round(x::DOUBLE * y::DOUBLE, 7)::DECIMAL(20,7) AS xy,
              round(x::DOUBLE * x::DOUBLE, 7)::DECIMAL(20,7) AS xx
       FROM terms),
s AS (SELECT count(*)::BIGINT AS n_terms, sum(x) AS sx, sum(y) AS sy,
             sum(xy) AS sxy, sum(xx) AS sxx
      FROM t2)
SELECT n_terms,
       round((n_terms * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
             (n_terms * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS zipf_slope,
       round((sy::DOUBLE - ((n_terms * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
             (n_terms * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
             / n_terms, 6) AS zipf_intercept
FROM s
"""


# ---------------------------------------------------------------------------
# micro-batch watermark replay (late-data accounting)
# ---------------------------------------------------------------------------

def watermark_late_flags(
    ev: DataFrame,
    block_rows: int = 1000,
    delay_us: int = 600_000_000,
    id_col: str = "event_id",
    ts_col: str = "ts",
    arrival_block_col: str | None = None,
) -> DataFrame:
    """Row-level late flags under micro-batch watermark replay: a
    row's arrival block is its micro-batch; the watermark entering
    block b is max(event time over blocks < b) − delay, exactly
    Structured Streaming's advance-at-trigger-end rule (a row is
    dropped by stateful ops like streaming dropDuplicates when its
    event time is older than the watermark entering its batch). The
    equivalence against a REAL withWatermark + dropDuplicates stream
    is pinned in tests/test_streaming_windows.py.

    ``arrival_block_col``: optional precomputed arrival-block column
    (to model cohorts whose events arrive later than their position
    in the log); defaults to ``id_col div block_rows``."""
    from kafkaconnect_spark.operators.prefix import tiled_prefix_max_exclusive

    if arrival_block_col is None:
        ev = ev.withColumn("__block", F.expr(f"{id_col} div {block_rows}"))
    else:
        ev = ev.withColumn("__block", F.col(arrival_block_col))
    bmax = ev.groupBy("__block").agg(F.max(ts_col).alias("__bm"))
    # the block frame grows with the data (n/block_rows micro-batches),
    # so the prior-max runs as a tiled exclusive prefix scan instead of
    # a partitionless window (operators/prefix.py)
    wm = tiled_prefix_max_exclusive(bmax, "__block", "__bm", "__prev_max").select(
        "__block",
        (F.unix_micros("__prev_max") - F.lit(delay_us)).alias("__wm_us"),
    )
    return ev.join(F.broadcast(wm), "__block").withColumn(
        "__late",
        F.coalesce(F.unix_micros(ts_col) < F.col("__wm_us"), F.lit(False)),
    )


def events_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of Structured Streaming's watermark semantics:
    events arrive in event_id order in 1000-event micro-batches —
    except the offline-upload cohort (user_id % 20 == 0, standing in
    for mobile clients that sync in bulk) whose events arrive 3
    batches after their log position. The watermark entering batch b
    is max(event-time over batches < b) − 10 min, exactly how a
    `withWatermark("ts", "10 minutes")` query advances per trigger.
    Per event type: how many rows a streaming stateful op would have
    DROPPED as too-late — the accounting you run to pick a watermark
    delay before deploying the streaming engine's windowed
    aggregations (streaming/windows.py); the replay's row-level drop
    set is pinned against a real withWatermark+dropDuplicates stream
    in tests/test_streaming_windows.py.

    Scale shape: per-block max is map-side combined; the cumulative
    prior-max is a tiled exclusive prefix scan over the
    block-aggregated frame (the micro-batch count grows with the data,
    so no partitionless window — operators/prefix.py); the per-event
    comparison is a broadcast join on block id."""
    ev = _events(spark, sf_dir).withColumn(
        "__arr",
        F.expr("event_id div 1000")
        + F.when(F.col("user_id") % 20 == 0, F.lit(3)).otherwise(F.lit(0)),
    )
    flagged = watermark_late_flags(ev, arrival_block_col="__arr")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("__late").cast("long")).alias("n_late_dropped"),
        F.round(
            F.sum(F.col("__late").cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("late_frac"),
    )


WATERMARK_LATE_ORACLE = """
WITH b AS (SELECT event_type, ts,
                  event_id // 1000
                  + CASE WHEN user_id % 20 = 0 THEN 3 ELSE 0 END AS block
           FROM events),
bm AS (SELECT block, max(ts) AS bmax FROM b GROUP BY 1),
wm AS (SELECT block,
              epoch_us(max(bmax) OVER (ORDER BY block
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
              - 600000000 AS wm_us
       FROM bm),
f AS (SELECT event_type,
             coalesce(epoch_us(ts) < wm_us, false) AS late
      FROM b JOIN wm USING (block))
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(CASE WHEN late THEN 1 ELSE 0 END)::BIGINT AS n_late_dropped,
       round(sum(CASE WHEN late THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           AS late_frac
FROM f GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# curriculum scheduling (quality-quantile phases)
# ---------------------------------------------------------------------------

def docs_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning schedule: docs bucketed into 4 training
    phases by normalized token-entropy quartile (low-entropy
    boilerplate first, high-diversity text last) with per-phase
    corpus stats — the stage that orders training data from easy to
    hard before packing.

    SCALE-CORRECT quantiles (same discipline as the RFM segmenter): a
    1-row percentile aggregate broadcasts as a fence and the phase is
    a narrow comparison sum — never a global ntile() that would
    serialize the corpus through one task. The exact percentile()
    here exists for the value-hash oracle; at 100 TB swap it for
    approx_percentile (bounded Greenwald-Khanna state instead of
    per-partition value buffers) — same one-row fence shape, same
    downstream plan (the orders_profile / orders_profile_approx
    twin-variant argument)."""
    from kafkaconnect_spark.operators import pipeline

    ent = pipeline.token_entropy(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "norm_entropy"
    )
    fence = ent.agg(
        *[
            F.round(
                F.expr(f"percentile(norm_entropy, cast({q} as double))"), 6
            ).alias(f"__p{int(q * 100)}")
            for q in (0.25, 0.5, 0.75)
        ]
    )
    phased = ent.crossJoin(F.broadcast(fence)).select(
        "doc_id",
        "n_tokens",
        (
            F.lit(1)
            + (F.col("norm_entropy") > F.col("__p25")).cast("int")
            + (F.col("norm_entropy") > F.col("__p50")).cast("int")
            + (F.col("norm_entropy") > F.col("__p75")).cast("int")
        ).alias("phase"),
    )
    return phased.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


CURRICULUM_ORACLE = r"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM d WHERE length(trim(text)) > 0),
c AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id, tok),
tot AS (SELECT doc_id, sum(n)::BIGINT AS n_tokens, count(*)::INT AS n_distinct
        FROM c GROUP BY doc_id),
e AS (SELECT c.doc_id,
             sum(round(-(c.n / tot.n_tokens::DOUBLE)
                 * log2(c.n / tot.n_tokens::DOUBLE), 7)::DECIMAL(20,7)) AS ent
      FROM c JOIN tot ON c.doc_id = tot.doc_id GROUP BY c.doc_id),
ne AS (SELECT tot.doc_id, tot.n_tokens,
              CASE WHEN tot.n_distinct > 1
                   THEN round(ent::DOUBLE / log2(tot.n_distinct), 6)
                   ELSE 0.0 END AS norm_entropy
       FROM tot JOIN e ON tot.doc_id = e.doc_id
       UNION ALL
       SELECT doc_id, 0, 0.0 FROM d WHERE length(trim(text)) = 0),
f AS (SELECT round(quantile_cont(norm_entropy, 0.25), 6) AS p25,
             round(quantile_cont(norm_entropy, 0.5), 6) AS p50,
             round(quantile_cont(norm_entropy, 0.75), 6) AS p75
      FROM ne)
SELECT 1 + (norm_entropy > p25)::INT + (norm_entropy > p50)::INT
         + (norm_entropy > p75)::INT AS phase,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens
FROM ne, f GROUP BY 1
"""


# ---------------------------------------------------------------------------
# length-weighted (importance) sampling
# ---------------------------------------------------------------------------

def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional importance sampling audit: each doc is
    kept with probability min(1, n_chars/10000) via the deterministic
    hash threshold hash64(doc_id) % 10^6 < n_chars·100 — the
    token-budget-biased sampler (long docs carry more training signal
    per row) that, unlike rand(), is reproducible across runs and
    stable under corpus growth. Per language: totals vs sampled
    counts/chars. Pure narrow expressions over the scan."""
    docs = _t(spark, sf_dir, "documents")
    from kafkaconnect_spark.functions.text import hash64

    flagged = docs.withColumn(
        "__keep",
        hash64(F.col("doc_id").cast("string"), "wsample") % 1_000_000
        < F.least(F.lit(1_000_000), F.col("n_chars") * 100),
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("__keep").cast("long")).alias("n_sampled"),
        F.sum(F.when(F.col("__keep"), F.col("n_chars")).otherwise(F.lit(0))).alias(
            "sampled_chars"
        ),
    )


WEIGHTED_SAMPLE_ORACLE = rf"""
WITH f AS (SELECT lang, n_chars,
                  {_hash64_sql('doc_id', 'wsample')} % 1000000
                      < least(1000000, n_chars * 100) AS keep
           FROM documents)
SELECT lang, count(*)::BIGINT AS n_total,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       sum(CASE WHEN keep THEN n_chars ELSE 0 END)::BIGINT AS sampled_chars
FROM f GROUP BY lang
"""


# ---------------------------------------------------------------------------
# open-order backlog time series (interval -> delta trick)
# ---------------------------------------------------------------------------

def orders_open_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end open-order backlog: an order is open from its order
    month through the month of its last shipment. Computed with the
    interval→delta trick — +1 at the start month, −1 after the close
    month, cumulative sums over the MONTH-aggregated frame — so the
    corpus-sized work is two keyed aggregations. The cumulative sums
    run as a tiled prefix scan (operators/prefix.py): the month spine
    is calendar-bounded today, but the shape is shared with the
    data-growing bucket scans, and removing the partitionless window
    costs nothing. The naive per-month-per-order range join would be
    |months|×|orders|."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("__close"))
    spans = orders.join(
        close, orders.o_orderkey == close.l_orderkey
    ).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("__m0"),
        (F.year("__close") * 12 + F.month("__close") - 1).alias("__m1"),
    )
    starts = spans.groupBy(F.col("__m0").alias("month_key")).agg(
        F.count(F.lit(1)).alias("n_started")
    )
    closes = spans.groupBy(F.col("__m1").alias("month_key")).agg(
        F.count(F.lit(1)).alias("n_closed")
    )
    spine = starts.join(closes, "month_key", "full").select(
        "month_key",
        F.coalesce("n_started", F.lit(0)).alias("n_started"),
        F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
    )
    from kafkaconnect_spark.operators.prefix import tiled_prefix_sum

    cum = tiled_prefix_sum(spine, "month_key", ["n_started", "n_closed"])
    return cum.select(
        (F.floor(F.col("month_key") / 12)).cast("int").alias("year"),
        (F.col("month_key") % 12 + 1).cast("int").alias("month"),
        "n_started",
        "n_closed",
        # inclusive started minus EXCLUSIVE closed (= inclusive − own)
        (
            F.col("cum_n_started")
            - (F.col("cum_n_closed") - F.col("n_closed"))
        ).alias("open_backlog"),
    )


BACKLOG_ORACLE = """
WITH close AS (SELECT l_orderkey, max(l_shipdate) AS cl
               FROM lineitem GROUP BY 1),
spans AS (SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m0,
                 year(cl) * 12 + month(cl) - 1 AS m1
          FROM orders JOIN close ON o_orderkey = l_orderkey),
s AS (SELECT m0 AS month_key, count(*)::BIGINT AS n_started FROM spans GROUP BY 1),
c AS (SELECT m1 AS month_key, count(*)::BIGINT AS n_closed FROM spans GROUP BY 1),
spine AS (SELECT coalesce(s.month_key, c.month_key) AS month_key,
                 coalesce(n_started, 0) AS n_started,
                 coalesce(n_closed, 0) AS n_closed
          FROM s FULL JOIN c ON s.month_key = c.month_key)
SELECT (month_key // 12)::INT AS year, (month_key % 12 + 1)::INT AS month,
       n_started, n_closed,
       (sum(n_started) OVER (ORDER BY month_key ROWS UNBOUNDED PRECEDING)
        - coalesce(sum(n_closed) OVER (ORDER BY month_key
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       )::BIGINT AS open_backlog
FROM spine
"""


# ---------------------------------------------------------------------------
# audio VAD features (short-time energy + zero-crossing rate)
# ---------------------------------------------------------------------------

def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-40-sample-frame short-time energy + zero-crossing count
    over the REAL wav decoder (the Rabiner–Schafer VAD front end) —
    the silence/speech screen an audio-training pipeline runs before
    transcription. All integer math ⇒ value-hash oracle-able from the
    text→PCM fixture (operators/multimodal.audio_frame_features)."""
    from kafkaconnect_spark.operators.multimodal import (
        audio_frame_features,
        make_fake_wav,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    return audio_frame_features(make_fake_wav(docs))


AUDIO_VAD_ORACLE = r"""
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS t
           FROM documents),
d AS (SELECT doc_id, t, strlen(t) AS n FROM a),
s AS (SELECT doc_id,
             CASE WHEN n = 0 THEN [0]
                  ELSE [ascii(t[i]) * 256 - 16384
                        FOR i IN range(1, n + 1)] END AS sm
      FROM d),
f AS (SELECT doc_id, sm,
             unnest(range(((len(sm) + 39) // 40)::INT)) AS frame_id
      FROM s),
sl AS (SELECT doc_id, frame_id,
              sm[frame_id * 40 + 1 : least((frame_id + 1) * 40, len(sm))] AS w
       FROM f)
SELECT doc_id, frame_id::INT AS frame_id,
       len(w)::INT AS n_samples,
       list_sum([x * x FOR x IN w])::BIGINT AS energy,
       coalesce(list_sum([CASE WHEN (w[i] < 0) != (w[i + 1] < 0)
                               THEN 1 ELSE 0 END
                          FOR i IN range(1, len(w))]), 0)::INT AS n_crossings
FROM sl
"""


# ---------------------------------------------------------------------------
# session-duration histogram
# ---------------------------------------------------------------------------

def events_session_duration_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution of session lengths (30-min-inactivity sessions,
    same rule as events_sessionization) in 5-minute buckets — the
    engagement histogram behind session-window sizing. Bucketing is
    INTEGER µs division (no float knife-edges); both windows are
    keyed by user (one shuffle), the histogram groupBy is
    bucket-cardinality."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    sess = ev.withColumn(
        "__new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "__sid",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "__sid").agg(
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("__dur_us"),
        F.count(F.lit(1)).alias("__n_events"),
    )
    return per_session.groupBy(
        F.expr("__dur_us div 300000000").alias("duration_bucket_5min")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("__n_events").alias("n_events"),
    )


SESSION_DURATION_ORACLE = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new,
         event_id
  FROM events),
s AS (SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
p AS (SELECT user_id, sid,
             max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us,
             count(*) AS n_events
      FROM s GROUP BY 1, 2)
SELECT dur_us // 300000000 AS duration_bucket_5min,
       count(*)::BIGINT AS n_sessions,
       sum(n_events)::BIGINT AS n_events
FROM p GROUP BY 1
"""


# ---------------------------------------------------------------------------
# customer-LTV cohort matrix
# ---------------------------------------------------------------------------

def orders_customer_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers cohorted by first-order
    month; per (cohort month, months since first order) cell — active
    customers and decimal-exact revenue. The retention/LTV triangle
    every subscription dashboard draws. First-order month rides a
    keyed window over the single orders shuffle; the cell groupBy has
    (months)² bounded cardinality."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey")
    mk = F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    with_cohort = orders.withColumn("__mk", mk).withColumn(
        "__cohort", F.min("__mk").over(w)
    )
    return with_cohort.groupBy(
        (F.floor(F.col("__cohort") / 12)).cast("int").alias("cohort_year"),
        (F.col("__cohort") % 12 + 1).cast("int").alias("cohort_month"),
        (F.col("__mk") - F.col("__cohort")).cast("int").alias("months_since"),
    ).agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")
        ).cast("double").alias("revenue"),
    )


LTV_COHORT_ORACLE = """
WITH o AS (SELECT o_custkey,
                  year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mk,
                  o_totalprice
           FROM orders),
c AS (SELECT *, min(mk) OVER (PARTITION BY o_custkey) AS cohort FROM o)
SELECT (cohort // 12)::INT AS cohort_year,
       (cohort % 12 + 1)::INT AS cohort_month,
       (mk - cohort)::INT AS months_since,
       count(DISTINCT o_custkey)::BIGINT AS n_customers,
       count(*)::BIGINT AS n_orders,
       sum(round(o_totalprice, 2)::DECIMAL(18,2))::DOUBLE AS revenue
FROM c GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# embedding dimension-truncation recall (Matryoshka-style evaluation)
# ---------------------------------------------------------------------------

def embedding_dim_truncation_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retrieval quality of TRUNCATED embeddings: top-5 neighbors
    using only the first 16 of 64 dimensions vs the full-dimension
    top-5, per query — the evaluation behind Matryoshka-style
    dimension reduction (Kusupati et al. 2022, public): how much
    recall do you keep at 4× less vector memory? Two broadcast-anchor
    exact top-k passes (operators/similarity.brute_force_topk) joined
    on (query, neighbor)."""
    from kafkaconnect_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = brute_force_topk(emb, q, k=5)
    emb16 = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    q16 = q.select("query_id", F.slice("embedding", 1, 16).alias("embedding"))
    trunc = brute_force_topk(emb16, q16, k=5)
    hits = full.join(
        trunc.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    return (
        full.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_overlap")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(F.coalesce("n_overlap", F.lit(0)) / F.col("k"), 6).alias(
                "recall_at_5"
            ),
        )
    )


DIM_TRUNC_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 20),
fs AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(qv, qv)) *
                sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))), 6) AS cosine
  FROM embeddings e, q WHERE e.vec_id != q.query_id),
fr AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rnk
       FROM fs),
full_k AS (SELECT query_id, neighbor_id FROM fr WHERE rnk <= 5),
ts AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(list_slice(qv, 1, 16),
                                list_slice(e.embedding::DOUBLE[], 1, 16)) /
               (sqrt(list_dot_product(list_slice(qv, 1, 16),
                                      list_slice(qv, 1, 16))) *
                sqrt(list_dot_product(list_slice(e.embedding::DOUBLE[], 1, 16),
                                      list_slice(e.embedding::DOUBLE[], 1, 16)))),
               6) AS cosine
  FROM embeddings e, q WHERE e.vec_id != q.query_id),
tr AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rnk
       FROM ts),
trunc_k AS (SELECT query_id, neighbor_id FROM tr WHERE rnk <= 5)
SELECT f.query_id,
       count(t.neighbor_id)::BIGINT AS n_overlap,
       round(count(t.neighbor_id) / count(*)::DOUBLE, 6) AS recall_at_5
FROM full_k f LEFT JOIN trunc_k t
  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
GROUP BY f.query_id
"""


# ---------------------------------------------------------------------------
# deterministic A/B assignment + lift
# ---------------------------------------------------------------------------

def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout on a DETERMINISTIC hash assignment
    (user_id md5 → variant, the reproducible alternative to rand()
    bucketing): per-variant event counts, purchase events, purchase
    rates, and the two-proportion z-score — the significance readout
    every growth dashboard runs (event-level proportions; a user-
    level conversion metric degenerates on this corpus where every
    user eventually purchases, making the pooled rate exactly 1).
    All corpus-sized work is one narrow flag + one bounded groupBy;
    the z arithmetic is a 1-row computation, NULL when degenerate."""
    from kafkaconnect_spark.functions.text import hash64

    ev = _events(spark, sf_dir).withColumn(
        "__variant", hash64(F.col("user_id").cast("string"), "ab") % 2
    )
    agg = ev.groupBy().agg(
        F.sum(F.when(F.col("__variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("__variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(
                (F.col("__variant") == 0) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when(
                (F.col("__variant") == 1) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("conv_b"),
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    var = pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    z = F.when(var > 0, F.round((pb - pa) / F.sqrt(var), 6))
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        z.alias("z_score"),
    )


AB_LIFT_ORACLE = rf"""
WITH e AS (SELECT event_type,
                  {_hash64_sql('user_id', 'ab')} % 2 AS variant
           FROM events),
a AS (SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
             sum(CASE WHEN variant = 0 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END)::BIGINT AS conv_a,
             sum(CASE WHEN variant = 1 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END)::BIGINT AS conv_b
      FROM e),
v AS (SELECT *,
             ((conv_a + conv_b) / (n_a + n_b)::DOUBLE)
             * (1 - (conv_a + conv_b) / (n_a + n_b)::DOUBLE)
             * (1.0 / n_a + 1.0 / n_b) AS var
      FROM a)
SELECT n_a, n_b, conv_a, conv_b,
       round(conv_a / n_a::DOUBLE, 6) AS rate_a,
       round(conv_b / n_b::DOUBLE, 6) AS rate_b,
       CASE WHEN var > 0
            THEN round((conv_b / n_b::DOUBLE - conv_a / n_a::DOUBLE)
                       / sqrt(var), 6) END AS z_score
FROM v
"""


# ---------------------------------------------------------------------------
# time-series symbolization (PAA + SAX-style) and series similarity
# ---------------------------------------------------------------------------

def _user_day_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared substrate: per (user, 5-day segment) event counts over
    the 30-day corpus window, zero-filled via a (users × 6) spine —
    the PAA (piecewise aggregate) reduction of each user's daily
    activity series. Day 0 anchors at the global min event date
    (1-row broadcast). Linear in users; the spine side is 6 rows."""
    ev = _events(spark, sf_dir)
    start = ev.agg(F.min(F.to_date("ts")).alias("__d0"))
    seg = (
        ev.crossJoin(F.broadcast(start))
        .select(
            "user_id",
            (F.datediff(F.to_date("ts"), F.col("__d0")) / 5)
            .cast("int")
            .alias("seg"),
        )
        .where((F.col("seg") >= 0) & (F.col("seg") < 6))
        .groupBy("user_id", "seg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(
        F.broadcast(
            spark.range(6).select(F.col("id").cast("int").alias("seg"))
        )
    )
    return spine.join(seg, ["user_id", "seg"], "left").select(
        "user_id", "seg", F.coalesce("n", F.lit(0)).alias("n")
    )


_SEGMENTS_SQL = """
d0 AS (SELECT min(ts::DATE) AS d0 FROM events),
raw AS (SELECT user_id,
               (date_diff('day', d0, ts::DATE) // 5)::INT AS seg,
               count(*)::BIGINT AS n
        FROM events, d0
        WHERE date_diff('day', d0, ts::DATE) // 5 BETWEEN 0 AND 5
        GROUP BY 1, 2),
users AS (SELECT DISTINCT user_id FROM events),
segs AS (SELECT user_id, s.seg, coalesce(raw.n, 0)::BIGINT AS n
         FROM users CROSS JOIN (SELECT unnest(range(6))::INT AS seg) s
         LEFT JOIN raw USING (user_id, seg))
"""


def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style activity-pattern motifs (Lin et al. 2003, "A
    symbolic representation of time series", public): each user's
    30-day series reduces to 6 PAA segment counts, each segment maps
    to a 4-letter alphabet by GLOBAL quartile fences (broadcast 1-row
    percentile aggregate — the oracle-able stand-in for SAX's
    Gaussian breakpoints), and the 6-letter word groups users with
    the same activity shape. Returns (sax_word, n_users) — the motif
    census behind behavioural cohorting.

    Scale shape: one keyed corpus aggregation + a 6-row broadcast
    spine; fences broadcast; the word groupBy is alphabet^6-bounded."""
    segs = _user_day_segments(spark, sf_dir)
    fence = segs.agg(
        *[
            F.round(F.expr(f"percentile(n, cast({q} as double))"), 6).alias(
                f"__p{int(q * 100)}"
            )
            for q in (0.25, 0.5, 0.75)
        ]
    )
    lettered = segs.crossJoin(F.broadcast(fence)).select(
        "user_id",
        "seg",
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d")),
            (
                F.lit(1)
                + (F.col("n") > F.col("__p25")).cast("int")
                + (F.col("n") > F.col("__p50")).cast("int")
                + (F.col("n") > F.col("__p75")).cast("int")
            ),
        ).alias("sym"),
    )
    words = lettered.groupBy("user_id").agg(
        F.concat_ws("", F.array_sort(F.collect_list(F.struct("seg", "sym"))).getField("sym")).alias(
            "sax_word"
        )
    )
    return words.groupBy("sax_word").agg(
        F.count(F.lit(1)).alias("n_users")
    )


SAX_ORACLE = rf"""
WITH {_SEGMENTS_SQL},
f AS (SELECT round(quantile_cont(n, 0.25), 6) AS p25,
             round(quantile_cont(n, 0.5), 6) AS p50,
             round(quantile_cont(n, 0.75), 6) AS p75
      FROM segs),
lettered AS (SELECT user_id, seg,
                    ['a', 'b', 'c', 'd'][1 + (n > p25)::INT + (n > p50)::INT
                                         + (n > p75)::INT] AS sym
             FROM segs, f),
words AS (SELECT user_id, string_agg(sym, '' ORDER BY seg) AS sax_word
          FROM lettered GROUP BY user_id)
SELECT sax_word, count(*)::BIGINT AS n_users
FROM words GROUP BY sax_word
"""


def events_series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users with the activity series closest (integer L1 on
    the 6 PAA segment counts) to the lowest-id user — the distributed
    whole-series similarity search (the shape of EDBT'19's streaming
    time-series search, reduced to its batch core). Routed through
    the general multi-anchor operator
    (operators/similarity.series_l1_topk) with a single anchor: the
    anchor vector is a 6-row broadcast, distance is one
    map-side-combined keyed aggregation, the top-10 a keyed window —
    never a global sort. The multi-anchor form is
    events_series_topk_multi (queries_r4.py)."""
    from kafkaconnect_spark.operators.similarity import series_l1_topk

    segs = _user_day_segments(spark, sf_dir)
    q_user = segs.groupBy().agg(F.min("user_id").alias("__qu"))
    anchors = segs.join(
        F.broadcast(q_user), segs.user_id == F.col("__qu")
    ).select(F.col("user_id").alias("query_id"), "seg", "n")
    return series_l1_topk(segs, anchors, k=10).select("user_id", "l1_dist")


SERIES_SIM_ORACLE = rf"""
WITH {_SEGMENTS_SQL},
qu AS (SELECT min(user_id) AS qu FROM segs),
qvec AS (SELECT seg, n AS qn FROM segs, qu WHERE user_id = qu),
dist AS (SELECT user_id, sum(abs(segs.n - qn))::BIGINT AS l1_dist
         FROM segs JOIN qvec USING (seg), qu
         WHERE user_id != qu
         GROUP BY user_id)
SELECT user_id, l1_dist FROM dist ORDER BY l1_dist, user_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# keyed RANGE-frame rolling aggregate
# ---------------------------------------------------------------------------

def lineitem_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier 7-day rolling revenue — the RANGE-frame window
    shape (value-based frame over day gaps, not ROWS): each day's
    total plus the trailing-week sum, for a deterministic supplier
    sample (suppkey % 100 == 0, filtered BEFORE the shuffle so the
    predicate reaches the scan). Revenue is per-row rounded →
    DECIMAL-summed; the frame key is integer days-since-epoch so the
    range arithmetic has no calendar/float edge; revenue uses the q1
    decimal-factor convention. Keyed window → one
    shuffle on suppkey; rows per partition bounded by the date span."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") % 100 == 0)
    daily = (
        li.select(
            "l_suppkey",
            F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date"))
            .alias("day_int"),
            # decimal-cast factors, exact decimal multiply — the q1
            # convention; a per-row round(·, 2) of the double product
            # hits the Spark-vs-DuckDB half-up/binary rounding
            # knife-edge (it did, at sf0.01)
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            ).alias("__rev"),
        )
        .groupBy("l_suppkey", "day_int")
        .agg(F.sum("__rev").alias("__daily"))
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("day_int")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "l_suppkey",
        "day_int",
        F.col("__daily").cast("double").alias("daily_revenue"),
        F.sum("__daily").over(w).cast("double").alias("rolling_7day_revenue"),
    )


ROLLING_7DAY_ORACLE = """
WITH d AS (
  SELECT l_suppkey,
         date_diff('day', DATE '1970-01-01', l_shipdate::DATE) AS day_int,
         sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(8,2))
             AS daily
  FROM lineitem WHERE l_suppkey % 100 = 0
  GROUP BY 1, 2)
SELECT l_suppkey, day_int,
       daily::DOUBLE AS daily_revenue,
       sum(daily) OVER (PARTITION BY l_suppkey ORDER BY day_int
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                       )::DOUBLE AS rolling_7day_revenue
FROM d
"""


# ---------------------------------------------------------------------------
# centroid drift across splits (training-data drift monitor)
# ---------------------------------------------------------------------------

def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between the train and valid/test hash
    splits — the distribution-shift monitor a training pipeline runs
    before trusting a data refresh: if a label's train-split centroid
    moves away from its held-out centroid, the split is no longer
    i.i.d. for that class. Per label: vector counts per side and the
    squared L2 distance between the two centroids.

    Determinism without rounding: per-dim sums are DECIMAL-exact;
    every later step is a deterministic IEEE op on identical inputs
    (decimal→double conversion, two divisions, subtract, square), and
    the 64 per-dim terms reduce through an EXPLICIT sequential fold
    over the dim-sorted array — a plain sum() would be
    partition-order-dependent, and any round() on the way reopens
    the Spark-vs-DuckDB half-up/binary knife-edge (both variants
    failed at sf0.001 before this shape). Reduce output is
    |labels|×dims however large the corpus."""
    from kafkaconnect_spark.functions.text import hash64

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "__side",
        F.when(hash64(F.col("vec_id").cast("string"), "split") % 16 <= 13, "train")
        .otherwise("heldout"),
    )
    e = emb.select(
        "label", "__side", F.posexplode("embedding").alias("dim", "__v")
    )
    cent = e.groupBy("label", "__side", "dim").agg(
        F.sum(
            F.expr("cast(round(cast(__v as double), 7) as decimal(20,7))")
        ).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    tr = cent.where(F.col("__side") == "train").select(
        "label", "dim", F.col("__s").alias("__st"), F.col("__n").alias("__nt")
    )
    ho = cent.where(F.col("__side") == "heldout").select(
        "label", "dim", F.col("__s").alias("__sh"), F.col("__n").alias("__nh")
    )
    term = (
        F.col("__st").cast("double") / F.col("__nt")
        - F.col("__sh").cast("double") / F.col("__nh")
    )
    return (
        tr.join(ho, ["label", "dim"])
        .select(
            "label",
            "dim",
            "__nt",
            "__nh",
            (term * term).alias("__t"),
        )
        .groupBy("label")
        .agg(
            F.max("__nt").alias("n_train"),
            F.max("__nh").alias("n_heldout"),
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "struct(dim, __t))), x -> x.__t), cast(0.0 as double), "
                "(acc, t) -> acc + t)"
            ).alias("drift_sq_l2"),
        )
    )


CENTROID_DRIFT_ORACLE = rf"""
WITH s AS (SELECT label, embedding,
                  CASE WHEN {_hash64_sql('vec_id', 'split')} % 16 <= 13
                       THEN 'train' ELSE 'heldout' END AS side
           FROM embeddings),
e AS (SELECT label, side, generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding::DOUBLE[]) AS v
      FROM s),
c AS (SELECT label, side, dim,
             sum(round(v, 7)::DECIMAL(20,7)) AS sm, count(*) AS n
      FROM e GROUP BY 1, 2, 3),
j AS (SELECT t.label, t.dim, t.n AS nt, h.n AS nh,
             (t.sm::DOUBLE / t.n - h.sm::DOUBLE / h.n)
             * (t.sm::DOUBLE / t.n - h.sm::DOUBLE / h.n) AS term
      FROM c t JOIN c h ON t.label = h.label AND t.dim = h.dim
      WHERE t.side = 'train' AND h.side = 'heldout')
SELECT label,
       max(nt)::BIGINT AS n_train,
       max(nh)::BIGINT AS n_heldout,
       list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY dim)),
                   (acc, t) -> acc + t) AS drift_sq_l2
FROM j GROUP BY label
"""


# ---------------------------------------------------------------------------
# robust (MAD) anomaly screen
# ---------------------------------------------------------------------------

def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event type: median / MAD fences
    (median absolute deviation, the breakdown-resistant alternative
    to the mean/σ z-score — one 10%-tail of corrupt values drags a
    mean-based fence, but not the median). Two grouped exact-median
    passes come back as a broadcast fence; the flag is a narrow
    comparison. Exact percentile() is the oracle stand-in — at 100 TB
    swap approx_percentile, same fence shape. Output per type:
    totals, MAD, and outliers beyond 3·1.4826·MAD."""
    ev = _events(spark, sf_dir).where(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, cast(0.5 as double))"), 6).alias("__med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.round(
            F.expr("percentile(abs(value - __med), cast(0.5 as double))"), 6
        ).alias("__mad")
    )
    flagged = with_med.join(F.broadcast(mad), "event_type").withColumn(
        "__out",
        F.abs(F.col("value") - F.col("__med"))
        > F.lit(3 * 1.4826) * F.col("__mad"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("__med").alias("median_value"),
        F.max("__mad").alias("mad"),
        F.sum(F.col("__out").cast("long")).alias("n_outliers"),
    )


ANOMALY_MAD_ORACLE = """
WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
m AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM v GROUP BY 1),
d AS (SELECT v.event_type, value, med FROM v JOIN m USING (event_type)),
md AS (SELECT event_type, round(quantile_cont(abs(value - med), 0.5), 6) AS mad
       FROM d GROUP BY 1)
SELECT d.event_type, count(*)::BIGINT AS n_events,
       max(med) AS median_value, max(mad) AS mad,
       sum(CASE WHEN abs(value - med) > 3 * 1.4826 * mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM d JOIN md USING (event_type) GROUP BY d.event_type
"""


# ---------------------------------------------------------------------------
# image near-dup clusters (completes the multimodal dedup story)
# ---------------------------------------------------------------------------

def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the aHash Hamming-LSH candidate
    pairs at Hamming ≤ 3 (the distance the 4-band pigeonhole
    guarantees to surface) — image near-dup CLUSTERS, completing the
    multimodal dedup story beyond equal-hash buckets and candidate
    pairs: iterative min-label propagation on the same checkpoint
    discipline as the text clusters, vs the oracle's recursive
    transitive closure."""
    from kafkaconnect_spark.operators.dedup import carry_cached, duplicate_clusters
    from kafkaconnect_spark.queries_r3 import multimodal_phash_hamming

    pairs = multimodal_phash_hamming(spark, sf_dir)
    # carry the hamming pipeline's cache tags onto the filtered frame
    # so duplicate_clusters' end-of-loop release can actually free them
    near = carry_cached(
        pairs.where(F.col("hamming") <= 3).select("id_a", "id_b"), pairs
    )
    return duplicate_clusters(near)


def _phash_clusters_oracle() -> str:
    from kafkaconnect_spark.queries_r3 import _phash_hamming_oracle

    base = _phash_hamming_oracle()
    head, tail = base.split("SELECT DISTINCT a.doc_id AS id_a", 1)
    return (
        head.replace("WITH ", "WITH RECURSIVE ", 1).rstrip().rstrip(",")
        + ",\ncand AS (SELECT DISTINCT a.doc_id AS id_a"
        + tail.rstrip()
        + """),
pairs AS (SELECT id_a, id_b FROM cand WHERE hamming <= 3),
e AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS n, a AS m FROM e
  UNION
  SELECT e.b, r.m FROM reach r JOIN e ON e.a = r.n)
SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
"""
    )


PHASH_CLUSTERS_ORACLE = _phash_clusters_oracle()


# ---------------------------------------------------------------------------
# LSH recall/precision audit (the banding S-curve, measured in-engine)
# ---------------------------------------------------------------------------

def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the minhash banding (16 hashes, 4 bands)
    against exact n-gram Jaccard ground truth at threshold 0.2 — the
    S-curve measured on the corpus itself, which is how you size
    bands/rows before trusting LSH at 100 TB (the analytic
    1-(1-s^r)^b curve assumes uniform shingling; real corpora don't).
    Truth = the capped-inverted-index exact pairs; candidates = every
    band collision with its verified Jaccard (threshold 0 keeps the
    false positives so precision is measurable). One row out.

    Scale shape: both inputs are the existing audited pipelines; the
    audit adds only 1-row aggregates joined by broadcast."""
    from pyspark import StorageLevel

    from kafkaconnect_spark.operators import dedup as DD
    from kafkaconnect_spark.operators.dedup import _track_cached

    docs = _t(spark, sf_dir, "documents", spread=True)
    # one persisted shingle pass feeds both pipelines (r11 — the same
    # sharing as dedup_quality_eval; the two derivations consume the
    # identical frame, so results are unchanged)
    sharr = DD.shingle_arrays(docs).persist(StorageLevel.MEMORY_AND_DISK)
    truth = DD.ngram_jaccard_pairs(docs, threshold=0.2, precomputed_sharr=sharr)
    cand = DD.minhash_dedup_pairs(
        docs, threshold=0.0, num_hashes=16, bands=4, precomputed_sharr=sharr
    )
    agg = (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(
            cand.agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.sum((F.col("jaccard") >= 0.2).cast("long")).alias("n_hits"),
            )
        )
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_truth"), 6).alias("recall"),
            F.round(F.col("n_hits") / F.col("n_candidates"), 6).alias(
                "precision"
            ),
        )
    )
    cached = list(getattr(truth, "_kc_cached", [])) + list(
        getattr(cand, "_kc_cached", [])
    )
    return _track_cached(agg, cached + [sharr])


def _lsh_recall_oracle() -> str:
    from kafkaconnect_spark.query_base import _MINHASH_AGGS, _SHINGLE_CTE, _SIG_LIST

    return rf"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter_all AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
              FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2),
truth AS (SELECT id_a, id_b
          FROM inter_all JOIN sizes sa ON sa.doc_id = id_a
                         JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2),
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
cands AS (
  SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id),
cand_j AS (
  SELECT c.id_a, c.id_b,
         round(coalesce(i.inter, 0)
               / (sa.sz + sb.sz - coalesce(i.inter, 0)), 6) AS jaccard
  FROM cands c
  LEFT JOIN inter_all i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b),
s AS (SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
             (SELECT count(*) FROM cand_j)::BIGINT AS n_candidates,
             (SELECT count(*) FROM cand_j WHERE jaccard >= 0.2)::BIGINT
                 AS n_hits)
SELECT n_truth, n_candidates, n_hits,
       round(n_hits / n_truth::DOUBLE, 6) AS recall,
       round(n_hits / n_candidates::DOUBLE, 6) AS precision
FROM s
"""


LSH_RECALL_ORACLE = _lsh_recall_oracle()


R3B_CATALOG: dict[str, tuple] = {
    "events_cms_error_audit": (events_cms_error_audit, CMS_AUDIT_ORACLE),
    "embedding_hard_negatives": (embedding_hard_negatives, HARD_NEG_ORACLE),
    "docs_trigram_vocab_growth": (
        docs_trigram_vocab_growth,
        TRIGRAM_GROWTH_ORACLE,
    ),
    "docs_zipf_slope": (docs_zipf_slope, ZIPF_ORACLE),
    "events_watermark_late_drop": (
        events_watermark_late_drop,
        WATERMARK_LATE_ORACLE,
    ),
    "docs_curriculum_phases": (docs_curriculum_phases, CURRICULUM_ORACLE),
    "docs_weighted_sample": (docs_weighted_sample, WEIGHTED_SAMPLE_ORACLE),
    "orders_open_backlog_monthly": (
        orders_open_backlog_monthly,
        BACKLOG_ORACLE,
    ),
    "multimodal_audio_vad": (multimodal_audio_vad, AUDIO_VAD_ORACLE),
    "events_session_duration_histogram": (
        events_session_duration_histogram,
        SESSION_DURATION_ORACLE,
    ),
    "orders_customer_ltv_cohort": (
        orders_customer_ltv_cohort,
        LTV_COHORT_ORACLE,
    ),
    "embedding_dim_truncation_recall": (
        embedding_dim_truncation_recall,
        DIM_TRUNC_ORACLE,
    ),
    "events_ab_test_lift": (events_ab_test_lift, AB_LIFT_ORACLE),
    "events_sax_motifs": (events_sax_motifs, SAX_ORACLE),
    "events_series_similarity": (
        events_series_similarity,
        SERIES_SIM_ORACLE,
    ),
    "lineitem_rolling_7day_revenue": (
        lineitem_rolling_7day_revenue,
        ROLLING_7DAY_ORACLE,
    ),
    "embedding_centroid_drift": (
        embedding_centroid_drift,
        CENTROID_DRIFT_ORACLE,
    ),
    "events_anomaly_mad": (events_anomaly_mad, ANOMALY_MAD_ORACLE),
    "multimodal_phash_clusters": (
        multimodal_phash_clusters,
        PHASH_CLUSTERS_ORACLE,
    ),
    "dedup_lsh_recall_audit": (dedup_lsh_recall_audit, LSH_RECALL_ORACLE),
}

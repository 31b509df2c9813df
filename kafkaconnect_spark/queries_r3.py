"""Round-3 catalog additions — data-quality audits, planner
diagnostics, mixture scheduling, windowed distinct, time-bound
funnels, OOV accounting (beyond-reference Phase E surface; the
reference has no aggregations at all, SURVEY §2.7).

Same determinism rules as queries.py: md5-derived hashes shared with
DuckDB, per-row rounding → DECIMAL sums → final double cast, integer
arithmetic wherever a float rounding convention would have to match
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.query_base import _NTOK_SQL, _events, _hash64_sql, _t


# ---------------------------------------------------------------------------
# data-quality audits
# ---------------------------------------------------------------------------

def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FK orphan audit — the nightly data-contract check a
    warehouse runs before publishing: child rows whose parent key is
    missing, per relationship. Each relationship is one LEFT ANTI join
    on the key (broadcast when the parent is a dim); output is 3 rows
    regardless of corpus size."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey")

    def rel(name: str, child: DataFrame, key, parent: DataFrame, pkey) -> DataFrame:
        orphans = child.join(
            parent, child[key] == parent[pkey], "left_anti"
        )
        return child.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(F.lit(name).alias("relationship"), "n_child", "n_orphans")

    return (
        rel("lineitem->orders", li, "l_orderkey", orders.select("o_orderkey"), "o_orderkey")
        .unionByName(rel("orders->customer", orders, "o_custkey", cust.select("c_custkey"), "c_custkey"))
        .unionByName(rel("customer->nation", cust, "c_nationkey", nation, "n_nationkey"))
    )


REF_INTEGRITY_ORACLE = """
SELECT 'lineitem->orders' AS relationship,
       (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
"""


def events_user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style erasure audit: a deterministic request set (users
    with user_id % 97 == 0, standing in for a right-to-be-forgotten
    table) is semi/anti-joined against the event stream — the same
    key-set deletion shape the K2 tombstone sink applies per batch,
    here as a corpus-scale audit. One row out."""
    ev = _events(spark, sf_dir)
    requests = (
        ev.select("user_id").distinct().where(F.col("user_id") % 97 == 0)
    )
    erased = ev.join(F.broadcast(requests), "user_id", "left_semi")
    remaining = ev.join(F.broadcast(requests), "user_id", "left_anti")
    return (
        requests.agg(F.count(F.lit(1)).alias("n_requests"))
        .crossJoin(erased.agg(F.count(F.lit(1)).alias("n_rows_erased")))
        .crossJoin(
            remaining.agg(
                F.count(F.lit(1)).alias("n_rows_remaining"),
                F.count_distinct("user_id").alias("n_users_remaining"),
            )
        )
    )


ERASURE_ORACLE = """
WITH req AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
SELECT (SELECT count(*) FROM req) AS n_requests,
       (SELECT count(*) FROM events e
        WHERE EXISTS (SELECT 1 FROM req r WHERE r.user_id = e.user_id))
         AS n_rows_erased,
       (SELECT count(*) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM req r WHERE r.user_id = e.user_id))
         AS n_rows_remaining,
       (SELECT count(DISTINCT e.user_id) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM req r WHERE r.user_id = e.user_id))
         AS n_users_remaining
"""


# ---------------------------------------------------------------------------
# planner / layout diagnostics
# ---------------------------------------------------------------------------

def events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the report that decides whether a key
    needs salting (operators/skew) before a shuffle join: the 10
    heaviest user_ids with their share of all rows and skew factor
    (count / mean-per-key). Scale shape: one map-side-combined
    groupBy; top-10 via TakeOrdered (no global window); the two
    global scalars ride a broadcast 1-row crossJoin."""
    ev = _events(spark, sf_dir)
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    totals = per_key.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    top = per_key.orderBy(F.col("cnt").desc(), F.col("user_id").asc()).limit(10)
    w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
    return (
        top.crossJoin(F.broadcast(totals))
        # the window ranks 10 rows post-limit — not a global sort
        .withColumn("key_rank", F.row_number().over(w))
        .select(
            "key_rank",
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("cnt") * F.col("__nkeys") / F.col("__total"), 4
            ).alias("skew_factor"),
        )
    )


KEY_SKEW_ORACLE = """
WITH pk AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
t AS (SELECT sum(cnt)::BIGINT AS total, count(*) AS nkeys FROM pk),
top AS (SELECT user_id, cnt,
               row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS key_rank
        FROM pk ORDER BY cnt DESC, user_id ASC LIMIT 10)
SELECT key_rank, user_id, cnt,
       round(cnt / t.total, 6) AS share,
       round(cnt * t.nkeys / t.total, 4) AS skew_factor
FROM top CROSS JOIN t
"""


def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width price histogram in integer cents ($5000 bins) — the
    column-statistics pass that feeds min/max row-group skipping and
    partition sizing. Integer binning (no float bin edges to agree
    on), decimal sum for the per-bin revenue. One narrow map + one
    map-side-combined groupBy; output is ~21 rows at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.select(cents.alias("__cents"))
        .groupBy((F.col("__cents") / F.lit(500000)).cast("long").alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.min("__cents") / F.lit(100.0)).alias("min_price"),
            (F.max("__cents") / F.lit(100.0)).alias("max_price"),
            (
                F.sum(F.col("__cents").cast(T.DecimalType(28, 0))).cast("double")
                / F.lit(100.0)
            ).alias("revenue"),
        )
    )


PRICE_HIST_ORACLE = """
WITH c AS (SELECT round(l_extendedprice * 100, 0)::BIGINT AS cents FROM lineitem)
SELECT (cents // 500000)::BIGINT AS bin_id,
       count(*) AS n_items,
       min(cents) / 100.0::DOUBLE AS min_price,
       max(cents) / 100.0::DOUBLE AS max_price,
       sum(cents)::DOUBLE / 100.0::DOUBLE AS revenue
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# training-mixture scheduling
# ---------------------------------------------------------------------------

def mixture_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch scheduling: temperature-weighted (alpha=0.5)
    target token counts per source under a fixed budget, converted to
    per-source epoch counts capped at 4.0 (the standard small-source
    repetition guard). This is the planning step between
    sampling_temperature (weights) and shard assignment: one corpus
    pass for per-source token counts, then source-cardinality
    arithmetic. sqrt is IEEE-correctly-rounded so the weight rule is
    engine-exact (same contract as sampling_temperature)."""
    budget = 2_000_000
    docs = _t(spark, sf_dir, "documents")
    from kafkaconnect_spark.functions import text as TX

    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count("text")).alias("n_tokens"),
    )
    w7 = F.expr(
        "cast(round(pow(cast(n_tokens as double), 0.5), 7) as decimal(20,7))"
    )
    weighted = per_src.withColumn("__w7", w7)
    denom = weighted.agg(F.sum("__w7").alias("__dw"))
    return (
        weighted.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("__w7").cast("double") / F.col("__dw").cast("double"), 6
            ).alias("weight"),
            F.round(
                F.least(
                    (F.col("__w7").cast("double") / F.col("__dw").cast("double"))
                    * F.lit(float(budget))
                    / F.col("n_tokens"),
                    F.lit(4.0),
                ),
                4,
            ).alias("epochs"),
        )
        .withColumn(
            "planned_tokens",
            F.round(F.col("epochs") * F.col("n_tokens"), 2),
        )
    )


MIXTURE_ORACLE = rf"""
WITH s AS (SELECT source, count(*) AS n_docs,
                  sum({_NTOK_SQL})::BIGINT AS n_tokens
           FROM documents GROUP BY source),
w AS (SELECT *, round(pow(n_tokens::DOUBLE, 0.5), 7)::DECIMAL(20,7) AS w7 FROM s),
d AS (SELECT sum(w7) AS dw FROM w),
e AS (SELECT source, n_docs, n_tokens,
             round(w7::DOUBLE / dw::DOUBLE, 6) AS weight,
             round(least(w7::DOUBLE / dw::DOUBLE * 2000000.0::DOUBLE / n_tokens,
                         4.0::DOUBLE), 4) AS epochs
      FROM w CROSS JOIN d)
SELECT *, round(epochs * n_tokens, 2) AS planned_tokens FROM e
"""


# ---------------------------------------------------------------------------
# windowed distinct + time-bound funnel
# ---------------------------------------------------------------------------

def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per sliding hour (15-min slide) — the windowed-
    distinct shape whose streaming twin is dropDuplicates state per
    window. Native F.window slide (JVM-side ×4 slot expansion) +
    exact per-window countDistinct; the oracle replays the expansion
    as an explicit slot cross join (events_sliding_window's rule)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_users",
        )
    )


SLIDING_DISTINCT_ORACLE = """
WITH k AS (SELECT unnest([0, 1, 2, 3]) AS k),
w AS (SELECT make_timestamp(((epoch_us(ts) // 900000000) - k.k) * 900000000)
               AS window_start,
             user_id
      FROM events CROSS JOIN k)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       count(DISTINCT user_id) AS n_users
FROM w GROUP BY 1, 2
"""


def events_funnel_timebound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bound conversion: users whose FIRST 'view' is followed by
    a 'purchase' within 1 hour — the attribution-window variant of
    events_funnel_conversion. Scale shape: first-view reduce per
    user, then one equi-join on user_id with the time predicate as a
    join filter (never a time-range cross join), one distinct, three
    scalar counts."""
    ev = _events(spark, sf_dir)
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("__vt"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("__pt")
    )
    converted = (
        first_view.join(purchases, "user_id")
        .where(
            (F.col("__pt") > F.col("__vt"))
            & (F.col("__pt") <= F.col("__vt") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("user_id")
        .distinct()
    )
    return (
        first_view.agg(F.count(F.lit(1)).alias("n_viewers"))
        .crossJoin(converted.agg(F.count(F.lit(1)).alias("n_converted_1h")))
        .withColumn(
            "conversion_rate",
            F.round(F.col("n_converted_1h") / F.col("n_viewers"), 6),
        )
    )


FUNNEL_TIMEBOUND_ORACLE = """
WITH fv AS (SELECT user_id, min(ts) AS vt FROM events
            WHERE event_type = 'view' GROUP BY user_id),
conv AS (SELECT DISTINCT fv.user_id
         FROM fv JOIN events p ON p.user_id = fv.user_id
         WHERE p.event_type = 'purchase'
           AND p.ts > fv.vt AND p.ts <= fv.vt + INTERVAL 1 HOUR)
SELECT (SELECT count(*) FROM fv) AS n_viewers,
       (SELECT count(*) FROM conv) AS n_converted_1h,
       round((SELECT count(*) FROM conv)
             / (SELECT count(*) FROM fv), 6) AS conversion_rate
"""


# ---------------------------------------------------------------------------
# OOV accounting
# ---------------------------------------------------------------------------

def docs_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-1000
    vocabulary (freq desc, word asc tie-break) — the token-budget
    sanity check before committing to a tokenizer vocab. Scale shape:
    the vocab reduce is the one corpus-sized pass (vocab-sized
    output, TakeOrdered top-k); membership is a BROADCAST left join
    on the exploded tokens; empty docs come back via a left join from
    the docs table."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+")
        ).alias("word"),
    ).where(F.length("word") > 0)
    vocab = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .orderBy(F.col("__freq").desc(), F.col("word").asc())
        .limit(1000)
        .select("word", F.lit(True).alias("__known"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__known").isNull().cast("long")).alias("n_oov"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.round(F.col("n_oov") / F.col("n_tokens"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("oov_rate"),
        )
    )


OOV_ORACLE = r"""
WITH tk AS (
  SELECT doc_id, unnest(list_filter(
      regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
      x -> length(x) > 0)) AS word
  FROM documents),
v AS (SELECT word FROM (SELECT word, count(*) AS f FROM tk GROUP BY word)
      ORDER BY f DESC, word ASC LIMIT 1000),
pd AS (SELECT tk.doc_id, count(*) AS n_tokens,
              sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
       FROM tk LEFT JOIN v ON tk.word = v.word GROUP BY tk.doc_id)
SELECT d.doc_id,
       coalesce(pd.n_tokens, 0) AS n_tokens,
       coalesce(pd.n_oov, 0) AS n_oov,
       CASE WHEN coalesce(pd.n_tokens, 0) > 0
            THEN round(pd.n_oov / pd.n_tokens, 6) ELSE 0.0 END AS oov_rate
FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
"""


# ---------------------------------------------------------------------------
# KMV sketch algebra
# ---------------------------------------------------------------------------

def events_type_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types from KMV
    sketches alone (operators/sketches.kmv_set_overlap): |A∪B|,
    |A∩B| and Jaccard estimated from two k-row sketches per group —
    the set-operation payoff HLL registers can't give you exactly.
    Deterministic over the shared md5 hash64 → full value-hash
    oracle."""
    from kafkaconnect_spark.operators import sketches

    ev = _events(spark, sf_dir)
    return sketches.kmv_set_overlap(ev, "event_type", "user_id", k=256)


KMV_OVERLAP_ORACLE = f"""
WITH hs AS (SELECT DISTINCT event_type AS g,
                   {_hash64_sql('user_id', 'kmv')} AS h FROM events),
bk AS (SELECT g, h FROM (
         SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
         FROM hs) WHERE rn <= 256),
gs AS (SELECT DISTINCT g FROM bk),
pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
m AS (SELECT p.ga, p.gb, bk.h,
             max(CASE WHEN bk.g = p.ga THEN 1 ELSE 0 END) AS ia,
             max(CASE WHEN bk.g = p.gb THEN 1 ELSE 0 END) AS ib
      FROM pairs p JOIN bk ON bk.g IN (p.ga, p.gb)
      GROUP BY p.ga, p.gb, bk.h),
u AS (SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn FROM m),
a AS (SELECT ga, gb, count(*) AS n_seen, max(h) AS kth,
             sum(ia * ib)::BIGINT AS rho
      FROM u WHERE rn <= 256 GROUP BY ga, gb),
e AS (SELECT *, CASE WHEN n_seen < 256 THEN n_seen
                     ELSE round(255.0::DOUBLE * 1152921504606846976.0::DOUBLE
                                / kth)::BIGINT END AS est
      FROM a)
SELECT ga AS group_a, gb AS group_b, est AS union_est,
       round(rho * est::DOUBLE / n_seen)::BIGINT AS inter_est,
       round(rho / n_seen, 6) AS jaccard_est
FROM e
"""


# ---------------------------------------------------------------------------
# sparse lexical similarity
# ---------------------------------------------------------------------------

def docs_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine document pairs (≥ 0.5) via the df-capped
    inverted-index join (operators/similarity.tfidf_cosine_pairs) —
    the sparse lexical twin of the dense embedding similarity paths,
    with fixed-point integer weights so the oracle replays it
    bit-exact."""
    from kafkaconnect_spark.operators.similarity import tfidf_cosine_pairs

    return tfidf_cosine_pairs(_t(spark, sf_dir, "documents", spread=True))


TFIDF_PAIRS_ORACLE = r"""
WITH tk AS (
  SELECT doc_id, unnest(list_filter(
      regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
      x -> length(x) > 0)) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
        HAVING count(*) BETWEEN 2 AND 100),
n AS (SELECT count(*) AS n FROM documents),
w AS (SELECT tf.doc_id, tf.term,
             ((2 * tf.tf * n.n * 10000 + dfq.df)
              // (2 * dfq.df))::DECIMAL(19,0) AS w
      FROM tf JOIN dfq USING (term) CROSS JOIN n),
nrm AS (SELECT doc_id, sqrt((sum(w * w))::DOUBLE) AS nrm FROM w GROUP BY doc_id),
d AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b USING (term)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b,
       round(dot::DOUBLE / (na.nrm * nb.nrm), 6) AS cosine
FROM d JOIN nrm na ON na.doc_id = id_a JOIN nrm nb ON nb.doc_id = id_b
WHERE round(dot::DOUBLE / (na.nrm * nb.nrm), 6) >= 0.5
"""


# ---------------------------------------------------------------------------
# perceptual image hashing
# ---------------------------------------------------------------------------

def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate-image keys: aHash perceptual fingerprints of
    REAL decoded P6 images (operators/multimodal.perceptual_ahash)
    plus equal-hash bucket sizes — the image-dedup pass of a
    multimodal pipeline. All-integer hashing makes the 64-bit
    pattern replayable from the text bytes by the oracle."""
    from kafkaconnect_spark.operators.multimodal import (
        make_fake_ppm,
        perceptual_ahash,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    hashes = perceptual_ahash(make_fake_ppm(docs))
    buckets = hashes.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_same_hash")
    )
    return hashes.join(buckets, "phash").select("doc_id", "phash", "n_same_hash")


def _phash_oracle() -> str:
    """DuckDB replay of perceptual_ahash over make_fake_ppm images:
    pixel (sx, sy) bytes live at text offset sy·48 + sx·3 (ASCII-
    stripped, zero-padded), the 8×8 sample grid is the pixel-center
    map ((2d+1)·src)//16, and the threshold compare 64·g > Σg is
    all-integer — so the 64-bit pattern is exact. Hex digits emit
    most-significant nibble first (format(v, '016x'))."""

    return rf"""
WITH {_phash_ctes()},
b AS (SELECT phash, count(*) AS n_same_hash FROM ph GROUP BY phash)
SELECT ph.doc_id, ph.phash, b.n_same_hash
FROM ph JOIN b USING (phash)
"""


def _phash_ctes() -> str:
    """The CTE chain ending at ``ph (doc_id, phash)`` — the DuckDB
    replay of perceptual_ahash ∘ make_fake_ppm, shared by the phash
    audit above and the r9 hamming-index lifecycle oracle."""

    def px(off: str) -> str:
        return f"(CASE WHEN {off} <= n THEN ascii(t[({off})::INT]) ELSE 0 END)"

    base = "((((2*(i//8)+1)*h)//16)*48 + (2*(i%8)+1)*3)"
    gray = f"({px(base + ' + 1')} + {px(base + ' + 2')} + {px(base + ' + 3')})"
    # nibble j (left-to-right) packs bits 60-4j .. 63-4j
    nib = (
        "list_sum([CASE WHEN 64 * gs[(60 - 4*j + b) + 1] > s "
        "THEN (1 << b) ELSE 0 END FOR b IN range(0, 4)])"
    )
    return rf"""a AS (SELECT doc_id,
                  regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS t
           FROM documents),
d AS (SELECT doc_id, t, strlen(t) AS n,
             greatest(1, (strlen(t) + 47) // 48)::BIGINT AS h
      FROM a),
g AS (SELECT doc_id, [{gray} FOR i IN range(0, 64)] AS gs FROM d),
p AS (SELECT doc_id, gs, list_sum(gs)::BIGINT AS s FROM g),
ph AS (SELECT doc_id,
              array_to_string([substr('0123456789abcdef', ({nib})::INT + 1, 1)
                               FOR j IN range(0, 16)], '') AS phash
       FROM p)"""


PHASH_ORACLE = _phash_oracle()


# ---------------------------------------------------------------------------
# simhash candidate pairs (Hamming LSH)
# ---------------------------------------------------------------------------

def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup CANDIDATE PAIRS via the band equi-join
    (operators/dedup.simhash_near_dup_pairs): 4 bands of 8 bits, so
    any pair at Hamming < 4 shares a band (pigeonhole) — the Hamming-
    LSH search on top of the dedup_simhash signatures. Output carries
    the exact Hamming distance per candidate pair."""
    from kafkaconnect_spark.operators import dedup as DD

    docs = _t(spark, sf_dir, "documents", spread=True)
    return DD.simhash_near_dup_pairs(docs, band_bits=8, bits=32)


def _simhash_pairs_oracle() -> str:
    from kafkaconnect_spark.query_base import _SIMHASH_BITSUMS, _SIMHASH_VALUE

    return rf"""
WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) tok
           FROM documents),
h AS (SELECT doc_id, ('0x'||substr(md5('simhash:'||tok),1,8))::BIGINT hv FROM t),
bs AS (SELECT doc_id, {_SIMHASH_BITSUMS} FROM h GROUP BY doc_id),
s AS (SELECT doc_id, ({_SIMHASH_VALUE}) AS simhash FROM bs),
bands AS (SELECT doc_id, simhash, band,
                 (simhash // (1::BIGINT << (8 * band))) % 256 AS band_val
          FROM s CROSS JOIN (SELECT unnest(range(0, 4)) AS band))
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM bands a JOIN bands b USING (band, band_val)
WHERE a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# shingle novelty
# ---------------------------------------------------------------------------

def docs_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-novelty metric: fraction of each doc's DISTINCT
    8-gram shingles whose FIRST corpus occurrence (min doc_id) is
    this doc — the content-freshness score a curriculum/ordering pass
    uses, and the per-doc view of the dedup corpus overlap. Scale
    shape: one shingle-hash explode, one distinct, one min-reduce per
    shingle, one equi-join back — all keyed on the 60-bit shingle
    hash, never the text."""
    from kafkaconnect_spark.functions.text import hash64

    docs = _t(spark, sf_dir, "documents", spread=True)
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    sh = (
        docs.select("doc_id", toks.alias("__toks"))
        .select(
            "doc_id",
            # CASE guard: sequence(1, 0) would generate a DESCENDING
            # [1, 0] in Spark, not an empty list
            F.explode(
                F.expr(
                    "CASE WHEN size(__toks) >= 8 THEN "
                    "transform(sequence(1, size(__toks) - 7), "
                    "i -> concat_ws(' ', slice(__toks, i, 8))) "
                    "ELSE array() END"
                )
            ).alias("__sh"),
        )
        .withColumn("__h", hash64(F.col("__sh"), "novelty"))
        .select("doc_id", "__h")
        .distinct()
        .persist()
    )
    # n_novel per doc WITHOUT joining the vocab-sized first-occurrence
    # table back onto the data-sized shingle frame: a shingle is novel
    # for exactly the doc that is its min(doc_id), so grouping the
    # first-occurrence table BY that doc gives the per-doc novel
    # counts directly — both aggregates are map-side combined and the
    # only joins left are between doc-cardinality frames
    novel = (
        sh.groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    per_doc = counts.join(novel, "doc_id", "left")
    from kafkaconnect_spark.operators.dedup import _track_cached

    return _track_cached(
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(F.coalesce("n_novel", F.lit(0)) / F.col("n_shingles"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("novelty"),
        ),
        [sh],  # shingle hashes feed first-occurrence AND per-doc counts
    )


SHINGLE_NOVELTY_ORACLE = rf"""
WITH tk AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                                     '\s+'),
                               x -> length(x) > 0) AS toks
            FROM documents),
sh AS (SELECT DISTINCT doc_id,
              {_hash64_sql("array_to_string(toks[i:i+7], ' ')", 'novelty')} AS h
       FROM tk, unnest(range(1, greatest(len(toks) - 6, 1))) AS u(i)
       WHERE len(toks) >= 8),
f AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h),
pd AS (SELECT sh.doc_id, count(*) AS n_shingles,
              sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)::BIGINT
                AS n_novel
       FROM sh JOIN f USING (h) GROUP BY sh.doc_id)
SELECT d.doc_id,
       coalesce(pd.n_shingles, 0) AS n_shingles,
       coalesce(pd.n_novel, 0) AS n_novel,
       CASE WHEN coalesce(pd.n_shingles, 0) > 0
            THEN round(pd.n_novel / pd.n_shingles, 6) ELSE 0.0 END AS novelty
FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
"""


# ---------------------------------------------------------------------------
# growth + concentration analytics
# ---------------------------------------------------------------------------

def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth curve: new users (first-ever event that day),
    daily active users, and the cumulative user count. The running
    sum's partitionless window is calendar-bounded (≤ days rows after
    aggregation — same justification as orders_monthly_growth), never
    a data-sized global sort."""
    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    new_users = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    active = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new_users, "day", "left")
        .select("day", F.coalesce("n_new", F.lit(0)).alias("n_new"), "n_active")
        .withColumn("cum_users", F.sum("n_new").over(w))
    )


CUMULATIVE_USERS_ORACLE = """
WITH e AS (SELECT ts::DATE AS day, user_id FROM events),
fd AS (SELECT user_id, min(day) AS day FROM e GROUP BY user_id),
nu AS (SELECT day, count(*) AS n_new FROM fd GROUP BY day),
ac AS (SELECT day, count(DISTINCT user_id) AS n_active FROM e GROUP BY day)
SELECT ac.day, coalesce(nu.n_new, 0) AS n_new, ac.n_active,
       sum(coalesce(nu.n_new, 0)) OVER (ORDER BY ac.day
           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
FROM ac LEFT JOIN nu ON ac.day = nu.day
"""


def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the share of total revenue held by
    customers above the P90 spend fence — the 80/20 dashboard
    number. The percentile runs on the CUSTOMER-aggregated frame via
    a broadcast fence (customers_rfm_segments discipline, no global
    ntile); revenue stays DECIMAL until the final ratio."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice"), 2).cast(T.DecimalType(18, 2))).alias(
            "__mdec"
        )
    ).withColumn("monetary", F.col("__mdec").cast("double"))
    fence = m.agg(
        F.round(
            F.expr("percentile(monetary, cast(0.9 as double))"), 6
        ).alias("__p90")
    )
    flagged = m.crossJoin(F.broadcast(fence))
    top = F.col("monetary") > F.col("__p90")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(top.cast("long")).alias("n_top"),
        F.sum("__mdec").cast("double").alias("revenue_total"),
        F.sum(F.when(top, F.col("__mdec"))).cast("double").alias("revenue_top"),
        F.round(
            F.sum(F.when(top, F.col("__mdec"))).cast("double")
            / F.sum("__mdec").cast("double"),
            6,
        ).alias("top_share"),
    )


PARETO_ORACLE = """
WITH m AS (SELECT o_custkey AS custkey,
                  sum(round(o_totalprice, 2)::DECIMAL(18,2)) AS mdec,
                  sum(round(o_totalprice, 2)::DECIMAL(18,2))::DOUBLE AS monetary
           FROM orders GROUP BY 1),
f AS (SELECT round(quantile_cont(monetary, 0.9), 6) AS p90 FROM m)
SELECT count(*) AS n_customers,
       sum((monetary > p90)::INT)::BIGINT AS n_top,
       sum(mdec)::DOUBLE AS revenue_total,
       sum(CASE WHEN monetary > p90 THEN mdec END)::DOUBLE AS revenue_top,
       round(sum(CASE WHEN monetary > p90 THEN mdec END)::DOUBLE
             / sum(mdec)::DOUBLE, 6) AS top_share
FROM m CROSS JOIN f
"""


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes + reconstruction error for every
    embedding (operators/similarity.pq_codes): 4 subspaces × 8 codes,
    deterministic codebooks — the compression step under billion-
    scale ANN. Pure map stage (codebooks folded as literals)."""
    from kafkaconnect_spark.operators.similarity import pq_codes

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    return pq_codes(emb, n_sub=4, n_codes=8, dim=64)


def _pq_oracle(n_sub: int = 4, n_codes: int = 8, d: int = 16) -> str:
    sql = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, vec AS cvec
       FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT {n_codes}))"""
    for s in range(n_sub):
        lo, hi = s * d + 1, s * d + d + 1
        diff = f"[v.vec[i] - c.cvec[i] FOR i IN range({lo}, {hi})]"
        sql += f""",
s{s} AS (SELECT vec_id, code AS code_{s}, dist AS d{s} FROM (
    SELECT vec_id, code, dist,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY dist ASC, code ASC) AS rn
    FROM (SELECT v.vec_id, c.code,
                 round(list_dot_product({diff}, {diff}), 6) AS dist
          FROM v CROSS JOIN cb c)) WHERE rn = 1)"""
    joins = " ".join(f"JOIN s{s} USING (vec_id)" for s in range(1, n_sub))
    codes = ", ".join(f"code_{s}::INT AS code_{s}" for s in range(n_sub))
    err = " + ".join(f"d{s}" for s in range(n_sub))
    return sql + f"""
SELECT vec_id, {codes}, round({err}, 6) AS quant_err
FROM s0 {joins}
"""


PQ_ORACLE = _pq_oracle()


# ---------------------------------------------------------------------------
# per-source quality dashboards
# ---------------------------------------------------------------------------

def docs_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate (distinct md5 fingerprints vs
    rows) — the first number a data-vendor scorecard shows. One
    map-side-combined groupBy over (source, fingerprint), then a
    source-cardinality reduce."""
    from kafkaconnect_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    fp = docs.select("source", TX.fingerprint_md5("text").alias("__fp"))
    per = fp.groupBy("source", "__fp").agg(F.count(F.lit(1)).alias("__n"))
    return per.groupBy("source").agg(
        F.sum("__n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        F.round(
            (F.sum("__n") - F.count(F.lit(1))) / F.sum("__n"), 6
        ).alias("dup_rate"),
    )


DEDUP_RATE_ORACLE = r"""
WITH fp AS (SELECT source,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
            FROM documents),
per AS (SELECT source, fp, count(*) AS n FROM fp GROUP BY 1, 2)
SELECT source, sum(n)::BIGINT AS n_docs, count(*) AS n_unique,
       round((sum(n) - count(*)) / sum(n), 6) AS dup_rate
FROM per GROUP BY source
"""


def events_error_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error-share SLO curve: error events vs all events per
    hour bucket — single scan, conditional aggregate, output bounded
    by the calendar."""
    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        ev.groupBy(hour.alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        )
        .withColumn(
            "error_rate", F.round(F.col("n_errors") / F.col("n_events"), 6)
        )
    )


ERROR_RATE_ORACLE = """
SELECT date_trunc('hour', ts) AS hour,
       count(*) AS n_events,
       sum((event_type = 'error')::INT)::BIGINT AS n_errors,
       round(sum((event_type = 'error')::INT) / count(*), 6) AS error_rate
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# phash Hamming-LSH, Markov transitions, histogram-exact percentiles
# ---------------------------------------------------------------------------

def multimodal_phash_hamming(
    spark: SparkSession, sf_dir: str, max_band_postings: int = 256
) -> DataFrame:
    """NEAR-duplicate image candidates: Hamming-LSH over the aHash
    fingerprints — 4 bands of 16 bits, so any pair at Hamming < 4
    (of 64) shares a band by pigeonhole; candidates carry the exact
    Hamming distance. Same band-equi-join discipline as
    dedup_simhash_pairs, completing the image-dedup story beyond
    equal-hash buckets. The 64-bit hash rides as two 32-bit BIGINTs
    (a single 64-bit value would overflow the signed conv in both
    engines).

    ``max_band_postings`` (default ON) drops DEGENERATE band values
    from the candidate join — aHash has natural megabuckets (an
    all-bright quarter hashes to 0xFFFF; ~20% of this corpus shares
    it, and one such bucket alone contributed ~480k of 632k pairs at
    sf0.1). Docs in a megabucket are still reachable through their
    other three bands; the cap bounds per-band join fan-out at cap²
    — the hot-shingle-cap discipline. Mirrored in the oracle."""
    from kafkaconnect_spark.operators.multimodal import (
        make_fake_ppm,
        perceptual_ahash,
    )

    from pyspark import StorageLevel

    from kafkaconnect_spark.operators.dedup import _track_cached

    docs = _t(spark, sf_dir, "documents", spread=True)
    hashes = perceptual_ahash(make_fake_ppm(docs))
    # persist the (doc-cardinality) signature table: it feeds the band
    # cardinality count AND both sides of the candidate self-join —
    # without the cache the image-decode mapInPandas pipeline executes
    # once per consumer (same fix as simhash_near_dup_pairs)
    sig = hashes.select(
        "doc_id",
        F.conv(F.substring("phash", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("phash", 9, 8), 16, 10).cast("long").alias("lo"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    banded = sig.select(
        "doc_id",
        "hi",
        "lo",
        F.posexplode(
            F.expr(
                "array((hi div 65536) % 65536, hi % 65536, "
                "(lo div 65536) % 65536, lo % 65536)"
            )
        ).alias("band", "band_val"),
    )
    sizes = banded.groupBy("band", "band_val").agg(
        F.count(F.lit(1)).alias("__bc")
    )
    banded = banded.join(
        sizes.where(F.col("__bc") <= max_band_postings), ["band", "band_val"]
    ).drop("__bc")
    a, b = banded.alias("a"), banded.alias("b")
    return _track_cached(
        a.join(b, ["band", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
                + F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
            ).alias("hamming"),
        )
        .distinct(),
        [sig],
    )


def _phash_hamming_oracle() -> str:
    base = _phash_oracle()
    # reuse the phash CTE chain up to `ph`, then band-join
    head = base[: base.index("b AS (SELECT phash")]
    return head + """sig AS (SELECT doc_id,
              ('0x' || substr(phash, 1, 8))::BIGINT AS hi,
              ('0x' || substr(phash, 9, 8))::BIGINT AS lo
       FROM ph),
bands0 AS (SELECT doc_id, hi, lo, band,
                  CASE band WHEN 0 THEN (hi // 65536) % 65536
                            WHEN 1 THEN hi % 65536
                            WHEN 2 THEN (lo // 65536) % 65536
                            ELSE lo % 65536 END AS band_val
           FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
bsz AS (SELECT band, band_val, count(*) AS bc
        FROM bands0 GROUP BY 1, 2),
bands AS (SELECT bands0.* FROM bands0 JOIN bsz USING (band, band_val)
          WHERE bsz.bc <= 256)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       (bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)))::INT
         AS hamming
FROM bands a JOIN bands b USING (band, band_val)
WHERE a.doc_id < b.doc_id
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    counts + row-normalized probabilities) — the session-model input
    for next-action prediction and bot screening. The lag runs over a
    KEYED window (per user, ordered by ts then event_id for total
    order); counts reduce map-side."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = trans.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("__row_total")
    )
    return trans.join(totals, "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("__row_total"), 6).alias(
            "probability"
        ),
    )


MARKOV_ORACLE = """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type
           FROM events),
t AS (SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
r AS (SELECT prev_type, sum(n_transitions)::BIGINT AS row_total
      FROM t GROUP BY 1)
SELECT t.prev_type, t.next_type, t.n_transitions,
       round(t.n_transitions / r.row_total, 6) AS probability
FROM t JOIN r USING (prev_type)
"""


def docs_length_percentiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT nearest-rank p50/p90/p99 of doc length per language via
    a VALUE-HISTOGRAM cumulative — the scale-correct exact-percentile
    shape when the value space is bounded (lengths, latencies,
    prices): groupBy (lang, n_chars) reduces the corpus to the
    distinct-value histogram, the cumulative window runs over that
    bounded frame (never data-sized), and the nearest-rank pick is a
    conditional min. No per-group sort, no data-sized window, no
    giant collect_list."""
    docs = _t(spark, sf_dir, "documents")
    hist = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    totals = hist.groupBy("lang").agg(F.sum("__c").alias("__n"))
    j = cum.join(totals, "lang")
    picks = [
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.col("__n") * F.lit(q)), F.col("n_chars")
            )
        ).alias(name)
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
    ]
    return j.groupBy("lang").agg(F.max("__n").alias("n_docs"), *picks)


LENGTH_PCT_ORACLE = """
WITH h AS (SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
cum AS (SELECT lang, n_chars, c,
               sum(c) OVER (PARTITION BY lang ORDER BY n_chars
                            ROWS UNBOUNDED PRECEDING) AS cm
        FROM h),
t AS (SELECT lang, sum(c)::BIGINT AS n FROM h GROUP BY lang)
SELECT cum.lang, max(t.n) AS n_docs,
       min(CASE WHEN cm >= ceil(t.n * 0.5) THEN n_chars END) AS p50,
       min(CASE WHEN cm >= ceil(t.n * 0.9) THEN n_chars END) AS p90,
       min(CASE WHEN cm >= ceil(t.n * 0.99) THEN n_chars END) AS p99
FROM cum JOIN t USING (lang) GROUP BY cum.lang
"""


R3_CATALOG: dict[str, tuple] = {
    "referential_integrity_audit": (referential_integrity_audit, REF_INTEGRITY_ORACLE),
    "events_user_erasure_audit": (events_user_erasure_audit, ERASURE_ORACLE),
    "events_key_skew_report": (events_key_skew_report, KEY_SKEW_ORACLE),
    "lineitem_price_histogram": (lineitem_price_histogram, PRICE_HIST_ORACLE),
    "mixture_epoch_schedule": (mixture_epoch_schedule, MIXTURE_ORACLE),
    "events_sliding_distinct": (events_sliding_distinct, SLIDING_DISTINCT_ORACLE),
    "events_funnel_timebound": (events_funnel_timebound, FUNNEL_TIMEBOUND_ORACLE),
    "docs_oov_rate": (docs_oov_rate, OOV_ORACLE),
    "events_type_overlap_kmv": (events_type_overlap_kmv, KMV_OVERLAP_ORACLE),
    "docs_tfidf_pairs": (docs_tfidf_pairs, TFIDF_PAIRS_ORACLE),
    "multimodal_phash": (multimodal_phash, PHASH_ORACLE),
    "dedup_simhash_pairs": (dedup_simhash_pairs, _simhash_pairs_oracle()),
    "docs_shingle_novelty": (docs_shingle_novelty, SHINGLE_NOVELTY_ORACLE),
    "events_cumulative_users": (events_cumulative_users, CUMULATIVE_USERS_ORACLE),
    "orders_pareto_share": (orders_pareto_share, PARETO_ORACLE),
    "embedding_pq_codes": (embedding_pq_codes, PQ_ORACLE),
    "docs_dedup_rate_by_source": (docs_dedup_rate_by_source, DEDUP_RATE_ORACLE),
    "events_error_rate_hourly": (events_error_rate_hourly, ERROR_RATE_ORACLE),
    "multimodal_phash_hamming": (multimodal_phash_hamming, _phash_hamming_oracle()),
    "events_markov_transitions": (events_markov_transitions, MARKOV_ORACLE),
    "docs_length_percentiles_by_lang": (
        docs_length_percentiles_by_lang,
        LENGTH_PCT_ORACLE,
    ),
}

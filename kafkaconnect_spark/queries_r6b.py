"""Round-6 catalog batch 3 — audit/tuning instrumentation over the
proven operator substrate: minhash estimator error, the banding
S-curve sweep, co-purchase neighbor similarity, int8 ANN recall, the
dedup survivorship-bias audit, the perplexity-filter threshold sweep,
bot-regularity screening, binary-blob exact dedup, the KMV k sweep,
chunk-level boilerplate dedup, BPE fertility by language, and
per-subspace PQ distortion.

Same determinism rules as queries.py: md5-derived hashes shared with
DuckDB, integer/DECIMAL arithmetic until a final rounded division,
every aggregate aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaconnect_spark.query_base import (
    _MINHASH_AGGS,
    _SHINGLE_CTE,
    _SIG_LIST,
    _events,
    _hash64_sql,
    _t,
)


# ---------------------------------------------------------------------------
# minhash estimator error — how wrong is the signature estimate?
# ---------------------------------------------------------------------------

def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error of the 16-hash minhash Jaccard ESTIMATE (fraction of
    agreeing signature components) against exact shingle Jaccard, per
    0.1-wide exact-similarity bucket, over every LSH band collision
    (threshold 0 keeps the false positives — the estimator's error is
    most interesting exactly where collisions are spurious). This is
    the measured answer to "are 16 hashes enough", complementing
    dedup_lsh_recall_audit (which scores the BANDING, not the
    estimator).

    Scale shape: the candidate set is the production band equi-join;
    signatures join back by id (narrow, num_hashes longs per row);
    per-pair agreement is a zip_with fold; the output is a ≤ 11-key
    agg with DECIMAL-summed error terms (order-independent)."""
    from kafkaconnect_spark.operators import dedup
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents", spread=True)
    sharr = dedup.shingle_arrays(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = (
        dedup._signatures_from_arrays(sharr, 16, "doc_id")
        .select("doc_id", "sig")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cands = dedup.minhash_lsh_candidates(sigs, bands=4)
    pairs = dedup._jaccard_verify(cands, sharr, sharr, 0.0, "id_a", "id_b")
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("__sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("__sig_b"))
    est = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "__est",
            F.round(
                F.expr(
                    "aggregate(zip_with(__sig_a, __sig_b,"
                    " (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
                )
                / F.lit(16.0),
                6,
            ),
        )
        .withColumn(
            "bucket", F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int")
        )
        .withColumn(
            "__err",
            F.round(F.abs(F.col("__est") - F.col("jaccard")), 7).cast(
                "decimal(20,7)"
            ),
        )
    )
    out = est.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum("__err").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_abs_err"),
        F.round(F.max("__err").cast("double"), 6).alias("max_abs_err"),
    )
    return dedup._track_cached(out, [sharr, sigs])


MINHASH_EST_ERROR_ORACLE = rf"""
WITH {_SHINGLE_CTE},
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
cands AS (
  SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT id_a, id_b, count(*) inter
  FROM cands JOIN sh a ON a.doc_id = id_a
       JOIN sh b ON b.doc_id = id_b AND a.shingle = b.shingle
  GROUP BY 1, 2),
pairs AS (
  SELECT c.id_a, c.id_b,
         round(coalesce(i.inter, 0) / (sa.sz + sb.sz - coalesce(i.inter, 0)), 6)
           AS jaccard
  FROM cands c LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       JOIN sizes sa ON sa.doc_id = c.id_a
       JOIN sizes sb ON sb.doc_id = c.id_b),
ests AS (
  SELECT p.id_a, p.id_b, p.jaccard,
         round(len(list_filter(range(1, 17),
                   i -> a.sig[i] = b.sig[i])) / 16.0, 6) AS est
  FROM pairs p JOIN sigs a ON a.doc_id = p.id_a
       JOIN sigs b ON b.doc_id = p.id_b),
terms AS (
  SELECT least(floor(jaccard * 10), 9)::INT AS bucket,
         round(abs(est - jaccard), 7)::DECIMAL(20,7) AS err
  FROM ests)
SELECT bucket, count(*)::BIGINT AS n_pairs,
       round(sum(err)::DOUBLE / count(*), 6) AS mean_abs_err,
       round(max(err)::DOUBLE, 6) AS max_abs_err
FROM terms GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# banding S-curve sweep — recall/precision per (bands, rows) from ONE pass
# ---------------------------------------------------------------------------

def dedup_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH S-curve measured, not assumed: from ONE 16-hash
    signature pass, band into b ∈ {1, 2, 4} (rows-per-band 16/8/4)
    and score each banding's candidate set against exact n-gram
    Jaccard truth at threshold 0.2 — recall rises with b, precision
    falls, and THIS table (not the analytic 1-(1-s^r)^b curve, which
    assumes uniform shingle collision) is how production picks the
    banding before trusting LSH at 100 TB. b stops at the production
    4: wider bands (r ≤ 2) admit candidate sets that scale with
    all-pairs density — a cost cliff the sweep documents by NOT
    crossing it.

    Scale shape: shingles + signatures computed once (persisted);
    each sweep point adds one band equi-join + the bounded verify
    join; truth is the proven capped-inverted-index pipeline; output
    is 3 rows."""
    from kafkaconnect_spark.operators import dedup
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents", spread=True)
    sharr = dedup.shingle_arrays(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = (
        dedup._signatures_from_arrays(sharr, 16, "doc_id")
        .select("doc_id", "sig")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the truth pipeline reuses the SAME persisted shingle pass (r11 —
    # it previously re-shingled the corpus for its inverted index)
    truth_n = dedup.ngram_jaccard_pairs(
        docs, threshold=0.2, precomputed_sharr=sharr
    ).agg(F.count(F.lit(1)).alias("n_truth"))
    points = []
    for b in (1, 2, 4):
        cands = dedup.minhash_lsh_candidates(sigs, bands=b)
        ver = dedup._jaccard_verify(cands, sharr, sharr, 0.0, "id_a", "id_b")
        points.append(
            ver.agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.sum((F.col("jaccard") >= 0.2).cast("long")).alias("n_hits"),
            ).select(
                F.lit(b).alias("bands"),
                F.lit(16 // b).alias("rows_per_band"),
                "n_candidates",
                "n_hits",
            )
        )
    sweep = points[0].unionAll(points[1]).unionAll(points[2])
    out = sweep.crossJoin(F.broadcast(truth_n)).select(
        "bands",
        "rows_per_band",
        "n_candidates",
        "n_hits",
        "n_truth",
        F.round(F.col("n_hits") / F.col("n_truth"), 6).alias("recall"),
        F.round(F.col("n_hits") / F.col("n_candidates"), 6).alias("precision"),
    )
    return dedup._track_cached(out, [sharr, sigs])


def _band_sweep_oracle() -> str:
    bandeds = ",\n".join(
        f"""banded{b} AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(sig[b*{16 // b}+1 : b*{16 // b}+{16 // b}], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, {b})) AS b))"""
        for b in (1, 2, 4)
    )
    point = """
SELECT {b} AS bands, {r} AS rows_per_band,
       count(*)::BIGINT AS n_candidates,
       sum(CASE WHEN jaccard >= 0.2 THEN 1 ELSE 0 END)::BIGINT AS n_hits
FROM (
  SELECT round(coalesce(i.inter, 0)
               / (sa.sz + sb.sz - coalesce(i.inter, 0)), 6) AS jaccard
  FROM (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
        FROM banded{b} a JOIN banded{b} b USING (band, band_hash)
        WHERE a.doc_id < b.doc_id) c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b)"""
    sweep = " UNION ALL ".join(
        point.format(b=b, r=16 // b) for b in (1, 2, 4)
    )
    return rf"""
WITH {_SHINGLE_CTE},
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
{bandeds},
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS (
  SELECT count(*)::BIGINT AS n_truth
  FROM inter JOIN sizes sa ON sa.doc_id = id_a
       JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2),
sweep AS ({sweep})
SELECT bands, rows_per_band, n_candidates, n_hits, n_truth,
       round(n_hits::DOUBLE / n_truth, 6) AS recall,
       round(n_hits::DOUBLE / n_candidates, 6) AS precision
FROM sweep CROSS JOIN truth
"""


BAND_SWEEP_ORACLE = _band_sweep_oracle()


# ---------------------------------------------------------------------------
# co-purchase neighbor Jaccard — "similar items" from graph structure
# ---------------------------------------------------------------------------

def parts_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar part pairs by neighbor-set Jaccard over the
    co-purchase graph (capped-basket edges, weight ≥ 2 — the
    parts_copurchase_edges semantics): parts bought alongside the
    SAME OTHER PARTS are substitutes/complements even if never
    co-purchased directly — the classic item-item collaborative
    filter. Ties break on (part_a, part_b) so the top-20 SET is
    deterministic.

    Scale shape: the wedge join through the shared neighbor is
    Σ deg²-bounded on the thresholded graph (same bound as
    parts_clustering_coefficient); degrees are one keyed agg; top-20
    is TakeOrdered — no global sort materializes."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__bsz"))
    li = li.join(sizes.where(F.col("__bsz") <= 256), "l_orderkey").drop("__bsz")
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )
    adj = edges.select(
        F.col("part_a").alias("u"), F.col("part_b").alias("v")
    ).unionAll(edges.select(F.col("part_b").alias("u"), F.col("part_a").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    w1 = adj.select(F.col("u").alias("part_a"), F.col("v").alias("n"))
    w2 = adj.select(F.col("u").alias("part_b"), F.col("v").alias("n"))
    common = (
        w1.join(w2, "n")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    da = deg.select(F.col("u").alias("part_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("part_b"), F.col("deg").alias("deg_b"))
    return (
        common.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "common_neighbors",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common_neighbors")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


NEIGHBOR_JACCARD_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY 1 HAVING count(*) <= 256)),
edges AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
adj AS (SELECT part_a AS u, part_b AS v FROM edges
        UNION ALL SELECT part_b, part_a FROM edges),
deg AS (SELECT u, count(*) AS deg FROM adj GROUP BY u),
common AS (
  SELECT w1.u AS part_a, w2.u AS part_b, count(*) AS common_neighbors
  FROM adj w1 JOIN adj w2 ON w1.v = w2.v AND w1.u < w2.u
  GROUP BY 1, 2)
SELECT part_a, part_b, common_neighbors, da.deg AS deg_a, db.deg AS deg_b,
       round(common_neighbors
             / (da.deg + db.deg - common_neighbors), 6) AS jaccard
FROM common JOIN deg da ON da.u = part_a JOIN deg db ON db.u = part_b
ORDER BY jaccard DESC, part_a ASC, part_b ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# int8 quantization ANN recall — what does SQ8 storage cost in recall?
# ---------------------------------------------------------------------------

def embedding_int8_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 recall of cosine search over the int8-quantized corpus
    (per-vector symmetric scale = max|v|/127 — the
    embedding_quantize_int8 rule; queries stay float, the usual SQ8
    deployment) against exact float brute force, per query. The
    measured answer to "can we store the 100 TB corpus at 8 bits" —
    the memory-4× step BEFORE IVF/PQ, auditable per query rather
    than argued from the reconstruction MAE.

    Scale shape: two brute-force scans (10 queries × corpus, narrow
    folds) + one (query, neighbor)-keyed overlap join of two 100-row
    top-k tables."""
    from kafkaconnect_spark.operators import similarity

    emb = (
        _t(spark, sf_dir, "embeddings", spread=True)
        .where(F.size("embedding") > 0)
        .select("vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"))
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, q, k=10)
    deq = emb.withColumn(
        "__scale",
        F.greatest(
            F.expr("array_max(transform(embedding, v -> abs(v)))"),
            F.lit(1e-12),
        )
        / F.lit(127.0),
    ).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> round(x / __scale) * __scale)"
        ).alias("embedding"),
    )
    quant = similarity.brute_force_topk(deq, q, k=10)
    overlap = (
        exact.select("query_id", "neighbor_id")
        .join(quant.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__k"))
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("__k"), 6
            ).alias("recall_at_10"),
        )
    )


INT8_RECALL_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 10),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY
             round(list_dot_product(qv, e.vec) /
                   (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
             e.vec_id ASC) AS rn
    FROM v e, q WHERE e.vec_id != q.query_id) WHERE rn <= 10),
dq AS (
  SELECT vec_id,
         list_transform(vec,
           x -> round(x / (greatest(list_max(list_transform(vec,
                    v -> abs(v))), 1e-12) / 127.0))
                * (greatest(list_max(list_transform(vec, v -> abs(v))),
                            1e-12) / 127.0)) AS vec
  FROM v),
quant AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY
             round(list_dot_product(qv, e.vec) /
                   (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
             e.vec_id ASC) AS rn
    FROM dq e, q WHERE e.vec_id != q.query_id) WHERE rn <= 10),
ov AS (
  SELECT query_id, count(*)::BIGINT AS n_overlap
  FROM exact JOIN quant USING (query_id, neighbor_id) GROUP BY 1),
ks AS (SELECT query_id, count(*) AS k FROM exact GROUP BY 1)
SELECT ks.query_id, coalesce(ov.n_overlap, 0) AS n_overlap,
       round(coalesce(ov.n_overlap, 0)::DOUBLE / ks.k, 6) AS recall_at_10
FROM ks LEFT JOIN ov USING (query_id)
"""


# ---------------------------------------------------------------------------
# dedup survivorship bias — what did the keep-policy remove, per source?
# ---------------------------------------------------------------------------

def docs_dedup_removal_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship audit of exact dedup with the longest-doc-wins
    keep policy (the dedup_keep_policy rule applied to exact
    fingerprint groups): per source, how many docs the policy removes
    and whether removal is length-biased (mean chars of removed vs
    kept). A source whose removed docs are systematically longer than
    its kept docs signals the tiebreak is discarding content, not
    boilerplate — the audit you run BEFORE shipping a dedup'd corpus.

    Scale shape: one map (fingerprint), one keyed row_number per
    fingerprint group, one per-source agg; sums stay integral until
    the final rounded divisions."""
    from kafkaconnect_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", TX.fingerprint_md5("text").alias("__fp")
    )
    w = Window.partitionBy("__fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    tagged = docs.withColumn(
        "__removed", (F.row_number().over(w) > 1).cast("long")
    )
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__removed").alias("n_removed"),
        F.round(F.sum("__removed") / F.count(F.lit(1)), 6).alias("removal_rate"),
        F.round(
            F.sum(F.col("n_chars") * F.col("__removed"))
            / F.nullif(F.sum("__removed"), F.lit(0)),
            6,
        ).alias("mean_chars_removed"),
        F.round(
            F.sum(F.col("n_chars") * (1 - F.col("__removed")))
            / (F.count(F.lit(1)) - F.sum("__removed")),
            6,
        ).alias("mean_chars_kept"),
    )


REMOVAL_BIAS_ORACLE = r"""
WITH t AS (
  SELECT doc_id, source, n_chars,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents),
tagged AS (
  SELECT source, n_chars,
         CASE WHEN row_number() OVER (PARTITION BY fp
                ORDER BY n_chars DESC, doc_id ASC) > 1
              THEN 1 ELSE 0 END AS removed
  FROM t)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(removed)::BIGINT AS n_removed,
       round(sum(removed)::DOUBLE / count(*), 6) AS removal_rate,
       round(sum(n_chars * removed)::DOUBLE
             / nullif(sum(removed), 0), 6) AS mean_chars_removed,
       round(sum(n_chars * (1 - removed))::DOUBLE
             / (count(*) - sum(removed)), 6) AS mean_chars_kept
FROM tagged GROUP BY source
"""


# ---------------------------------------------------------------------------
# perplexity-filter threshold sweep — the quality-filter tuning curve
# ---------------------------------------------------------------------------

def docs_perplexity_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bits-per-bigram filter tuning curve: score every doc ONCE under
    the corpus bigram LM (text_bigram_lm_bits semantics), then report
    the kept-corpus size and mean length at thresholds τ ∈ {4.8,
    4.85, 4.9, 5.0} bits — the single-pass sweep that prices a
    perplexity filter before committing to a cutoff (the
    watermark/session-gap sweep pattern applied to quality
    filtering). Docs with < 2 tokens carry no bigram evidence and are
    excluded from the curve (reported by every τ row's n_scored).

    Scale shape: one LM scoring pass (the proven bigram_lm_score
    plan), one 4-way threshold explode over the doc-level score table
    (docs × 4 small rows), one 4-key agg."""
    from kafkaconnect_spark.operators import pipeline

    docs = _t(spark, sf_dir, "documents")
    scored = pipeline.bigram_lm_score(docs).where(F.col("n_bigrams") > 0)
    j = scored.join(docs.select("doc_id", "n_chars"), "doc_id")
    swept = j.select(
        "bits_per_bigram",
        "n_chars",
        F.explode(
            F.array(*[F.lit(t) for t in (4.8, 4.85, 4.9, 5.0)])
        ).alias("tau"),
    )
    return swept.groupBy("tau").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum((F.col("bits_per_bigram") <= F.col("tau")).cast("long")).alias(
            "n_kept"
        ),
        F.round(
            F.sum((F.col("bits_per_bigram") <= F.col("tau")).cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("frac_kept"),
        F.round(
            F.sum(
                F.col("n_chars")
                * (F.col("bits_per_bigram") <= F.col("tau")).cast("long")
            )
            / F.nullif(
                F.sum((F.col("bits_per_bigram") <= F.col("tau")).cast("long")),
                F.lit(0),
            ),
            6,
        ).alias("mean_chars_kept"),
    )


def _ppl_sweep_oracle(base: str) -> str:
    return rf"""
WITH base AS ({base}),
sc AS (SELECT b.doc_id, b.bits_per_bigram, d.n_chars
       FROM base b JOIN documents d USING (doc_id)
       WHERE b.n_bigrams > 0),
swept AS (SELECT sc.*, tau FROM sc,
          (SELECT unnest([4.8::DOUBLE, 4.85::DOUBLE,
                          4.9::DOUBLE, 5.0::DOUBLE]) AS tau))
SELECT tau, count(*)::BIGINT AS n_scored,
       sum(CASE WHEN bits_per_bigram <= tau THEN 1 ELSE 0 END)::BIGINT
         AS n_kept,
       round(sum(CASE WHEN bits_per_bigram <= tau THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS frac_kept,
       round(sum(n_chars * CASE WHEN bits_per_bigram <= tau THEN 1 ELSE 0 END)::DOUBLE
             / nullif(sum(CASE WHEN bits_per_bigram <= tau THEN 1 ELSE 0 END), 0),
             6) AS mean_chars_kept
FROM swept GROUP BY tau
"""


# ---------------------------------------------------------------------------
# bot-regularity screen — inhumanly periodic users
# ---------------------------------------------------------------------------

def events_bot_regularity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival regularity per user (≥ 10 events): coefficient of
    variation of the gap series — human traffic is bursty (CV ≈ 1,
    Poisson), scripted traffic is periodic (CV → 0). The standard
    crawl-corpus bot screen, run on event telemetry before the
    associated content enters training data. Flags CV < 0.8.

    Determinism: gaps ordered by (ts, event_id); Σgap and Σgap² are
    exact (bigint µs terms, DECIMAL accumulation) so mean/variance
    derive from identical exact sums in both engines; doubles only in
    the final CV expression. mean_gap_s is rounded to whole µs with
    INTEGER half-up arithmetic ((2Σ+n) div 2n) before the /1e6 —
    Σ/n lands on the .5 µs boundary whenever Σ ≡ n/2 (mod n), where
    engine double-rounding paths disagree in the 6th decimal.

    Scale shape: one keyed lag window, one per-user agg — no global
    window, no collect."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn(
            "__gap_us",
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
        )
        .where(F.col("__gap_us").isNotNull())
    )
    # gap² is squared BEFORE summation and gaps can reach days in µs
    # (≈ 10¹¹), so the square must leave bigint before the multiply —
    # decimal(19,0)² keeps every product exact (Spark caps the result
    # at decimal(38,0), values stay far below 10³⁸)
    g19 = F.col("__gap_us").cast("decimal(19,0)")
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__gap_us").cast("decimal(38,0)")).alias("__s"),
        F.sum(g19 * g19).alias("__sq"),
    )
    out = (
        stats.where(F.col("__n") >= 9)
        .withColumn("__mean", F.col("__s").cast("double") / F.col("__n"))
        .withColumn(
            "__var",
            F.greatest(
                F.col("__sq").cast("double") / F.col("__n")
                - (F.col("__s").cast("double") / F.col("__n"))
                * (F.col("__s").cast("double") / F.col("__n")),
                F.lit(0.0),
            ),
        )
        .select(
            "user_id",
            (F.col("__n") + 1).alias("n_events"),
            (
                F.expr("CAST((__s * 2 + __n) DIV (__n * 2) AS BIGINT)")
                / F.lit(1e6)
            ).alias("mean_gap_s"),
            F.round(F.sqrt(F.col("__var")) / F.col("__mean"), 6).alias("cv"),
            (F.sqrt(F.col("__var")) / F.col("__mean") < 0.8).alias(
                "is_regular"
            ),
        )
    )
    return out


BOT_REGULARITY_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events),
s AS (
  SELECT user_id, count(*) AS n,
         sum(gap)::DECIMAL(38,0) AS sg,
         sum(gap::DECIMAL(19,0) * gap::DECIMAL(19,0))::DECIMAL(38,0) AS sq
  FROM g WHERE gap IS NOT NULL GROUP BY user_id HAVING count(*) >= 9),
m AS (
  SELECT user_id, n, sg, sg::DOUBLE / n AS mean,
         greatest(sq::DOUBLE / n - (sg::DOUBLE / n) * (sg::DOUBLE / n),
                  0.0) AS var
  FROM s)
SELECT user_id, (n + 1)::BIGINT AS n_events,
       ((sg::HUGEINT * 2 + n) // (n::HUGEINT * 2)) / 1e6 AS mean_gap_s,
       round(sqrt(var) / mean, 6) AS cv,
       sqrt(var) / mean < 0.8 AS is_regular
FROM m
"""


# ---------------------------------------------------------------------------
# binary-blob exact dedup — content-addressed storage accounting
# ---------------------------------------------------------------------------

def multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of the binary media column by content digest
    (sha256 over the blob — pure JVM Column ops, no decode): blob
    count, distinct-content count, and the byte savings
    content-addressed storage would realize. The first dedup pass of
    every multimodal pipeline — cheap, exact, and independent of the
    perceptual near-dup pass (multimodal_phash_clusters). One row.

    Scale shape: one narrow digest map, one digest-keyed agg, one
    1-row rollup; sums are integral."""
    from kafkaconnect_spark.operators.multimodal import (
        attach_media_meta,
        make_fake_media,
    )

    docs = _t(spark, sf_dir, "documents")
    meta = attach_media_meta(make_fake_media(docs)).select(
        F.col("media_meta.sha256").alias("__digest"),
        F.col("media_meta.n_bytes").alias("__bytes"),
    )
    groups = meta.groupBy("__digest").agg(
        F.count(F.lit(1)).alias("__n"), F.min("__bytes").alias("__sz")
    )
    return groups.agg(
        F.sum("__n").alias("n_blobs"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.col("__n") - 1).alias("n_dup_blobs"),
        F.sum(F.col("__n") * F.col("__sz")).alias("bytes_total"),
        F.sum((F.col("__n") - 1) * F.col("__sz")).alias("bytes_saveable"),
        F.round(
            F.sum((F.col("__n") - 1) * F.col("__sz"))
            / F.sum(F.col("__n") * F.col("__sz")).cast("double"),
            6,
        ).alias("saveable_frac"),
    )


MM_EXACT_DEDUP_ORACLE = r"""
WITH a AS (SELECT doc_id, regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS t
           FROM documents),
m AS (SELECT sha256(t) AS digest, strlen(t)::BIGINT AS bytes FROM a),
g AS (SELECT digest, count(*) AS n, min(bytes) AS sz FROM m GROUP BY digest)
SELECT sum(n)::BIGINT AS n_blobs, count(*)::BIGINT AS n_unique,
       sum(n - 1)::BIGINT AS n_dup_blobs,
       sum(n * sz)::BIGINT AS bytes_total,
       sum((n - 1) * sz)::BIGINT AS bytes_saveable,
       round(sum((n - 1) * sz)::DOUBLE / sum(n * sz), 6) AS saveable_frac
FROM g
"""


# ---------------------------------------------------------------------------
# KMV k sweep — accuracy vs sketch size from ONE hashed pass
# ---------------------------------------------------------------------------

def events_kmv_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-size tuning curve: distinct-user KMV estimates at
    k ∈ {64, 256, 1024} — all derived from ONE bottom-1024 hash pass
    (the bottom-k of a larger k contains every smaller k's sketch),
    each vs the exact distinct count. The measured accuracy/memory
    trade a 100 TB rollup pins before standardizing its sketch width.

    Scale shape: the hash pass is the proven bounded-exchange
    bottom-k (≤ 1024 rows survive per partition); the sweep is
    arithmetic over ≤ 1024 × 3 rows; exact is one distinct-agg."""
    from kafkaconnect_spark.operators import sketches
    from kafkaconnect_spark.operators.dedup import _track_cached

    ev = _events(spark, sf_dir)
    keyed = ev.select(F.lit("ALL").alias("g"), "user_id")
    bottoms = sketches._kmv_bottom_hashes(
        keyed, "g", "user_id", 1024, "kmv"
    ).persist()
    w = Window.partitionBy("g").orderBy("h")
    ranked = bottoms.withColumn("__rn", F.row_number().over(w))
    swept = ranked.crossJoin(
        F.broadcast(
            spark.range(1).select(
                F.explode(F.array(*[F.lit(k) for k in (64, 256, 1024)])).alias(
                    "k"
                )
            )
        )
    ).where(F.col("__rn") <= F.col("k"))
    ests = swept.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("__kth")
    )
    space = float(2**60)
    ests = ests.select(
        "k",
        "n_seen",
        F.when(F.col("n_seen") < F.col("k"), F.col("n_seen"))
        .otherwise(
            F.round(
                (F.col("k") - 1).cast("double")
                * F.lit(space)
                / F.col("__kth").cast("double")
            ).cast("long")
        )
        .alias("kmv_est"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("exact_distinct"))
    return _track_cached(
        ests.crossJoin(F.broadcast(exact)).select(
            "k",
            "n_seen",
            "kmv_est",
            "exact_distinct",
            F.round(
                (F.col("kmv_est") - F.col("exact_distinct"))
                / F.col("exact_distinct").cast("double"),
                6,
            ).alias("rel_err"),
        ),
        [bottoms],
    )


KMV_K_SWEEP_ORACLE = f"""
WITH hs AS (SELECT DISTINCT {_hash64_sql('user_id', 'kmv')} AS h FROM events),
rk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hs),
swept AS (SELECT k, h, rn FROM rk,
          (SELECT unnest([64, 256, 1024]) AS k) WHERE rn <= k),
sk AS (SELECT k, count(*)::BIGINT AS n_seen, max(h) AS kth
       FROM swept GROUP BY k),
est AS (SELECT k, n_seen,
               CASE WHEN n_seen < k THEN n_seen
                    ELSE round((k - 1)::DOUBLE
                               * 1152921504606846976.0::DOUBLE
                               / kth)::BIGINT END AS kmv_est
        FROM sk),
exact AS (SELECT count(DISTINCT user_id)::BIGINT AS exact_distinct
          FROM events)
SELECT k, n_seen, kmv_est, exact_distinct,
       round((kmv_est - exact_distinct)::DOUBLE / exact_distinct, 6)
         AS rel_err
FROM est CROSS JOIN exact
"""


# ---------------------------------------------------------------------------
# chunk-level dedup — boilerplate detection below the document grain
# ---------------------------------------------------------------------------

def docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup accounting: chunk every doc into
    non-overlapping 50-token windows (the chunk_documents machinery,
    stride = window), fingerprint each chunk, and report corpus-level
    chunk duplication plus BOILERPLATE — chunks recurring across ≥ 2
    distinct docs (headers/footers/templates that doc-level dedup
    can't see). One row.

    Scale shape: one narrow chunk map, one chunk-hash agg, one
    bounded rollup + one semi-join back for the affected-doc count."""
    from kafkaconnect_spark.operators import pipeline

    ch = pipeline.chunk_documents(
        _t(spark, sf_dir, "documents"), window=50, stride=50
    ).select("doc_id", "chunk_hash")
    g = ch.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("doc_id").alias("__nd"),
    )
    summary = g.agg(
        F.sum("__n").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_unique_chunks"),
        F.round(
            (F.sum("__n") - F.count(F.lit(1))) / F.sum("__n").cast("double"), 6
        ).alias("dup_chunk_rate"),
        F.sum((F.col("__nd") >= 2).cast("long")).alias("n_boilerplate_chunks"),
    )
    affected = (
        ch.join(
            g.where(F.col("__nd") >= 2).select("chunk_hash"), "chunk_hash",
            "left_semi",
        )
        .agg(F.count_distinct("doc_id").alias("n_docs_with_boilerplate"))
    )
    return summary.crossJoin(F.broadcast(affected))


CHUNK_DEDUP_ORACLE = r"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
           FROM documents WHERE length(trim(text)) > 0),
c AS (SELECT doc_id,
             md5(array_to_string(toks[start+1 : start+50], ' ')) AS chunk_hash
      FROM (SELECT doc_id, toks, unnest(range(0, len(toks), 50)) AS start
            FROM t)),
g AS (SELECT chunk_hash, count(*) AS n, count(DISTINCT doc_id) AS nd
      FROM c GROUP BY chunk_hash),
summary AS (
  SELECT sum(n)::BIGINT AS n_chunks, count(*)::BIGINT AS n_unique_chunks,
         round((sum(n) - count(*))::DOUBLE / sum(n), 6) AS dup_chunk_rate,
         sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::BIGINT
           AS n_boilerplate_chunks
  FROM g),
affected AS (
  SELECT count(DISTINCT doc_id)::BIGINT AS n_docs_with_boilerplate
  FROM c WHERE chunk_hash IN (SELECT chunk_hash FROM g WHERE nd >= 2))
SELECT * FROM summary CROSS JOIN affected
"""


# ---------------------------------------------------------------------------
# BPE fertility by language — tokenizer economics per language
# ---------------------------------------------------------------------------

def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE tokens per whitespace word) by
    language, under the corpus-trained 10-merge BPE table
    (text_bpe_tokenize semantics): the per-language cost metric that
    decides whether a tokenizer under-serves a language (fertility
    far above the corpus mean → more sequence length per word →
    less effective context). Sums are integral; one division at the
    end.

    Scale shape: BPE training is the proven iterative vocab-table
    plan; segmentation is a narrow constant-folded merge chain; the
    rollup is a lang-keyed agg over doc-level counts."""
    from kafkaconnect_spark.operators.bpe import apply_bpe, learn_bpe_merges

    docs = _t(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, num_merges=10)
    seg = apply_bpe(docs, merges)
    j = seg.join(docs.select("doc_id", "lang"), "doc_id")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(
            F.sum("n_tokens") / F.sum("n_words").cast("double"), 6
        ).alias("fertility"),
    )


def _fertility_oracle(base: str) -> str:
    return f"""
WITH seg AS ({base})
SELECT d.lang, count(*)::BIGINT AS n_docs,
       sum(seg.n_words)::BIGINT AS n_words,
       sum(seg.n_tokens)::BIGINT AS n_tokens,
       round(sum(seg.n_tokens)::DOUBLE / sum(seg.n_words), 6) AS fertility
FROM seg JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


# ---------------------------------------------------------------------------
# PQ distortion by subspace — which 16 dims does quantization hurt?
# ---------------------------------------------------------------------------

def embedding_pq_distortion_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ reconstruction distortion (mean squared
    residual to the assigned code, the embedding_pq_codes codebooks):
    the diagnosis view for a drifting or under-trained codebook —
    one subspace carrying most of the quantization error is the
    retrain trigger embedding_pq_drift_audit watches for, localized
    to the dimensions that need it. 4 rows.

    Scale shape: the assignment is the narrow folded-literal argmin
    (pure map, no shuffle); the rollup is a 4-key agg with
    DECIMAL-summed rounded residuals."""
    from kafkaconnect_spark.operators.similarity import (
        _pq_codebooks,
        _pq_sub_argmin,
    )

    emb = _t(spark, sf_dir, "embeddings", spread=True).where(
        F.size("embedding") > 0
    )
    vecs = emb.select("vec_id", "embedding")
    books, d = _pq_codebooks(vecs, 4, 8, 64, "vec_id", "embedding")
    cols = []
    for s in range(4):
        _code, dist = _pq_sub_argmin(books, s, d, "embedding")
        cols.append(
            F.struct(F.lit(s).alias("subspace"), F.expr(dist).alias("dist"))
        )
    exploded = vecs.select(
        F.explode(F.array(*cols)).alias("__sd")
    ).select("__sd.subspace", "__sd.dist")
    return exploded.groupBy("subspace").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.col("dist").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mse"),
        F.round(F.max("dist"), 6).alias("max_sq_dist"),
    )


def _pq_distortion_oracle(n_sub=4, n_codes=8, d=16) -> str:
    sql = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, vec AS cvec
       FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT {n_codes}))"""
    for s in range(n_sub):
        lo, hi = s * d + 1, s * d + d + 1
        diff = f"[v.vec[i] - c.cvec[i] FOR i IN range({lo}, {hi})]"
        sql += f""",
s{s} AS (SELECT vec_id, {s} AS subspace, dist FROM (
    SELECT vec_id, dist,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY dist ASC, code ASC) AS rn
    FROM (SELECT v.vec_id, c.code,
                 round(list_dot_product({diff}, {diff}), 6) AS dist
          FROM v CROSS JOIN cb c)) WHERE rn = 1)"""
    unions = " UNION ALL ".join(f"SELECT * FROM s{s}" for s in range(n_sub))
    return sql + f"""
SELECT subspace, count(*)::BIGINT AS n_vecs,
       round(sum(dist::DECIMAL(20,6))::DOUBLE / count(*), 6) AS mse,
       round(max(dist), 6) AS max_sq_dist
FROM ({unions}) GROUP BY subspace
"""


PQ_DISTORTION_ORACLE = _pq_distortion_oracle()


def _build_ppl_and_fertility_oracles():
    from kafkaconnect_spark.queries import BIGRAM_LM_ORACLE, _bpe_oracle

    return (
        _ppl_sweep_oracle(BIGRAM_LM_ORACLE),
        _fertility_oracle(_bpe_oracle(10)),
    )


_PPL_SWEEP_ORACLE, _FERTILITY_ORACLE = None, None


def _catalog() -> dict:
    global _PPL_SWEEP_ORACLE, _FERTILITY_ORACLE
    if _PPL_SWEEP_ORACLE is None:
        _PPL_SWEEP_ORACLE, _FERTILITY_ORACLE = _build_ppl_and_fertility_oracles()
    return {
        "dedup_minhash_estimate_error": (
            dedup_minhash_estimate_error,
            MINHASH_EST_ERROR_ORACLE,
        ),
        "dedup_band_sweep": (dedup_band_sweep, BAND_SWEEP_ORACLE),
        "parts_neighbor_jaccard": (
            parts_neighbor_jaccard,
            NEIGHBOR_JACCARD_ORACLE,
        ),
        "embedding_int8_recall_audit": (
            embedding_int8_recall_audit,
            INT8_RECALL_ORACLE,
        ),
        "docs_dedup_removal_bias": (
            docs_dedup_removal_bias,
            REMOVAL_BIAS_ORACLE,
        ),
        "docs_perplexity_threshold_sweep": (
            docs_perplexity_threshold_sweep,
            _PPL_SWEEP_ORACLE,
        ),
        "events_bot_regularity_audit": (
            events_bot_regularity_audit,
            BOT_REGULARITY_ORACLE,
        ),
        "multimodal_exact_dedup": (multimodal_exact_dedup, MM_EXACT_DEDUP_ORACLE),
        "events_kmv_k_sweep": (events_kmv_k_sweep, KMV_K_SWEEP_ORACLE),
        "docs_chunk_dedup": (docs_chunk_dedup, CHUNK_DEDUP_ORACLE),
        "text_tokenizer_fertility": (
            text_tokenizer_fertility,
            _FERTILITY_ORACLE,
        ),
        "embedding_pq_distortion_by_dim": (
            embedding_pq_distortion_by_dim,
            PQ_DISTORTION_ORACLE,
        ),
    }

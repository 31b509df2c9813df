"""Round-7 catalog batch 2 — index-tuning and quantizer-quality
audits around the r7 lifecycle work, plus crawl/stream governance:
LSH bucket profiles, PQ code balance and quantization error under
trained vs lowest-id codebooks, IVF cell balance, n-gram novelty by
crawl decile, near-dup cluster-size histogram, and per-user event
rate audits.

Determinism rules as everywhere: md5-shared hashes, integer/decimal
aggregation, one rounded division at the very end. Imbalance
statistics deliberately use the EXACT integer form Σ(k·c−n)² instead
of entropy — log() is not correctly-rounded across libms, a Σ of
integers is bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaconnect_spark.query_base import (
    _MINHASH_AGGS,
    _SHINGLE_CTE,
    _SIG_LIST,
    _events,
    _t,
)
from kafkaconnect_spark.queries_r7 import _lloyd_cents_cte


# ---------------------------------------------------------------------------
# LSH bucket profile — the banding-tuning audit
# ---------------------------------------------------------------------------

def dedup_lsh_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band profile of the MinHash-LSH bucket structure (16
    hashes, 4 bands): bucket count, largest bucket, and the exact
    candidate-pair volume Σ c·(c−1)/2 the band contributes — the
    numbers that decide banding parameters BEFORE running the join
    (a hot bucket of m docs costs O(m²) verify pairs; this is the
    audit that catches it).

    Scale shape: one groupBy (band, band_hash) with map-side combine
    → band-cardinality agg; nothing else. The profile is how the
    persisted index's compact() clustering is sized."""
    from kafkaconnect_spark.operators.dedup import (
        _banded,
        _signatures_from_arrays,
        shingle_arrays,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    sh = shingle_arrays(docs, "text", "doc_id", 3)
    banded = _banded(_signatures_from_arrays(sh, 16, "doc_id"), 4, "doc_id")
    buckets = banded.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return buckets.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("__c").alias("max_bucket_size"),
        F.sum((F.col("__c") * (F.col("__c") - 1) / 2).cast("long")).alias(
            "candidate_pairs"
        ),
        F.sum((F.col("__c") > 1).cast("long")).alias("n_colliding_buckets"),
    )


LSH_BUCKET_PROFILE_ORACLE = rf"""
WITH {_SHINGLE_CTE},
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
buckets AS (SELECT band, band_hash, count(*) AS c
            FROM banded GROUP BY 1, 2)
SELECT band, count(*)::BIGINT AS n_buckets,
       max(c)::BIGINT AS max_bucket_size,
       sum((c * (c - 1)) // 2)::BIGINT AS candidate_pairs,
       sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_colliding_buckets
FROM buckets GROUP BY band
"""


# ---------------------------------------------------------------------------
# quantizer-quality audits: trained vs lowest-id
# ---------------------------------------------------------------------------

def embedding_pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code-histogram balance per subspace, lowest-id vs 2-round-
    Lloyd-trained codebooks — the load-balance half of what training
    buys (embedding_ivfpq_trained_recall measures the recall half).
    Per (variant, subspace): codes in use, largest/smallest code
    population, and the exact integer imbalance Σ(k·c−n)² (unused
    codes contribute n² each; 0 = uniform — entropy without the
    cross-libm log()).

    Scale shape: code assignment is the narrow folded-literal map
    stage; then one groupBy (subspace implicit in the unpivot, code)
    and a tiny agg. Training adds k·d driver state per round."""
    from kafkaconnect_spark.operators import similarity
    from kafkaconnect_spark.operators.similarity import _lloyd_subspace_books

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.where(F.size("embedding") > 0).select("vec_id", "embedding")
    books_t = _lloyd_subspace_books(vecs, 4, 16, 8, 2, "vec_id", "embedding")

    def _balance2(codes: DataFrame, label: str) -> DataFrame:
        long = codes.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("subspace"),
                            F.col(f"code_{s}").alias("code"),
                        )
                        for s in range(4)
                    ]
                )
            ).alias("sc")
        ).select("sc.subspace", "sc.code")
        counts = long.groupBy("subspace", "code").agg(
            F.count(F.lit(1)).alias("__c")
        )
        per_sub = counts.groupBy("subspace").agg(
            F.sum("__c").alias("__n"),
            F.count(F.lit(1)).alias("n_codes_used"),
            F.max("__c").alias("max_code_count"),
            F.min("__c").alias("min_code_count"),
            F.sum(
                (F.lit(8) * F.col("__c")).cast("long") * (F.lit(8) * F.col("__c")).cast("long")
            ).alias("__sq"),  # Σ(8c)² ; expand (8c−n)² = Σ(8c)² − 2nΣ8c + k_used·n²
        )
        # Σ(8c−n)² over ALL 8 codes (unused contribute n²) simplifies
        # to Σ(8c)² − 8n²  (expand, use Σc = n over used codes)
        n = F.col("__n").cast("long")
        imb = F.col("__sq") - F.lit(8) * n * n
        return per_sub.select(
            F.lit(label).alias("variant"),
            "subspace",
            "n_codes_used",
            "max_code_count",
            "min_code_count",
            imb.alias("imbalance"),
        )

    base = similarity.pq_codes(emb, n_sub=4, n_codes=8, dim=64)
    trained = similarity.pq_codes(emb, n_sub=4, n_codes=8, dim=64, books=books_t)
    return _balance2(base, "lowest_id").unionAll(_balance2(trained, "kmeans2"))


def _pq_code_cte(prefix: str, cb_ctes: list[str], d: int = 16) -> str:
    """s-codes CTEs `{prefix}s{s}` (vec_id, code_{s}) over v given
    codebook CTEs (cell, cvec of d-wide subvectors)."""
    sql = ""
    for s, cb in enumerate(cb_ctes):
        lo, hi = s * d + 1, s * d + d + 1
        diff = f"[v.vec[i] - c.cvec[i - {lo - 1}] FOR i IN range({lo}, {hi})]"
        sql += f""",
{prefix}s{s} AS (SELECT vec_id, code AS code_{s} FROM (
    SELECT vec_id, code,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY dist ASC, code ASC) AS rn
    FROM (SELECT v.vec_id, c.cell AS code,
                 round(list_dot_product({diff}, {diff}), 6) AS dist
          FROM v CROSS JOIN {cb} c)) WHERE rn = 1)"""
    return sql


def _pq_balance_oracle() -> str:
    sql = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] vec FROM embeddings
           WHERE len(embedding) > 0)"""
    for s in range(4):
        lo, hi = s * 16 + 1, s * 16 + 17
        sql += f""",
bcb{s} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                 [vec[i] FOR i IN range({lo}, {hi})] AS cvec
          FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT 8))"""
    for s in range(4):
        lo, hi = s * 16 + 1, s * 16 + 17
        sql += _lloyd_cents_cte(
            f"tb{s}", "v", f"[vec[i] FOR i IN range({lo}, {hi})]", 8, 2, 16
        )
    sql += _pq_code_cte("b", [f"bcb{s}" for s in range(4)])
    sql += _pq_code_cte("t", [f"tb{s}c2" for s in range(4)])

    def _variant(prefix: str, label: str) -> str:
        unions = " UNION ALL ".join(
            f"SELECT {s} AS subspace, code_{s} AS code FROM {prefix}s{s}"
            for s in range(4)
        )
        return f"""
SELECT '{label}' AS variant, subspace, n_codes_used, max_code_count,
       min_code_count,
       (sq - 8 * n * n)::BIGINT AS imbalance
FROM (
  SELECT subspace, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_codes_used,
         max(c)::BIGINT AS max_code_count, min(c)::BIGINT AS min_code_count,
         sum((8 * c)::BIGINT * (8 * c)::BIGINT)::BIGINT AS sq
  FROM (SELECT subspace, code, count(*) AS c FROM ({unions}) GROUP BY 1, 2)
  GROUP BY subspace)"""

    return (
        sql
        + _variant("b", "lowest_id")
        + "\nUNION ALL\n"
        + _variant("t", "kmeans2")
    )


PQ_BALANCE_ORACLE = _pq_balance_oracle()


def embedding_pq_quant_error_by_variant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean/max PQ quantization error (the per-vector sum of rounded
    per-subspace residuals `pq_codes.quant_err`) under lowest-id vs
    2-round-Lloyd-trained codebooks — THE objective PQ training
    minimizes, reported as the measured improvement. Decimal-exact
    mean (each quant_err is already rounded to 6 → DECIMAL(18,6) sum
    is order-independent), one rounded division at the end.

    Scale shape: two narrow coding passes + 1-row aggs; training adds
    the Lloyd rounds' k·d driver state."""
    from kafkaconnect_spark.operators import similarity
    from kafkaconnect_spark.operators.similarity import _lloyd_subspace_books

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.where(F.size("embedding") > 0).select("vec_id", "embedding")
    books_t = _lloyd_subspace_books(vecs, 4, 16, 8, 2, "vec_id", "embedding")

    def _stats(codes: DataFrame, label: str) -> DataFrame:
        return codes.agg(
            F.lit(label).alias("variant"),
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum(F.col("quant_err").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_quant_err"),
            F.max("quant_err").alias("max_quant_err"),
        )

    base = similarity.pq_codes(emb, n_sub=4, n_codes=8, dim=64)
    trained = similarity.pq_codes(emb, n_sub=4, n_codes=8, dim=64, books=books_t)
    return _stats(base, "lowest_id").unionAll(_stats(trained, "kmeans2"))


def _pq_quant_error_oracle() -> str:
    sql = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] vec FROM embeddings
           WHERE len(embedding) > 0)"""
    for s in range(4):
        lo, hi = s * 16 + 1, s * 16 + 17
        sql += f""",
bcb{s} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                 [vec[i] FOR i IN range({lo}, {hi})] AS cvec
          FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT 8))"""
    for s in range(4):
        lo, hi = s * 16 + 1, s * 16 + 17
        sql += _lloyd_cents_cte(
            f"tb{s}", "v", f"[vec[i] FOR i IN range({lo}, {hi})]", 8, 2, 16
        )

    def _errs(prefix: str, cb_ctes: list[str]) -> str:
        # per-vector quant_err = round(Σ_s round(min_dist_s, 6), 6)
        parts = []
        for s, cb in enumerate(cb_ctes):
            lo, hi = s * 16 + 1, s * 16 + 17
            diff = f"[v.vec[i] - c.cvec[i - {lo - 1}] FOR i IN range({lo}, {hi})]"
            parts.append(
                f"""
{prefix}d{s} AS (SELECT vec_id, min(round(list_dot_product({diff}, {diff}), 6))
                 AS e{s}
          FROM v CROSS JOIN {cb} c GROUP BY vec_id)"""
            )
        joins = " ".join(f"JOIN {prefix}d{s} USING (vec_id)" for s in range(1, 4))
        esum = " + ".join(f"e{s}" for s in range(4))
        parts.append(
            f"""
{prefix}err AS (SELECT vec_id, round({esum}, 6) AS quant_err
         FROM {prefix}d0 {joins})"""
        )
        return ",".join(parts)

    sql += "," + _errs("b", [f"bcb{s}" for s in range(4)])
    sql += "," + _errs("t", [f"tb{s}c2" for s in range(4)])
    out = []
    for prefix, label in (("b", "lowest_id"), ("t", "kmeans2")):
        out.append(
            f"""
SELECT '{label}' AS variant, count(*)::BIGINT AS n_vectors,
       round(sum(quant_err::DECIMAL(18,6))::DOUBLE / count(*), 6)
           AS mean_quant_err,
       max(quant_err) AS max_quant_err
FROM {prefix}err"""
        )
    return sql + "\nUNION ALL\n".join(out)


PQ_QUANT_ERROR_ORACLE = _pq_quant_error_oracle()


def embedding_ivf_cell_balance_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Coarse-quantizer cell-population balance, lowest-id vs trained
    centroids — imbalanced cells are IVF's failure mode (a mega-cell
    makes every probe scan half the corpus); this is the audit that
    shows what the 2 Lloyd rounds buy structurally. Per variant:
    cells in use, max/min cell population, exact integer imbalance
    Σ(k·c−n)² (unused cells contribute n²).

    Scale shape: two narrow folded-argmax assignment passes + tiny
    aggs; assignment uses the SAME cosine rule the ANN index uses."""
    from kafkaconnect_spark.operators.similarity import (
        _ivf_index,
        _lloyd_centroids,
        _with_norms,
    )

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.where(F.size("embedding") > 0).select("vec_id", "embedding")
    cvecs = _lloyd_centroids(vecs, 8, 2, "vec_id", "embedding")

    def _balance(cents, label: str) -> DataFrame:
        corpus, _, _ = _ivf_index(vecs, 8, "vec_id", "embedding", cents=cents)
        counts = corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("__c"))
        n = F.sum("__c").cast("long")
        used = F.count(F.lit(1))
        sq = F.sum((F.lit(8) * F.col("__c")).cast("long") * (F.lit(8) * F.col("__c")).cast("long"))
        return counts.agg(
            F.lit(label).alias("variant"),
            used.alias("n_cells_used"),
            F.max("__c").alias("max_cell_count"),
            F.min("__c").alias("min_cell_count"),
            (sq - F.lit(8) * n * n).alias("imbalance"),
        )

    base = _balance(None, "lowest_id")
    trained = _balance(
        _with_norms([(i, v) for i, v in enumerate(cvecs)]), "kmeans2"
    )
    return base.unionAll(trained)


_COS_CELL = (
    "round(list_dot_product({a}, c.cvec) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"
)


def _ivf_balance_oracle() -> str:
    sql = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] vec FROM embeddings
           WHERE len(embedding) > 0),
bcents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, vec AS cvec
           FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT 8))"""
    sql += _lloyd_cents_cte("tc", "v", "vec", 8, 2, 64)

    def _variant(cents_cte: str, label: str) -> str:
        return f"""
SELECT '{label}' AS variant, count(*)::BIGINT AS n_cells_used,
       max(c)::BIGINT AS max_cell_count, min(c)::BIGINT AS min_cell_count,
       (sum((8 * c)::BIGINT * (8 * c)::BIGINT)
        - 8 * sum(c) * sum(c))::BIGINT AS imbalance
FROM (
  SELECT cell, count(*)::BIGINT AS c FROM (
    SELECT vec_id, cell FROM (
      SELECT v.vec_id, c.cell,
             row_number() OVER (PARTITION BY v.vec_id
               ORDER BY {_COS_CELL.format(a='v.vec')} DESC, c.cell) rn
      FROM v CROSS JOIN {cents_cte} c) WHERE rn = 1)
  GROUP BY cell)"""

    return (
        sql
        + _variant("bcents", "lowest_id")
        + "\nUNION ALL\n"
        + _variant("tcc2", "kmeans2")
    )


IVF_BALANCE_ORACLE = _ivf_balance_oracle()


# ---------------------------------------------------------------------------
# corpus growth + stream governance
# ---------------------------------------------------------------------------

def docs_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-shingle yield by crawl decile: docs are bucketed into 10
    slices by doc_id (crawl order), each 3-gram shingle hash is
    attributed to the decile that saw it FIRST, and the curve reports
    per decile how many novel shingles it contributed vs its total
    shingle volume — the diminishing-returns audit that tells a crawl
    when additional data stops adding new content (Heaps-law bend).

    Scale shape: one explode + min-agg keyed by the shingle hash
    (map-side combined), one decile agg; the decile boundary is a
    1-row broadcast, never a global window."""
    from kafkaconnect_spark.functions.text import hash64
    from kafkaconnect_spark.operators.pipeline import _shingle_hashes

    docs = _t(spark, sf_dir, "documents", spread=True)
    hi = docs.agg((F.max("doc_id") + 1).alias("__hi"))
    shh = _shingle_hashes(docs, "doc_id", "text", 3, "novel").crossJoin(
        F.broadcast(hi)
    )
    dec = F.expr("(doc_id * 10) div __hi").cast("int")
    tagged = shh.select(dec.alias("decile"), "sh_hash")
    first_seen = tagged.groupBy("sh_hash").agg(F.min("decile").alias("__first"))
    novel = first_seen.groupBy(F.col("__first").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_novel_shingles")
    )
    volume = tagged.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_shingle_instances"),
        F.count_distinct("sh_hash").alias("n_distinct_shingles"),
    )
    return volume.join(novel, "decile", "left").select(
        "decile",
        "n_shingle_instances",
        "n_distinct_shingles",
        F.coalesce("n_novel_shingles", F.lit(0)).alias("n_novel_shingles"),
        F.round(
            F.coalesce("n_novel_shingles", F.lit(0)) / F.col("n_shingle_instances"),
            6,
        ).alias("novelty_rate"),
    )


from kafkaconnect_spark.query_base import _hash64_sql  # noqa: E402

NOVELTY_ORACLE = rf"""
WITH {_SHINGLE_CTE},
hi AS (SELECT max(doc_id) + 1 AS h FROM documents),
tagged AS (
  SELECT (doc_id * 10 // (SELECT h FROM hi))::INT AS decile,
         {_hash64_sql('shingle', 'novel')} AS sh_hash
  FROM sh),
first_seen AS (SELECT sh_hash, min(decile) AS f FROM tagged GROUP BY sh_hash),
novel AS (SELECT f AS decile, count(*)::BIGINT AS n_novel FROM first_seen
          GROUP BY f),
volume AS (SELECT decile, count(*)::BIGINT AS n_instances,
                  count(DISTINCT sh_hash)::BIGINT AS n_distinct
           FROM tagged GROUP BY decile)
SELECT volume.decile, n_instances AS n_shingle_instances,
       n_distinct AS n_distinct_shingles,
       coalesce(n_novel, 0)::BIGINT AS n_novel_shingles,
       round(coalesce(n_novel, 0)::DOUBLE / n_instances, 6) AS novelty_rate
FROM volume LEFT JOIN novel USING (decile)
"""


def docs_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle document-frequency profile in power-of-two buckets —
    the audit behind ngram_jaccard_pairs' df cap: per df bucket
    (2^k ≤ df < 2^(k+1)), how many distinct shingles land there, the
    posting volume they contribute, and the exact candidate-pair cost
    Σ df·(df−1)/2 an uncapped inverted-index join would pay for them.
    The cap lever reads directly off this curve: the top buckets are
    boilerplate that costs O(df²) and links near-nothing.

    Scale shape: one explode + df groupBy (map-side combined, keyed by
    the 64-bit shingle hash), then a ≤64-row bucket agg. The bucket
    exponent is length(bin(df))−1 — exact integer arithmetic, no
    float log."""
    from kafkaconnect_spark.operators.pipeline import _shingle_hashes

    docs = _t(spark, sf_dir, "documents", spread=True)
    shh = _shingle_hashes(docs, "doc_id", "text", 3, "dfprof")
    df_tab = shh.groupBy("sh_hash").agg(F.count(F.lit(1)).alias("__df"))
    bucket = (F.length(F.bin(F.col("__df"))) - 1).alias("df_bucket_log2")
    return (
        df_tab.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("__df").alias("n_postings"),
            F.sum(
                (F.col("__df") * (F.col("__df") - 1) / 2).cast("long")
            ).alias("candidate_pairs"),
        )
    )


SHINGLE_DF_ORACLE = rf"""
WITH {_SHINGLE_CTE},
df_tab AS (SELECT {_hash64_sql('shingle', 'dfprof')} AS sh_hash,
                  count(*)::BIGINT AS df
           FROM sh GROUP BY 1)
SELECT (length(bin(df)) - 1)::INT AS df_bucket_log2,
       count(*)::BIGINT AS n_shingles,
       sum(df)::BIGINT AS n_postings,
       sum((df * (df - 1)) // 2)::BIGINT AS candidate_pairs
FROM df_tab GROUP BY 1
"""


def events_user_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user request-rate audit (the politeness ledger a crawl or
    API frontier keeps): events bucketed into 1-minute windows per
    user; per user the active-minute count, total events, the PEAK
    per-minute rate, and the mean rate over active minutes — burst
    detection is max vs mean.

    Scale shape: one groupBy (user, minute) with map-side combine →
    one groupBy user. Both keyed; at 100 TB this is the canonical
    two-level aggregation."""
    ev = _events(spark, sf_dir)
    per_min = ev.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 60000000").alias("__m"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    return per_min.groupBy("user_id").agg(
        F.sum("__c").alias("n_events"),
        F.count(F.lit(1)).alias("n_active_minutes"),
        F.max("__c").alias("max_per_minute"),
        F.round(F.sum("__c") / F.count(F.lit(1)), 6).alias("mean_per_active_minute"),
    )


USER_RATE_ORACLE = """
WITH per_min AS (
  SELECT user_id, epoch_us(ts) // 60000000 AS m, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2)
SELECT user_id, sum(c)::BIGINT AS n_events,
       count(*)::BIGINT AS n_active_minutes,
       max(c)::BIGINT AS max_per_minute,
       round(sum(c)::DOUBLE / count(*), 6) AS mean_per_active_minute
FROM per_min GROUP BY user_id
"""


R7B_CATALOG = {
    "dedup_lsh_bucket_profile": (
        dedup_lsh_bucket_profile,
        LSH_BUCKET_PROFILE_ORACLE,
    ),
    "embedding_pq_code_balance": (embedding_pq_code_balance, PQ_BALANCE_ORACLE),
    "embedding_pq_quant_error_by_variant": (
        embedding_pq_quant_error_by_variant,
        PQ_QUANT_ERROR_ORACLE,
    ),
    "embedding_ivf_cell_balance_trained": (
        embedding_ivf_cell_balance_trained,
        IVF_BALANCE_ORACLE,
    ),
    "docs_ngram_novelty_curve": (docs_ngram_novelty_curve, NOVELTY_ORACLE),
    "docs_shingle_df_profile": (docs_shingle_df_profile, SHINGLE_DF_ORACLE),
    "events_user_rate_audit": (events_user_rate_audit, USER_RATE_ORACLE),
}

"""Round-6 catalog batch 4 — document forensics and sketch/filter
tuning: winnowing fingerprints (MOSS-style local plagiarism
detection), prefix-truncation duplicate screening, dedup threshold
sensitivity, exact vector dedup, cosine range search, CMS width
sweep, dedup cluster-size histogram, Markov stationary distribution,
DAU/MAU stickiness.

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
# winnowing fingerprints — local plagiarism/copy detection (MOSS)
# ---------------------------------------------------------------------------

def docs_winnowing_plagiarism(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS algorithm, public): hash every 3-gram in POSITION
    order, slide a 4-wide window over the hash sequence, keep each
    window's minimum — a guaranteed-coverage LOCAL fingerprint set
    (any shared run ≥ w+k-1 = 6 tokens produces a shared fingerprint,
    which minhash's global signature cannot promise). Docs sharing
    ≥ 2 selected fingerprints are copy candidates; top-50 pairs by
    shared-fingerprint count (ties → id order) so the output set is
    deterministic.

    Scale shape: fingerprint selection is a narrow per-row transform
    (no shuffle); the inverted index joins only SELECTED hashes
    (winnowing keeps ~2/(w+1) of positions); a mirrored df ≤ 100 cap
    bounds hot fingerprints exactly like the dedup shingle cap
    (measured no-op on driver data: max df 23 at sf0.1)."""
    from kafkaconnect_spark.functions.text import hash64, tokens

    docs = _t(spark, sf_dir, "documents", spread=True)
    toks = docs.select("doc_id", tokens("text").alias("toks")).where(
        F.size("toks") >= 6
    )
    hs = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: hash64(F.array_join(F.slice(F.col("toks"), i, 3), " "), "winnow"),
        ).alias("hs"),
    )
    fps = hs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("hs") - 3),
                    lambda s: F.array_min(F.slice(F.col("hs"), s, 4)),
                )
            )
        ).alias("fp"),
    )
    df_ok = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= 100)
        .select("fp")
    )
    idx = fps.join(df_ok, "fp")
    a = idx.select(F.col("fp"), F.col("doc_id").alias("id_a"))
    b = idx.select(F.col("fp"), F.col("doc_id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .where(F.col("n_shared_fps") >= 2)
        .orderBy(F.desc("n_shared_fps"), F.asc("id_a"), F.asc("id_b"))
        .limit(50)
    )


_WINNOW_HASH = _hash64_sql("array_to_string(toks[i:i+2], ' ')", "winnow")

WINNOWING_ORACLE = rf"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
           FROM documents
           WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 6),
h AS (SELECT doc_id,
             [{_WINNOW_HASH} FOR i IN range(1, len(toks) - 2 + 1)] AS hs
      FROM t),
w AS (SELECT doc_id,
             list_distinct([list_min(hs[s:s+3])
                            FOR s IN range(1, len(hs) - 3 + 1)]) AS fps
      FROM h),
e AS (SELECT doc_id, unnest(fps) AS fp FROM w),
ok AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= 100),
idx AS (SELECT e.doc_id, e.fp FROM e JOIN ok USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       count(*)::BIGINT AS n_shared_fps
FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY n_shared_fps DESC, id_a ASC, id_b ASC
LIMIT 50
"""


# ---------------------------------------------------------------------------
# prefix-truncation duplicates — the crawl truncation pathology
# ---------------------------------------------------------------------------

def docs_prefix_truncation_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-duplicate screen: docs sharing their first 20
    normalized tokens are candidates for the classic crawl pathology
    where one fetch is a truncated prefix of another (doc-level
    fingerprints miss these — the texts differ). Candidates come from
    a prefix-hash equi-join; each pair is then VERIFIED by an actual
    prefix test on the normalized text, so `is_truncation`
    distinguishes true prefix containment from mere shared openings.

    Scale shape: one narrow prefix-hash map, one hash equi-join
    (group sizes measured ≤ 4 on driver data — no megagroup risk;
    pairs per group are C(n,2) of tiny n), verification ships each
    text once per candidate."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", norm.alias("__norm")
    )
    toked = docs.select(
        "doc_id",
        "n_chars",
        "__norm",
        F.split(F.col("__norm"), " ").alias("__toks"),
    ).where(F.size("__toks") >= 20)
    keyed = toked.select(
        "doc_id",
        "n_chars",
        "__norm",
        F.md5(F.array_join(F.slice(F.col("__toks"), 1, 20), " ")).alias("__ph"),
    )
    a = keyed.select(
        F.col("__ph"),
        F.col("doc_id").alias("id_a"),
        F.col("n_chars").alias("n_chars_a"),
        F.col("__norm").alias("__na"),
    )
    b = keyed.select(
        F.col("__ph"),
        F.col("doc_id").alias("id_b"),
        F.col("n_chars").alias("n_chars_b"),
        F.col("__norm").alias("__nb"),
    )
    return (
        a.join(b, "__ph")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "n_chars_a",
            "n_chars_b",
            (
                F.col("__na").startswith(F.col("__nb"))
                | F.col("__nb").startswith(F.col("__na"))
            ).alias("is_truncation"),
        )
    )


PREFIX_TRUNCATION_ORACLE = r"""
WITH d AS (
  SELECT doc_id, n_chars,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents),
t AS (SELECT doc_id, n_chars, norm,
             regexp_split_to_array(norm, ' ') AS toks
      FROM d),
k AS (SELECT doc_id, n_chars, norm,
             md5(array_to_string(toks[1:20], ' ')) AS ph
      FROM t WHERE len(toks) >= 20)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       a.n_chars AS n_chars_a, b.n_chars AS n_chars_b,
       (starts_with(a.norm, b.norm) OR starts_with(b.norm, a.norm))
         AS is_truncation
FROM k a JOIN k b ON a.ph = b.ph AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# dedup threshold sensitivity — what does the cutoff choice cost?
# ---------------------------------------------------------------------------

def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup aggressiveness curve: near-dup pair count and affected-doc
    count at Jaccard thresholds τ ∈ {0.2, 0.4, 0.6, 0.8}, all derived
    from ONE verified candidate pass (the production minhash pipeline
    at threshold 0 — higher cutoffs are pure filters over it). The
    release-time table that shows what moving the dedup knob would
    actually delete.

    Scale shape: one minhash pipeline pass; the sweep explodes the
    (small, post-LSH) verified-pair table ×4 and aggregates; affected
    docs are a distinct-count over exploded pair ids per τ."""
    from kafkaconnect_spark.operators import dedup

    docs = _t(spark, sf_dir, "documents", spread=True)
    pairs = dedup.minhash_dedup_pairs(
        docs, threshold=0.0, num_hashes=16, bands=4
    )
    taus = F.array(*[F.lit(t) for t in (0.2, 0.4, 0.6, 0.8)])
    swept = pairs.select(
        "id_a", "id_b", "jaccard", F.explode(taus).alias("threshold")
    ).where(F.col("jaccard") >= F.col("threshold"))
    counts = swept.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    affected = (
        swept.select(
            "threshold",
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("__doc"),
        )
        .groupBy("threshold")
        .agg(F.count_distinct("__doc").alias("n_docs_affected"))
    )
    out = counts.join(affected, "threshold")
    return dedup.carry_cached(out, pairs)


THRESHOLD_SENSITIVITY_ORACLE = rf"""
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
swept AS (
  SELECT id_a, id_b, threshold FROM pairs,
         (SELECT unnest([0.2::DOUBLE, 0.4::DOUBLE,
                         0.6::DOUBLE, 0.8::DOUBLE]) AS threshold)
  WHERE jaccard >= threshold),
c AS (SELECT threshold, count(*)::BIGINT AS n_pairs FROM swept GROUP BY 1),
aff AS (
  SELECT threshold, count(DISTINCT doc)::BIGINT AS n_docs_affected
  FROM (SELECT threshold, id_a AS doc FROM swept
        UNION ALL SELECT threshold, id_b FROM swept)
  GROUP BY 1)
SELECT c.threshold, c.n_pairs, aff.n_docs_affected
FROM c JOIN aff USING (threshold)
"""


# ---------------------------------------------------------------------------
# exact vector dedup — bit-identical embeddings
# ---------------------------------------------------------------------------

def embedding_duplicate_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding dedup at µ-precision: vectors keyed by the md5
    of their round(x·10⁶) integer components — identical upstream
    inputs produce identical embeddings, and training on them
    double-weights the sample exactly like duplicate text. One
    summary row (vector counts, distinct count, dup groups, largest
    group).

    Scale shape: one narrow key map, one key agg, one 1-row rollup —
    the dedup_exact shape on the embeddings table."""
    emb = _t(spark, sf_dir, "embeddings", spread=True).where(
        F.size("embedding") > 0
    )
    keyed = emb.select(
        F.md5(
            F.expr(
                "array_join(transform(embedding,"
                " x -> cast(round(cast(x AS DOUBLE) * 1e6) AS BIGINT)), ',')"
            )
        ).alias("__k")
    )
    g = keyed.groupBy("__k").agg(F.count(F.lit(1)).alias("__n"))
    return g.agg(
        F.sum("__n").alias("n_vectors"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("__n") - 1).alias("n_dup_vectors"),
        F.sum((F.col("__n") > 1).cast("long")).alias("n_dup_groups"),
        F.max("__n").alias("max_group_size"),
    )


DUP_VECTORS_ORACLE = """
WITH v AS (SELECT embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
k AS (SELECT md5(array_to_string(
          list_transform(vec, x -> round(x * 1e6)::BIGINT), ',')) AS k
      FROM v),
g AS (SELECT k, count(*) AS n FROM k GROUP BY k)
SELECT sum(n)::BIGINT AS n_vectors, count(*)::BIGINT AS n_distinct,
       sum(n - 1)::BIGINT AS n_dup_vectors,
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
       max(n)::BIGINT AS max_group_size
FROM g
"""


# ---------------------------------------------------------------------------
# cosine range search — all neighbors above a similarity floor
# ---------------------------------------------------------------------------

def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range query (the OTHER ANN primitive besides top-k): for 10
    anchors, count and summarize ALL corpus neighbors with cosine
    ≥ 0.3 — retrieval-augmentation and near-dup policies are
    threshold-bounded, not k-bounded, so the result size per anchor
    is a data property this query measures. Anchors with no neighbor
    report 0 / NULL rather than vanishing.

    Scale shape: the anchor set broadcasts with hoisted norms (the
    brute_force_topk discipline — corpus never shuffles); per-anchor
    rollups aggregate conditional DECIMAL sums."""
    from kafkaconnect_spark.operators.similarity import dot, l2_norm

    emb = _t(spark, sf_dir, "embeddings", spread=True).where(
        F.size("embedding") > 0
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qvec"),
        l2_norm(F.col("embedding")).alias("__nq"),
    )
    corpus = emb.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("__nv")
    )
    scored = corpus.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.round(
            dot(F.col("__qvec"), F.col("embedding"))
            / (F.col("__nq") * F.col("__nv")),
            6,
        ).alias("__cos"),
    )
    hit = (F.col("__cos") >= 0.3).cast("long")
    return scored.groupBy("query_id").agg(
        F.sum(hit).alias("n_neighbors"),
        F.round(
            F.sum(
                F.when(
                    F.col("__cos") >= 0.3,
                    F.round(F.col("__cos"), 7).cast("decimal(20,7)"),
                )
            ).cast("double")
            / F.nullif(F.sum(hit), F.lit(0)),
            6,
        ).alias("mean_cosine"),
        F.max(F.when(F.col("__cos") >= 0.3, F.col("__cos"))).alias(
            "max_cosine"
        ),
    )


RANGE_SEARCH_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 10),
s AS (SELECT query_id,
             round(list_dot_product(qv, vec) /
                   (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(vec, vec))), 6) AS c
      FROM v, q WHERE vec_id != query_id)
SELECT query_id,
       sum(CASE WHEN c >= 0.3 THEN 1 ELSE 0 END)::BIGINT AS n_neighbors,
       round(sum(CASE WHEN c >= 0.3
                      THEN round(c, 7)::DECIMAL(20,7) END)::DOUBLE
             / nullif(sum(CASE WHEN c >= 0.3 THEN 1 ELSE 0 END), 0), 6)
         AS mean_cosine,
       max(CASE WHEN c >= 0.3 THEN c END) AS max_cosine
FROM s GROUP BY query_id
"""


# ---------------------------------------------------------------------------
# CMS width sweep — counter-table sizing curve
# ---------------------------------------------------------------------------

def events_cms_width_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min width tuning curve: the events_cms_error_audit
    accuracy summary at widths {64, 256, 1024} (depth 4 throughout) —
    over-count error vs counter-table memory, measured on the
    workload's own key distribution before standardizing the sketch
    at 100 TB. 3 rows.

    Scale shape: each width builds its ≤ depth·width counter table
    (partial-aggregated; the key space never shuffles raw); the
    audit's per-key join is the same proven shape as the r3 audit."""
    from kafkaconnect_spark.operators.sketches import count_min_estimates

    ev = _events(spark, sf_dir)
    points = []
    for w in (64, 256, 1024):
        est = count_min_estimates(ev, "user_id", depth=4, width=w)
        points.append(
            est.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(
                    (F.col("cms_est") == F.col("exact_count")).cast("long")
                ).alias("n_exact"),
                F.max(F.col("cms_est") - F.col("exact_count")).alias(
                    "max_overcount"
                ),
                F.sum(F.col("cms_est") - F.col("exact_count")).alias(
                    "sum_overcount"
                ),
            ).select(F.lit(w).alias("width"), "*")
        )
    return points[0].unionAll(points[1]).unionAll(points[2])


def _cms_width_point(width: int, depth: int = 4, seed: str = "cms") -> str:
    hashes = ", ".join(
        f"{_hash64_sql('k', f'{seed}{d}')} % {width} AS b{d}"
        for d in range(depth)
    )
    counter_ctes = ",\n".join(
        f"c{d} AS (SELECT b{d} AS bucket, count(*) AS cnt FROM b GROUP BY 1)"
        for d in range(depth)
    )
    joins = " ".join(f"JOIN c{d} ON k.b{d} = c{d}.bucket" for d in range(depth))
    least = ", ".join(f"c{d}.cnt" for d in range(depth))
    anys = ", ".join(f"any_value(b{d}) b{d}" for d in range(depth))
    return f"""
SELECT {width} AS width, * FROM (
  WITH r AS (SELECT user_id::VARCHAR AS k FROM events WHERE user_id IS NOT NULL),
  b AS (SELECT k, {hashes} FROM r),
  {counter_ctes},
  k AS (SELECT k, {anys}, count(*) AS exact FROM b GROUP BY k),
  est AS (SELECT k.k, k.exact, least({least}) AS est FROM k {joins})
  SELECT count(*)::BIGINT AS n_keys,
         sum(CASE WHEN est = exact THEN 1 ELSE 0 END)::BIGINT AS n_exact,
         max(est - exact)::BIGINT AS max_overcount,
         sum(est - exact)::BIGINT AS sum_overcount
  FROM est)"""


CMS_WIDTH_SWEEP_ORACLE = " UNION ALL ".join(
    _cms_width_point(w) for w in (64, 256, 1024)
)


# ---------------------------------------------------------------------------
# dedup cluster-size histogram — the release-report dup profile
# ---------------------------------------------------------------------------

def docs_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of near-dup cluster sizes (the
    dedup_clusters min-label components), with singleton docs as the
    2⁰ bucket — the one-line dup profile every corpus release report
    carries (a corpus dominated by giant clusters needs boilerplate
    removal, not pair dedup). Bucket exponent via length(bin(size))-1
    — exact integer arithmetic (the degree-distribution trick).

    Scale shape: the component build is the proven propagation loop;
    sizes are one keyed agg over (clusters ≤ docs) rows; the
    histogram is ≤ 64 rows; singletons come from one corpus count."""
    from kafkaconnect_spark.operators import dedup

    docs = _t(spark, sf_dir, "documents", spread=True)
    pairs = dedup.minhash_dedup_pairs(
        docs, threshold=0.2, num_hashes=16, bands=4
    )
    clusters = dedup.duplicate_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("__size")
    )
    buckets = (
        sizes.withColumn(
            "bucket_exp", (F.length(F.bin(F.col("__size"))) - 1).cast("int")
        )
        .groupBy("bucket_exp")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("__size").alias("n_docs"),
        )
    )
    n_total = docs.agg(F.count(F.lit(1)).alias("__t"))
    n_clustered = clusters.agg(F.count(F.lit(1)).alias("__c"))
    singles = (
        n_total.crossJoin(F.broadcast(n_clustered))
        .select(
            F.lit(0).cast("int").alias("bucket_exp"),
            (F.col("__t") - F.col("__c")).alias("n_clusters"),
            (F.col("__t") - F.col("__c")).alias("n_docs"),
        )
    )
    return dedup.carry_cached(buckets.unionAll(singles), pairs)


CLUSTER_SIZE_HIST_ORACLE = rf"""
WITH RECURSIVE {_SHINGLE_CTE},
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
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON sa.doc_id = id_a
       JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2),
e AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS n, a AS m FROM e
  UNION
  SELECT e.b, r.m FROM reach r JOIN e ON e.a = r.n),
comp AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
csz AS (SELECT cluster_id, count(*) AS csize FROM comp GROUP BY 1),
hist AS (
  SELECT (length(bin(csize)) - 1)::INT AS bucket_exp,
         count(*)::BIGINT AS n_clusters, sum(csize)::BIGINT AS n_docs
  FROM csz GROUP BY 1),
singles AS (
  SELECT 0::INT AS bucket_exp,
         ((SELECT count(*) FROM documents) -
          (SELECT count(*) FROM comp))::BIGINT AS n_clusters,
         ((SELECT count(*) FROM documents) -
          (SELECT count(*) FROM comp))::BIGINT AS n_docs)
SELECT * FROM hist UNION ALL SELECT * FROM singles
"""


# ---------------------------------------------------------------------------
# Markov stationary distribution — analytic steady state vs empirical
# ---------------------------------------------------------------------------

def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain
    (events_markov_transitions' rounded transition matrix), by 3
    unrolled power-iteration steps from uniform — compared against
    the EMPIRICAL event-type share. A large gap means the chain
    hasn't mixed (session starts dominate) or the first-order model
    misses structure — the model-adequacy check before trusting the
    matrix for next-action prediction. Per step, each term
    p_prev·P(prev,next) is fixed-point rounded (×10⁷ → bigint) and
    integer-summed, so the iteration is order-independent and
    engine-exact.

    Scale shape: the matrix build is the proven keyed-lag plan; the
    iteration is joins over a ≤ |types|² frame — control-plane
    sized, fully declarative (no driver collect)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    totals = trans.groupBy("prev_type").agg(F.sum("__n").alias("__rt"))
    P = (
        trans.join(totals, "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.round(F.col("__n") / F.col("__rt"), 6).alias("__p"),
        )
        .persist()
    )
    states = P.select(F.col("prev_type").alias("state")).distinct()
    n_states = states.agg(F.count(F.lit(1)).alias("__ns"))
    p = states.crossJoin(F.broadcast(n_states)).select(
        "state", (F.lit(1.0) / F.col("__ns")).alias("prob")
    )
    for _ in range(3):
        p = (
            p.join(P, p["state"] == P["prev_type"])
            .groupBy(F.col("next_type").alias("state"))
            .agg(
                (
                    F.sum(
                        F.expr("CAST(round(prob * __p * 1e7) AS BIGINT)")
                    )
                    / F.lit(1e7)
                ).alias("prob")
            )
        )
    emp = ev.groupBy(F.col("event_type").alias("state")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    emp_tot = ev.agg(F.count(F.lit(1)).alias("__t"))
    emp = emp.crossJoin(F.broadcast(emp_tot)).select(
        "state", F.round(F.col("__c") / F.col("__t"), 6).alias("empirical_prob")
    )
    from kafkaconnect_spark.operators.dedup import _track_cached

    return _track_cached(
        p.join(emp, "state").select(
            "state",
            F.round(F.col("prob"), 6).alias("stationary_prob"),
            "empirical_prob",
            F.round(F.col("prob") - F.col("empirical_prob"), 6).alias(
                "delta"
            ),
        ),
        [P],
    )


MARKOV_STATIONARY_ORACLE = """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type
           FROM events),
t AS (SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
r AS (SELECT prev_type, sum(n) AS rt FROM t GROUP BY 1),
P AS (SELECT t.prev_type, t.next_type, round(t.n / r.rt, 6) AS p
      FROM t JOIN r USING (prev_type)),
st AS (SELECT DISTINCT prev_type AS state FROM P),
ns AS (SELECT count(*) AS n FROM st),
p0 AS (SELECT state, 1.0::DOUBLE / ns.n AS prob FROM st CROSS JOIN ns),
p1 AS (SELECT P.next_type AS state,
              sum(round(p0.prob * P.p * 1e7)::BIGINT) / 1e7 AS prob
       FROM p0 JOIN P ON p0.state = P.prev_type GROUP BY 1),
p2 AS (SELECT P.next_type AS state,
              sum(round(p1.prob * P.p * 1e7)::BIGINT) / 1e7 AS prob
       FROM p1 JOIN P ON p1.state = P.prev_type GROUP BY 1),
p3 AS (SELECT P.next_type AS state,
              sum(round(p2.prob * P.p * 1e7)::BIGINT) / 1e7 AS prob
       FROM p2 JOIN P ON p2.state = P.prev_type GROUP BY 1),
emp AS (SELECT event_type AS state,
               round(count(*) / (SELECT count(*) FROM events), 6)
                 AS empirical_prob
        FROM events GROUP BY 1)
SELECT p3.state, round(p3.prob, 6) AS stationary_prob, emp.empirical_prob,
       round(p3.prob - emp.empirical_prob, 6) AS delta
FROM p3 JOIN emp USING (state)
"""


# ---------------------------------------------------------------------------
# DAU/MAU stickiness — engagement density
# ---------------------------------------------------------------------------

def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users over calendar-month active users (the
    classic stickiness ratio): exact distinct counts at both grains,
    joined on the month key. Exactness at the month grain is the
    point — sketch rollups (events_kmv_daily_merge) approximate this
    cheaply; this is the truth they're audited against.

    Scale shape: two keyed distinct-aggs (day, month) and a
    month-keyed join — no window, no collect."""
    ev = _events(spark, sf_dir).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        "user_id",
    )
    dau = ev.groupBy("day", "month").agg(
        F.count_distinct("user_id").alias("dau")
    )
    mau = ev.groupBy("month").agg(F.count_distinct("user_id").alias("mau"))
    return dau.join(mau, "month").select(
        "day",
        "dau",
        "mau",
        F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
    )


DAU_MAU_ORACLE = """
WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                  strftime(ts, '%Y-%m') AS month, user_id FROM events),
d AS (SELECT day, month, count(DISTINCT user_id)::BIGINT AS dau
      FROM e GROUP BY 1, 2),
m AS (SELECT month, count(DISTINCT user_id)::BIGINT AS mau
      FROM e GROUP BY 1)
SELECT d.day, d.dau, m.mau, round(d.dau / m.mau, 6) AS stickiness
FROM d JOIN m USING (month)
"""


# ---------------------------------------------------------------------------
# power-iteration PCA — the spectral family, oracle-exact
# ---------------------------------------------------------------------------

def embedding_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the centered embedding corpus by 2
    unrolled power-iteration steps (v ← Cv without materializing the
    covariance: v'_j = Σ_i x̃_ij·(x̃_i·v), the classic distributed
    matvec) — the spectral sibling of the k-means/PageRank iterative
    family. 64 rows: (dim, mean, component).

    Engine-exactness discipline (stronger than round-and-pray):
    every matvec term is FIXED-POINT (×10⁷ → bigint) so partial sums
    are integer-exact and order-independent; the inter-round
    normalization divides by a POWER OF TWO sized from the max
    coefficient's bit length (binary-exact in double — no rounding
    between rounds at all); the only decimal rounding is the final
    unit-normalized component. The all-positive init (1/8 per dim —
    itself a power of two) fixes the eigenvector sign.

    Convergence is spectrum-dependent (error ∝ (λ₂/λ₁)^rounds); the
    driver corpus is near-isotropic (measured eigengap ≈ 1.07), so
    TWO rounds pin the matvec semantics for the oracle exactly the
    way embedding_kmeans_step pins one Lloyd step — production runs
    the same operator with more rounds
    (tests/test_queries_r6c.py proves 6-round convergence to the
    true eigenvector on an anisotropic corpus).

    Scale shape: two corpus passes per iteration (a narrow fold for
    the per-row dot, a 64-way explode + 64-key integer agg for the
    matvec); the driver holds only 64 exact bigints between rounds —
    the k-means centroid discipline (operators/spectral.py)."""
    from kafkaconnect_spark.operators.spectral import (
        power_iteration_top_component,
    )

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    return power_iteration_top_component(emb, rounds=2, dim=64)


def _pca_oracle(d: int = 64) -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
mu0 AS (SELECT generate_subscripts(vec, 1) AS j, unnest(vec) AS x FROM v),
mu AS (SELECT j, sum(round(x, 7)::DECIMAL(20,7))::DOUBLE / count(*) AS m
       FROM mu0 GROUP BY j),
mul AS (SELECT list(m ORDER BY j) AS ml FROM mu),
d1 AS (SELECT vec,
              list_sum([round((vec[j] - ml[j]) * 0.125 * 1e7)::BIGINT
                        FOR j IN range(1, {d + 1})]) / 1e7 AS dd
       FROM v CROSS JOIN mul),
s1 AS (SELECT u.j, sum(round((vec[j] - ml[j]) * dd * 1e7)::BIGINT) AS s
       FROM d1 CROSS JOIN mul
            CROSS JOIN (SELECT unnest(range(1, {d + 1})) AS j) u
       GROUP BY u.j),
k1 AS (SELECT greatest(length(bin(max(abs(s)))), 1) AS k FROM s1),
v1 AS (SELECT j, s / pow(2.0, k) AS vv FROM s1 CROSS JOIN k1),
v1l AS (SELECT list(vv ORDER BY j) AS vl FROM v1),
d2 AS (SELECT vec,
              list_sum([round((vec[j] - ml[j]) * vl[j] * 1e7)::BIGINT
                        FOR j IN range(1, {d + 1})]) / 1e7 AS dd
       FROM v CROSS JOIN mul CROSS JOIN v1l),
s2 AS (SELECT u.j, sum(round((vec[j] - ml[j]) * dd * 1e7)::BIGINT) AS s
       FROM d2 CROSS JOIN mul
            CROSS JOIN (SELECT unnest(range(1, {d + 1})) AS j) u
       GROUP BY u.j),
k2 AS (SELECT greatest(greatest(length(bin(max(abs(s)))), 1) - 26, 0) AS kk
       FROM s2),
nrm AS (SELECT sqrt(sum((abs(s) >> kk) * (abs(s) >> kk))::DOUBLE)
               * pow(2.0, max(kk)) AS nn
        FROM s2 CROSS JOIN k2)
SELECT (s2.j - 1)::INT AS dim, round(mu.m, 6) AS mean,
       round(s2.s / nrm.nn, 6) AS component
FROM s2 JOIN mu ON mu.j = s2.j CROSS JOIN nrm
"""


PCA_ORACLE = _pca_oracle()


R6C_CATALOG = {
    "embedding_power_iteration_pca": (
        embedding_power_iteration_pca,
        PCA_ORACLE,
    ),
    "docs_winnowing_plagiarism": (docs_winnowing_plagiarism, WINNOWING_ORACLE),
    "docs_prefix_truncation_dups": (
        docs_prefix_truncation_dups,
        PREFIX_TRUNCATION_ORACLE,
    ),
    "dedup_threshold_sensitivity": (
        dedup_threshold_sensitivity,
        THRESHOLD_SENSITIVITY_ORACLE,
    ),
    "embedding_duplicate_vectors": (
        embedding_duplicate_vectors,
        DUP_VECTORS_ORACLE,
    ),
    "similarity_range_search": (similarity_range_search, RANGE_SEARCH_ORACLE),
    "events_cms_width_sweep": (events_cms_width_sweep, CMS_WIDTH_SWEEP_ORACLE),
    "docs_dedup_cluster_size_histogram": (
        docs_dedup_cluster_size_histogram,
        CLUSTER_SIZE_HIST_ORACLE,
    ),
    "events_markov_stationary": (
        events_markov_stationary,
        MARKOV_STATIONARY_ORACLE,
    ),
    "events_dau_mau_stickiness": (events_dau_mau_stickiness, DAU_MAU_ORACLE),
}

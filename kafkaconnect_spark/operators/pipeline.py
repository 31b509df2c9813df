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
- decontamination shuffles on a 60-bit shingle hash, not the shingle
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
    split. Join is on a 60-bit hash (narrow shuffle rows, collision
    expectation far below one even at 10^10 distinct shingles); the train
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
    independently (skewed streams can be sub-salted by date).

    ``order_col`` must be unique within a stream (doc ids are): the
    frame is ROWS-based so the running sum advances one document at a
    time — the default RANGE frame would give all peers at a tied
    order value the same inclusive sum, assigning starts that no
    physical concatenation can produce."""
    from pyspark.sql import Window

    from kafkaconnect_spark.functions.text import token_count

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
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


def gopher_repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style (Rae et al. 2021, public) repetition/quality stats,
    fully NARROW — every metric is a per-row fold over the token/line
    arrays, so at 100 TB this runs at parquet-scan speed:

    - word_count, mean_word_len
    - symbol_word_ratio: ('#' + '...') occurrences per word
    - dup_line_frac: 1 - distinct_lines/lines
    - top_2gram_frac: occurrences of the most frequent word 2-gram over
      all 2-grams, computed per-row as a run-length fold over the
      SORTED 2-gram array (O(d log d), no explode/shuffle)
    - keep: the composite Gopher-ish filter verdict

    All ratios are int/int IEEE divisions — bit-identical in any
    engine, no rounding needed for oracle replay."""
    # NULL text behaves as empty (metrics 0, keep=false) on both the
    # engine and oracle sides — not NULL-propagated half-metrics
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = df.select(
        F.col(id_col),
        txt.alias(text_col),
        F.when(F.length(F.trim(txt)) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.trim(txt), TOKEN_SPLIT_RE))
        .alias("__toks"),
        F.split(txt, "\n").alias("__lines"),
    )
    grams = F.expr(
        "CASE WHEN size(__toks) < 2 THEN array() ELSE "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1))) END"
    )
    top_run = F.expr(
        "aggregate(sort_array(__grams), "
        "named_struct('prev', cast(null as string), 'run', 0, 'best', 0), "
        "(acc, g) -> named_struct('prev', g, "
        "'run', if(acc.prev is not null and g = acc.prev, acc.run + 1, 1), "
        "'best', greatest(acc.best, if(acc.prev is not null and g = acc.prev, acc.run + 1, 1))), "
        "acc -> acc.best)"
    )
    n_hash = F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    stats = toks.withColumn("__grams", grams).select(
        F.col(id_col),
        F.size("__toks").alias("word_count"),
        F.when(F.size("__toks") == 0, F.lit(0.0))
        .otherwise(
            F.expr("aggregate(__toks, cast(0 as bigint), (acc, t) -> acc + length(t))")
            / F.size("__toks")
        )
        .alias("mean_word_len"),
        F.when(F.size("__toks") == 0, F.lit(0.0))
        .otherwise((n_hash + n_ellipsis) / F.size("__toks"))
        .alias("symbol_word_ratio"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("__lines")) / F.size("__lines")
        ).alias("dup_line_frac"),
        F.when(F.size("__grams") == 0, F.lit(0.0))
        .otherwise(top_run / F.size("__grams"))
        .alias("top_2gram_frac"),
    )
    return stats.withColumn(
        "keep",
        (F.col("word_count") >= 5)
        & (F.col("word_count") <= 100000)
        & (F.col("mean_word_len") >= 2.0)
        & (F.col("mean_word_len") <= 12.0)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("dup_line_frac") < 0.3)
        & (F.col("top_2gram_frac") < 0.2),
    )


def balance_sources(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Mixture balancing: deterministically downsample every source to
    the smallest source's size (in expectation) — the keep threshold is
    integer-exact (min_count * 1e6 DIV count) and membership is decided
    by md5-hash of the id, so the sample is stable and any engine
    replays it bit-for-bit.

    Scale shape: per-source counts are a tiny aggregate (|sources|
    rows) broadcast back; the filter itself is narrow. Generalizes to
    arbitrary target weights by scaling the numerator."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__c"))
    mn = counts.agg(F.min("__c").alias("__mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        F.col(source_col), F.expr("(__mn * 1000000) DIV __c").alias("__thr")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .where(F.pmod(hash64(F.col(id_col).cast("string"), seed), F.lit(1000000)) < F.col("__thr"))
        .select(id_col, source_col)
    )


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled source-mixture weights — the multilingual /
    multi-source sampling scheme (p_s ∝ count_s^alpha; alpha<1 upsamples
    the tail, alpha=1 is proportional, alpha=0 uniform; the standard
    mixture rule from multilingual pretraining, e.g. XLM-R, public).
    Returns (source, n_docs, weight, expected_docs): weight sums to 1;
    expected_docs = weight × corpus size is what a sampler draws per
    epoch.

    Float parity: pow is transcendental, so each count^alpha is rounded
    to 7 decimals and summed as DECIMAL (order-independent, exact);
    weight = exact_decimal / exact_decimal in IEEE doubles, then a
    final non-boundary round(6). Scale shape: |sources| rows after a
    map-side-combined count — the heavy input never shuffles more than
    a partial-agg exchange, and the denominator is a broadcast 1-row
    cross join.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w7 = F.round(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))), 7).cast(
        T.DecimalType(20, 7)
    )
    weighted = counts.select(F.col(source_col), "n_docs", w7.alias("__w"))
    denom = weighted.agg(
        F.sum("__w").alias("__dw"), F.sum("n_docs").alias("__total")
    )
    return (
        weighted.crossJoin(F.broadcast(denom))  # 1-row global denominator
        .select(
            F.col(source_col),
            "n_docs",
            F.round(
                F.col("__w").cast("double") / F.col("__dw").cast("double"), 6
            ).alias("weight"),
            F.round(
                F.col("__w").cast("double")
                / F.col("__dw").cast("double")
                * F.col("__total").cast("double"),
                4,
            ).alias("expected_docs"),
        )
    )


def shard_assignment(
    df: DataFrame, id_col: str = "doc_id", shards: int = 64, seed: str = "shard"
) -> DataFrame:
    """Deterministic global shuffle + sharding — the "write N shuffled
    shards for the trainer" step. shard_id = hash(id) mod N; pos = rank
    of the hash within the shard (ties broken by id).

    Scale shape: one hash-partitioned exchange on shard_id and a
    per-shard sort — exactly what `repartition(N, shard_id).
    sortWithinPartitions(h)` does in the writer; no global sort, no
    driver collection. Hash-ordering within shards IS the shuffle of
    training order (md5 ≈ uniform random permutation, but stable)."""
    from pyspark.sql import Window

    h = hash64(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy("shard_id").orderBy("__h", id_col)
    return (
        df.select(F.col(id_col), h.alias("__h"))
        .withColumn("shard_id", F.pmod(F.col("__h"), F.lit(shards)))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard_id", "pos")
    )


def salient_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k salient terms per doc by tf·(N/df) — keyword extraction
    for corpus indexing/analysis. Uses the raw N/df ratio instead of
    log-idf so every weight is a product/quotient of exact integers:
    bit-identical in any IEEE engine (ln() differs by ulps across
    libms and would flake a value-hash gate).

    Scale shape: per-doc term frequencies reduce map-side (explode →
    groupBy (doc, token)); the document-frequency table is vocabulary-
    sized and joins broadcast; the only row-count-sized shuffles are
    the tf aggregation and the final per-doc top-k window."""
    from pyspark.sql import Window

    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.where(F.col(text_col).isNotNull()).select(
        F.countDistinct(id_col).alias("n_docs")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("weight").desc(), F.col("token").asc())
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("weight", F.col("tf") * (F.col("n_docs") / F.col("df")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "weight", "rank")
    )


def bigram_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide word-2-gram frequency, top-k — the n-gram-LM
    counting shape (the unigram variant is text_vocabulary_topk).

    Scale shape: the bigram array is built NARROW per row (transform
    over sequence — no join, no explode-then-self-zip), then
    explode → groupBy(count). Map-side partial aggregation collapses
    each hot boilerplate bigram to one row per task before the
    shuffle, so a df-10⁶ bigram costs one shuffle row per task, not
    10⁶. The top-k is a TakeOrderedAndProject under the total order
    (freq desc, bigram asc) — never a global sort — so the limit
    boundary is deterministic and the driver holds only k rows."""
    txt = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    toks = df.select(
        F.when(F.length(txt) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(txt, TOKEN_SPLIT_RE))
        .alias("__toks")
    )
    grams = F.expr(
        "CASE WHEN size(__toks) < 2 THEN array() ELSE "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1))) END"
    )
    return (
        toks.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram").asc())
        .limit(k)
    )


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-family quality score: bits-per-bigram under an
    add-one-smoothed corpus bigram LM — P(b|a) = (B(a,b)+1)/(U(a)+V),
    score = −mean log2 P. The classic pretraining filter (docs the
    corpus LM finds surprising are noise; docs it finds too easy are
    boilerplate). Reported as bits (no 2^x — pow() differs across
    libms; the bits scale orders identically).

    Scale shape: the LM tables are corpus aggregates with map-side
    combine (bigram table ≤ vocab², context table vocab-sized, V one
    row broadcast); each doc's bigram occurrences join the tables on
    their keys (uniform string keys — AQE handles moderate stopword
    skew) and reduce per doc in one groupBy. Each log2 term is
    rounded to 7 decimals and DECIMAL-summed — order-independent ⇒
    parallelism-independent, same rule as token_entropy."""
    txt = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    toks = df.select(
        F.col(id_col),
        F.when(F.length(txt) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(txt, TOKEN_SPLIT_RE))
        .alias("__toks"),
    )
    grams = F.expr(
        "CASE WHEN size(__toks) < 2 THEN array() ELSE "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(element_at(__toks, i) AS a, element_at(__toks, i + 1) AS b)) END"
    )
    pairs = (
        toks.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), F.col("g.a").alias("a"), F.col("g.b").alias("b"))
    )
    bc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("bcount"))
    uc = bc.groupBy("a").agg(F.sum("bcount").alias("ucount"))
    vocab = (
        toks.select(F.explode("__toks").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    scored = (
        pairs.join(bc, ["a", "b"])
        .join(uc, "a")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__term",
            F.expr(
                "cast(round(log2((bcount + 1) / cast(ucount + v as double)), 7) "
                "as decimal(20,7))"
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__term").alias("__s"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            # NO final round: the decimal sum → double → one division
            # is already bit-identical in any engine, while round(…,6)
            # diverges when the value's shortest repr sits on a .5
            # boundary (Spark rounds the repr HALF_UP, DuckDB rounds
            # the binary double)
            (-F.col("__s").cast("double") / F.col("n_bigrams")).alias(
                "bits_per_bigram"
            ),
        )
    )
    empty = toks.where(F.size("__toks") < 2).select(
        F.col(id_col),
        F.lit(0).cast("bigint").alias("n_bigrams"),
        F.lit(0.0).alias("bits_per_bigram"),
    )
    return scored.unionByName(empty)


def norm_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lo_q: float = 0.25,
    hi_q: float = 0.75,
    whisker: float = 1.5,
) -> DataFrame:
    """Embedding sanity filter: flag vectors whose L2 norm falls
    outside the Tukey fence [p_lo − w·IQR, p_hi + w·IQR]. Degenerate
    (≈0) and exploded norms are the standard symptoms of an upstream
    encoder bug; at corpus scale this is the cheap screen that runs
    before any ANN/dedup pass trusts the vectors.

    Scale shape: the norm is a NARROW per-row JVM fold (no Python);
    the two EXACT percentiles are one global aggregate producing a
    single 2-double row, broadcast back via crossJoin — the standard
    global-denominator pattern, not a data-plane cartesian. Norms are
    rounded to 6 decimals BEFORE the percentile so engine summation-
    order noise cannot move the interpolation inputs, making the
    fence — and therefore every flag — engine-exact."""
    v = df.where(F.size(F.col(vec_col)) > 0)
    norms = v.select(
        F.col(id_col),
        F.round(
            F.sqrt(
                F.expr(
                    f"aggregate({vec_col}, cast(0 as double), "
                    "(acc, x) -> acc + cast(x as double) * cast(x as double))"
                )
            ),
            6,
        ).alias("norm"),
    )
    # percentiles interpolate over INTEGER micro-units of the 6-decimal
    # norms: even-count midpoints are then exact (x or x.5 — both
    # representable), so the percentile, the fence arithmetic, and
    # every comparison are bit-identical in any engine. Rounding an
    # interpolated value at its own precision instead would diverge
    # whenever the midpoint's 7th digit is 5 (Spark rounds the decimal
    # repr HALF_UP, DuckDB rounds the binary double).
    # explicit round-then-cast for the micro-units: norm*1e6 carries
    # double noise around the integer, and a bare cast TRUNCATES in
    # Spark but ROUNDS in DuckDB — round(…, 0) first is identical in
    # both (the true value is integral, never .5)
    withu = norms.withColumn(
        "__nu", F.round(F.col("norm") * F.lit(1000000.0), 0).cast("bigint")
    )
    fence = withu.agg(
        F.expr(f"percentile(__nu, cast({lo_q} as double))").alias("__plo"),
        F.expr(f"percentile(__nu, cast({hi_q} as double))").alias("__phi"),
    ).select(
        (F.col("__plo") - whisker * (F.col("__phi") - F.col("__plo"))).alias("__lo"),
        (F.col("__phi") + whisker * (F.col("__phi") - F.col("__plo"))).alias("__hi"),
    )
    return withu.crossJoin(F.broadcast(fence)).select(
        F.col(id_col),
        F.col("norm"),
        (F.col("__lo") / F.lit(1000000.0)).alias("fence_lo"),
        (F.col("__hi") / F.lit(1000000.0)).alias("fence_hi"),
        ((F.col("__nu") < F.col("__lo")) | (F.col("__nu") > F.col("__hi"))).alias(
            "is_outlier"
        ),
    )


def bloom_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: str = "contam",
) -> DataFrame:
    """Bloom-filter decontamination — the zero-join scale variant of
    ngram_contamination: the train split's shingle set is folded into
    an m-bit Bloom filter and broadcast as a LITERAL bitset, so the
    test side becomes a narrow scan (no shuffle, no join at all).

    Scale shape: the filter is built distributedly — k bit positions
    per train shingle, distinct'd on the cluster — and only the SET
    BIT POSITIONS are collected (bounded by m_bits regardless of
    corpus size; 1M bits ≈ ≤1M ints). Probabilistic contract: NO
    false negatives (every truly contaminated shingle is flagged);
    false-positive rate ≈ (1-e^(-kn/m))^k, tested against the exact
    join in test_pipeline_ops.py. Size m_bits to the train shingle
    cardinality (≈1.44·n·log2(1/fpp) bits)."""
    th = _shingle_hashes(train, id_col, text_col, n, seed).select("sh_hash")
    pos_cols = [
        F.pmod(F.xxhash64(F.col("sh_hash"), F.lit(j)), F.lit(m_bits)) for j in range(k)
    ]
    positions = (
        th.select(F.explode(F.array(*pos_cols)).alias("p")).distinct().collect()
    )
    words = [0] * ((m_bits + 63) // 64)
    for r in positions:
        p = r.p
        words[p // 64] |= 1 << (p % 64)
    # two's-complement render so every word parses as a BIGINT literal
    bits_sql = "array({})".format(
        ",".join(f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words)
    )

    checks = [
        f"((element_at(__bf, cast(pmod(xxhash64(sh_hash, {j}), {m_bits}) div 64 as int) + 1) "
        f">> cast(pmod(xxhash64(sh_hash, {j}), {m_bits}) % 64 as int)) & 1) = 1"
        for j in range(k)
    ]
    te = _shingle_hashes(test, id_col, text_col, n, seed)
    flagged = (
        te.withColumn("__bf", F.expr(bits_sql))  # bound once; constant-folded
        .withColumn("__hit", F.expr("(" + " AND ".join(checks) + ")"))
        .drop("__bf")
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.sum(F.col("__hit").cast("long")).alias("n_flagged"),
        F.round(F.sum(F.col("__hit").cast("long")) / F.count("*"), 6).alias(
            "contamination"
        ),
    )


def token_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy of the within-doc token distribution — a
    repetition/quality proxy (low entropy = boilerplate/spam; the
    normalized form is comparable across doc lengths).

    Fully NARROW: the token array, the distinct-token counts, and the
    entropy fold are all per-row expressions — at 100 TB this runs at
    parquet-scan speed, no shuffle. Counts come from a run-length fold
    over the SORTED token array — O(n log n) per row, so a single
    200k-token outlier document can't stall its task the way the naive
    O(distinct·n) count-by-filter would. Each -p·log2(p) term is
    rounded to 7 decimals and DECIMAL-summed (order-independent), so
    the DuckDB oracle replays the value exactly."""
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), TOKEN_SPLIT_RE).alias(
            "__toks"
        ),
        (F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0).alias("__empty"),
    )
    staged = toks.select(
        F.col(id_col),
        F.when(F.col("__empty"), F.lit(0)).otherwise(F.size("__toks")).alias("n_tokens"),
        F.when(F.col("__empty"), F.expr("array()").cast("array<int>"))
        .otherwise(
            # run-length encode the sorted tokens: (prev, run, counts)
            # accumulator; the finish lambda flushes the last run
            F.expr(
                "aggregate(array_sort(__toks), "
                "named_struct('p', cast(null as string), 'c', 0, 'cs', cast(array() as array<int>)), "
                "(a, t) -> if(a.p is null, named_struct('p', t, 'c', 1, 'cs', a.cs), "
                "  if(t = a.p, named_struct('p', a.p, 'c', a.c + 1, 'cs', a.cs), "
                "     named_struct('p', t, 'c', 1, 'cs', array_append(a.cs, a.c)))), "
                "a -> if(a.p is null, a.cs, array_append(a.cs, a.c)))"
            )
        )
        .alias("__counts"),
    )
    ent = staged.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.size("__counts").alias("n_distinct"),
        F.expr(
            "aggregate(__counts, cast(0 as decimal(20,7)), (acc, c) -> cast(acc + "
            "cast(round(-(c / cast(n_tokens as double)) * log2(c / cast(n_tokens as double)), 7) "
            "as decimal(20,7)) as decimal(20,7)))"
        ).alias("__ent"),
    )
    return ent.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("n_distinct"),
        # raw decimal→double, no round: the sum is a multiple of 1e-7,
        # so round(…, 6) would sit exactly on .5 boundaries where
        # engines disagree; the nearest-double conversion itself is
        # identical everywhere
        F.col("__ent").cast("double").alias("entropy"),
        F.when(
            F.col("n_distinct") > 1,
            F.round(F.col("__ent").cast("double") / F.log2("n_distinct"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )


def quantize_int8(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-vector symmetric int8 quantization — how 100 TB of
    embeddings actually get stored (4× smaller than float32, and ANN
    distance on int8 is SIMD-friendly). scale = max|v|/127 per vector;
    q_i = round(v_i/scale). Reports the quantized range and the mean
    absolute reconstruction error per vector.

    Fully NARROW (per-row array folds, no shuffle); the error fold is
    per-element rounded → DECIMAL-summed so it replays exactly in the
    oracle. Degenerate rows (NULL or empty vector) are excluded — there
    is nothing to quantize and the oracle's unnest produces no rows for
    them either."""
    v = df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("__v"),
    ).where(F.size("__v") > 0)
    s = v.select(
        F.col(id_col),
        F.col("__v"),
        (
            F.greatest(F.expr("array_max(transform(__v, x -> abs(x)))"), F.lit(1e-12))
            / 127.0
        ).alias("__scale"),
    )
    q = s.select(
        F.col(id_col),
        F.col("__v"),
        F.col("__scale"),
        F.expr("transform(__v, x -> cast(round(x / __scale, 0) as int))").alias("__q"),
    )
    return q.select(
        F.col(id_col),
        F.round(F.col("__scale"), 6).alias("scale"),
        F.size("__v").alias("n_dims"),
        F.expr("array_min(__q)").alias("q_min"),
        F.expr("array_max(__q)").alias("q_max"),
        # no final round — decimal-sum→double then an IEEE division is
        # bit-identical across engines; rounding would land on exact
        # .5 boundaries (sums are multiples of 1e-7) and flip
        (
            F.expr(
                "aggregate(zip_with(__v, __q, (x, qq) -> "
                "cast(round(abs(x - qq * __scale), 7) as decimal(20,7))), "
                "cast(0 as decimal(20,7)), (acc, t) -> cast(acc + t as decimal(20,7)))"
            ).cast("double")
            / F.size("__v")
        ).alias("recon_mae"),
    )


def _rp_sign(j: int, i: int) -> int:
    """Deterministic ±1 projection-matrix entry: parity of the first
    32 md5 bits of "j:i" — replayable verbatim in the DuckDB oracle."""
    import hashlib

    return 1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1


def random_projection(
    df: DataFrame,
    out_dims: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with a
    deterministic ±1 matrix: y_j = Σ_i sign(j,i)·v_i / √out_dims.
    Long-form output (id, out_dim, value).

    The out_dims×dim sign matrix is tiny and FOLDED INTO the per-row
    expression as literals (same trick as the IVF centroid argmax) —
    the corpus never joins or shuffles to project; at 100 TB this is a
    narrow map at scan speed. Components are rounded to 7 decimals and
    DECIMAL-summed (signs are exact ints), so the projection is
    order-independent and bit-replayable in the oracle.

    Rows whose vector length != ``dim`` (including NULL vectors) are
    excluded: zip_with against the literal sign rows would NULL-pad
    the short side and poison every output dim for that id, silently
    and divergently from any SQL oracle — an explicit length contract
    is the only sane semantics."""
    import math

    df = df.where(F.size(F.col(vec_col)) == dim)
    sums = []
    for j in range(out_dims):
        signs = ", ".join(str(_rp_sign(j, i)) for i in range(dim))
        sums.append(
            F.expr(
                f"aggregate(zip_with({vec_col}, array({signs}), "
                "(v, s) -> cast(round(cast(v as double), 7) as decimal(20,7)) * s), "
                "cast(0 as decimal(27,7)), (acc, t) -> cast(acc + t as decimal(27,7)))"
            )
        )
    long = df.select(F.col(id_col), F.posexplode(F.array(*sums)).alias("out_dim", "__s"))
    # NO final round: the decimal sum converts to the same nearest
    # double in every engine and /sqrt(k) is a correctly-rounded IEEE
    # op — bit-identical everywhere. (A round(…, 6) here would sit on
    # exact .5 boundaries by construction — multiples of 1e-7/√k — and
    # engines disagree on those.)
    return long.select(
        F.col(id_col),
        F.col("out_dim"),
        (F.col("__s").cast("double") / math.sqrt(out_dims)).alias("value"),
    )


def reservoir_sample(
    df: DataFrame,
    group_col: str = "source",
    k: int = 50,
    id_col: str = "doc_id",
    seed: str = "reservoir",
) -> DataFrame:
    """Fixed-SIZE sample per group (k docs per source — the data-mixing
    primitive when ratios aren't enough): rank rows within each group
    by a content-stable hash of the id and keep the k smallest.
    Distributionally a uniform k-reservoir, but deterministic across
    runs/retries/engines (rand() is neither) — the id tiebreak makes
    the cut boundary a total order.

    One keyed window shuffle (group_col); ranking never goes global.
    Returns (group, id, sample_rank)."""
    from pyspark.sql import Window

    h = hash64(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(F.col(group_col), F.col(id_col), F.col("__rk").alias("sample_rank"))
    )

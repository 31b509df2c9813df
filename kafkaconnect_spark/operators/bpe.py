"""Distributed BPE tokenizer training — the tokenizer-learning pass a
training-data pipeline runs before token-budget accounting.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units", public): start from character symbols per
word (with an end-of-word marker), repeatedly merge the most frequent
adjacent symbol pair. The classic formulation is inherently iterative
— one corpus-wide argmax per merge — so the Spark shape matters:

- The corpus first reduces to a (word, count) FREQUENCY TABLE
  (one groupBy). Every subsequent round runs over that table — its
  size is the distinct-word vocabulary (~10^7 rows at 100 TB), not
  the corpus, so 20 merge rounds cost 20 vocab-sized passes, not 20
  corpus scans.
- Per round: adjacent pairs explode from the per-word symbol arrays
  weighted by word count → one map-side-combined groupBy(pair) → the
  single best row reaches the driver (control plane, 1 row — not a
  data collect). The merge application is a NARROW per-row fold.
- The symbol table is re-persisted and lineage-truncated every few
  rounds (localCheckpoint; same reasoning as connected components —
  20 stacked folds would otherwise nest 20 lambda layers deep in one
  plan and analysis time blows up before any task runs).

Determinism: ties in pair frequency break on the pair string
(freq desc, pair asc) — a total order, so the learned merge table is
engine- and parallelism-independent. Verified against a pure-Python
reference implementation property-style in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkaconnect_spark.functions.text import TOKEN_SPLIT_RE

END_OF_WORD = "▁"  # the sentencepiece-style marker; never in ASCII text

# left-to-right greedy merge of (a, b) -> ab over a symbol array, as a
# single fold: acc carries the emitted prefix and one pending symbol.
_MERGE_FOLD = (
    "aggregate(syms, "
    "named_struct('out', cast(array() as array<string>), 'prev', cast(null as string)), "
    "(acc, s) -> CASE "
    "  WHEN acc.prev IS NULL THEN named_struct('out', acc.out, 'prev', s) "
    "  WHEN acc.prev = '{a}' AND s = '{b}' THEN "
    "    named_struct('out', array_append(acc.out, '{ab}'), 'prev', cast(null as string)) "
    "  ELSE named_struct('out', array_append(acc.out, acc.prev), 'prev', s) END, "
    "acc -> CASE WHEN acc.prev IS NULL THEN acc.out "
    "       ELSE array_append(acc.out, acc.prev) END)"
)


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def word_frequency_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, count) over the whitespace-tokenized lowercased corpus —
    the one corpus-sized pass; everything BPE does afterwards runs on
    this vocabulary-sized table."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                        TOKEN_SPLIT_RE)
            ).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def learn_bpe_merges(
    df: DataFrame,
    num_merges: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 5,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge table [(left, right, weighted_freq), …] — rank i is
    the i-th most frequent adjacent pair at the time it was merged.

    The return value is a MERGE TABLE (a tokenizer artifact, bounded
    by num_merges), not data — it lives on the driver by design, like
    the IVF centroid table."""
    words = word_frequency_table(df, text_col, id_col)
    # initial symbols: characters + end-of-word marker
    syms = words.select(
        F.col("count"),
        F.concat(
            F.split(F.col("word"), "(?!$)"),  # chars
            F.array(F.lit(END_OF_WORD)),
        ).alias("syms"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # no eager count: the round's pair-count job is the first consumer
    # and fills the cache — an extra materialization job per round
    # would only add scheduler overhead

    merges: list[tuple[str, str, int]] = []
    # pending_release: the PREVIOUS round's table, still feeding the
    # lazily-cached current one — release only after this round's
    # pair-count job has materialized the current cache
    pending_release: DataFrame | None = None
    for rank in range(num_merges):
        pairs = (
            syms.where(F.size("syms") >= 2)
            .select(
                F.col("count"),
                # space-separated pair key: symbols come from
                # whitespace-split words, so no symbol contains a space
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> concat(element_at(syms, i), ' ', "
                        "element_at(syms, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("count").alias("freq"))
        )
        top = pairs.orderBy(F.col("freq").desc(), F.col("pair").asc()).limit(1).collect()
        if pending_release is not None:
            pending_release.unpersist()
            pending_release = None
        if not top:
            break
        a, b = top[0].pair.split(" ", 1)
        freq = top[0].freq
        merges.append((a, b, freq))
        merged = syms.select(
            F.col("count"),
            F.expr(
                _MERGE_FOLD.format(
                    a=_sql_quote(a), b=_sql_quote(b), ab=_sql_quote(a + b)
                )
            ).alias("syms"),
        )
        if (rank + 1) % checkpoint_every == 0:
            # truncate the stacked-fold lineage before it nests deep
            # enough to stall plan analysis (eager ⇒ safe to release
            # the input immediately)
            merged = merged.localCheckpoint(eager=True)
            syms.unpersist()
        else:
            merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
            pending_release = syms
        syms = merged
    syms.unpersist()
    if pending_release is not None:
        pending_release.unpersist()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment each doc with a learned merge table, applied IN RANK
    ORDER — a fully NARROW chain (the merge table is a driver-side
    constant folded into the expression, like the LSH hyperplanes).
    Returns (id, n_words, n_tokens).

    Execution shape: the doc is encoded as ONE boundary-safe string —
    each symbol wrapped in single spaces (adjacency = double space,
    words separated by a newline, which no whitespace-split token can
    contain) — and each merge is a native ``replace`` of
    ``' a  b '`` with ``' ab '``. Non-overlapping left-to-right
    string replacement is exactly the greedy merge fold (replaced
    output is never re-matched; the same argument the DuckDB oracle
    rests on), but it runs as codegen'd string ops instead of
    interpreted nested higher-order lambdas — ~6× faster at sf0.1.
    Token count falls out as (double-space separators) + n_words."""
    eow = _sql_quote(END_OF_WORD)
    toks = df.select(
        F.col(id_col),
        # column API (not a SQL literal): '\s+' would lose its
        # backslash to SQL string escape processing
        F.filter(
            F.split(
                F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                TOKEN_SPLIT_RE,
            ),
            lambda w: F.length(w) > 0,
        ).alias("words"),
    )
    # ' c  h  a  r  s  ▁ ' per word, newline-joined: regexp '(.)' →
    # '$1  ' emits each char with the trailing double-space, then the
    # end-of-word marker closes the wrap
    doc_str = (
        "array_join(transform(words, w -> concat(' ', "
        f"regexp_replace(w, '(.)', '$1  '), '{eow} ')), '\\n')"
    )
    staged = toks.select(
        F.col(id_col), F.size("words").alias("n_words"), F.expr(doc_str).alias("s")
    )
    for a, b, _ in merges:
        pat = _sql_quote(f" {a}  {b} ")
        rep = _sql_quote(f" {a}{b} ")
        staged = staged.withColumn("s", F.expr(f"replace(s, '{pat}', '{rep}')"))
    return staged.select(
        F.col(id_col),
        "n_words",
        # tokens per word = within-word '  ' separators + 1; summed:
        # total '  ' occurrences + n_words ('  ' never crosses the
        # newline word boundary, and no triple-space can occur)
        (
            F.length("s") - F.length(F.expr("replace(s, '  ', ' ')")) + F.col("n_words")
        ).cast("int").alias("n_tokens"),
    )

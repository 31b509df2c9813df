"""Text-analysis functions for training-data pipelines (BASELINE.json
north star; no reference citation by definition — SURVEY §2.7).

All pure Column expressions (JVM-side, codegen'd): language-ID by
stopword-hit scoring, quality scoring (length/punct/stopword ratios),
token counting (whitespace + a BPE-ish regex), and md5/minhash document
fingerprints. Deterministic by construction so a DuckDB oracle can
replay them bit-for-bit.

Scale: every function is a narrow map over the documents table — no
shuffle, full pushdown/pruning; at 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword tables for the n-gram/stopword language heuristic; tiny and
# broadcast as literals inside the expression (no join).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "ich", "nicht", "ein", "mit", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/number/punctuation segmentation (GPT-2-style coarse):
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), TOKEN_SPLIT_RE)


def token_count(text: Column | str) -> Column:
    """Whitespace token count; empty string → 0."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), TOKEN_SPLIT_RE))
    )


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish segments (letters runs, digit runs, single
    punctuation) — a cheap token-budget estimator."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    total = F.length(c)
    # \p{L}\p{N} (Unicode letters/digits), NOT \w: Java's \w is
    # ASCII-only, so 'café' / CJK text would count every non-ASCII
    # letter as punctuation and quality-filter clean non-English prose
    # as punctuation soup. RE2 (the DuckDB oracle) supports the same
    # \p classes, so both engines agree.
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\p{L}\p{N}\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards reasonable length
    and stopword presence, penalizes punctuation soup. Weights are
    engine-defined constants (documented in docs; the point is the
    deterministic, scan-speed shape)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    return F.round(0.4 * length_term + 0.3 * sw_term + 0.3 * punct_term, 6)


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language ID over the table above; ties break by
    language code order (deterministic). Returns 'und' when no
    stopword hits at all."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    scores = []
    for code in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[code]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit(code).alias("code"),
            )
        )
    # max by (hits, then reversed code order) == first max scanning sorted codes
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["hits"].alias("hits"),
                    # invert code ordering so array_max's lexicographic
                    # tiebreak picks the alphabetically-first code
                    F.lit(len(scores) - i).alias("inv"),
                    s["code"].alias("code"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["code"])


def fingerprint_md5(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased
    text — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), TOKEN_SPLIT_RE, " "))


def hash64(c: Column, seed: int | str = 0) -> Column:
    """Deterministic 60-bit hash shared with the DuckDB oracle: first
    15 hex chars of md5(seed:value) as a bigint (15 hex = 60 bits —
    the widest prefix that fits a SIGNED bigint in both engines; 16
    chars would overflow to NULL for half the space). Used for
    splits, sampling, sharding, and decontamination shingle joins.

    Width matters for the shingle joins: at 100 TB-corpus shingle
    cardinalities (~10^9-10^10 distinct) a 32-bit prefix would be
    nearly saturated and every test shingle would collide with SOME
    train shingle — 60 bits keeps the collision expectation far below
    one."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, 15), 16, 10
    ).cast("bigint")

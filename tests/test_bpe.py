"""Distributed BPE training vs a pure-Python reference — the merge
table and segmentation must match exactly (same greedy left-to-right
semantics, same (freq desc, pair asc) tie-break)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Row

from kafkaconnect_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    learn_bpe_merges,
    word_frequency_table,
)


# ---------------------------------------------------------------------------
# reference implementation (Sennrich-style, plain Python)
# ---------------------------------------------------------------------------


def _ref_word_freq(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"\s+", (t or "").strip().lower()):
            if w:
                c[w] += 1
    return c


def _ref_merge_word(syms, a, b):
    out, prev = [], None
    for s in syms:
        if prev is None:
            prev = s
        elif prev == a and s == b:
            out.append(a + b)
            prev = None
        else:
            out.append(prev)
            prev = s
    if prev is not None:
        out.append(prev)
    return out


def _ref_learn(texts, num_merges):
    vocab = {
        tuple(list(w) + [END_OF_WORD]): n for w, n in _ref_word_freq(texts).items()
    }
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # (freq desc, pair asc) — the same total order the engine uses
        (a, b), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((a, b, freq))
        vocab = {
            tuple(_ref_merge_word(list(s), a, b)): n for s, n in vocab.items()
        }
    return merges


def _ref_segment(text, merges):
    words = [w for w in re.split(r"\s+", (text or "").strip().lower()) if w]
    total = 0
    for w in words:
        syms = list(w) + [END_OF_WORD]
        for a, b, _ in merges:
            syms = _ref_merge_word(syms, a, b)
        total += len(syms)
    return len(words), total


TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "a mat a cat a hat",
    "hats and mats and cats",
    "",
    "the the the the",
]


def test_merge_table_matches_reference(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )
    got = learn_bpe_merges(df, num_merges=12)
    want = _ref_learn(TEXTS, 12)
    assert got == want
    # the first merge on this corpus must involve the end-of-word
    # marker of the hottest suffix (sanity that weighting by word
    # count, not word distinctness, is in effect)
    assert got[0][2] == max(m[2] for m in got)


def test_word_frequency_weights_counts(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x x x y"), Row(doc_id=1, text="y")])
    got = {r.word: r["count"] for r in word_frequency_table(df).collect()}
    assert got == {"x": 3, "y": 2}


def test_apply_bpe_matches_reference_segmentation(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )
    merges = learn_bpe_merges(df, num_merges=8)
    out = {r.doc_id: r for r in apply_bpe(df, merges).collect()}
    for i, t in enumerate(TEXTS):
        n_words, n_tokens = _ref_segment(t, merges)
        assert (out[i].n_words, out[i].n_tokens) == (n_words, n_tokens), t
    # more merges can only shrink (or hold) the token count
    fewer = {r.doc_id: r.n_tokens for r in apply_bpe(df, merges[:2]).collect()}
    assert all(out[i].n_tokens <= fewer[i] for i in fewer)


def test_overlapping_merge_is_greedy_left_to_right(spark):
    # merge (a,a) over "aaaa" must give [aa, aa, ▁]; over "aaa" → [aa, a, ▁]
    df = spark.createDataFrame([Row(doc_id=0, text="aaaa aaa")])
    merges = [("a", "a", 0)]
    out = apply_bpe(df, merges).collect()[0]
    # aaaa -> aa aa ▁ (3 symbols), aaa -> aa a ▁ (3 symbols)
    assert out.n_words == 2 and out.n_tokens == 6


def test_apply_bpe_string_path_property(spark):
    """Property-style: random word corpora (incl. repeated chars that
    stress greedy overlap, and multi-char merged symbols) — the
    string-replace apply path must match the pure-Python fold for
    every doc."""
    import random

    rng = random.Random(1234)
    alpha = "abc"
    docs = []
    for _ in range(40):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 7)))
            for _ in range(rng.randrange(0, 9))
        ]
        docs.append(" ".join(words))
    docs.append("")          # empty doc
    docs.append("   ")       # whitespace-only
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    merges = learn_bpe_merges(df, num_merges=6)
    assert merges  # the tiny alphabet guarantees frequent pairs
    got = {r.doc_id: (r.n_words, r.n_tokens) for r in apply_bpe(df, merges).collect()}
    for i, t in enumerate(docs):
        assert got[i] == _ref_segment(t, merges), (i, t, merges)

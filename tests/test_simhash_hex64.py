"""simhash_hex64 — the 64-bit hex SimHash carrier that feeds
operators/hamming_index for text (queries_r9.dedup_simhash_index):
format contract, half-independence, edit locality, narrow plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kafkaconnect_spark.operators.dedup import simhash, simhash_hex64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hex_format_and_first_half_matches_simhash32(spark):
    df = _docs(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "one"), (3, None)],
    )
    got = {r.doc_id: r.simhash_hex for r in simhash_hex64(df).collect()}
    # NULL text drops (same as simhash); values are 16 lowercase nibbles
    assert set(got) == {1, 2}
    assert all(re.fullmatch(r"[0-9a-f]{16}", v) for v in got.values())
    # the hi half IS the existing 32-bit simhash (same salt/derivation),
    # so the hex carrier inherits its tested semantics
    sim32 = {r.doc_id: r.simhash for r in simhash(df, bits=32).collect()}
    for doc_id, hexv in got.items():
        assert int(hexv[:8], 16) == sim32[doc_id]


def test_edit_locality_is_deterministic(spark):
    # the md5-derived pipeline is fully deterministic, so distances
    # are pinned exactly: identical text → 0; one added token over a
    # REPEATED small vocab moves the zero-sum bits (12 here — small
    # docs are simhash's weak spot, why dedup_simhash_index verifies
    # with an exact hamming bound instead of trusting the sketch);
    # an unrelated doc lands near the 32-bit random expectation
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    df = _docs(
        spark, [(1, base), (2, base), (3, base + " lambda"), (4, "x y z")]
    )
    got = {r.doc_id: r.simhash_hex for r in simhash_hex64(df).collect()}

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert ham(got[1], got[2]) == 0
    assert ham(got[1], got[3]) == 12
    assert ham(got[1], got[4]) == 34


def test_plan_is_codegen_agg_with_mapside_combine(spark):
    """r10: the fully-narrow aggregate/zip_with formulation evaluated
    INTERPRETED (HigherOrderFunction.eval, ~30-50 ms/doc); the plan is
    now explode → codegen md5/conv → ONE partial-aggregated groupBy
    (shuffle carries one 64-column row per doc, not tokens). Pin that:
    no higher-order functions anywhere, exactly one exchange, and a
    partial aggregate below it."""
    df = _docs(spark, [(1, "a b c")])
    plan = simhash_hex64(df)._jdf.queryExecution().executedPlan().toString()
    assert "zip_with" not in plan and "aggregate(" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_null_and_blank_text_is_filtered(spark):
    """r9 ADVICE #3: blank/whitespace-only docs would all collapse to
    the identical fingerprint (token stream = ['']) and dedup against
    each other as hamming-0 near-dups — they are filtered instead,
    like NULLs."""
    df = spark.createDataFrame(
        [(1, "real text content"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in simhash_hex64(df).collect()}
    assert got == {1}

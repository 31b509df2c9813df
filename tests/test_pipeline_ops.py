"""Edge semantics of the training-data pipeline operators
(operators/pipeline.py) — the oracle gate covers bulk correctness;
these pin the boundary behaviors the oracles can't isolate."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafkaconnect_spark.operators import pipeline


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_chunking_windows_and_tail(spark):
    # 100 tokens, window 64 stride 48 → chunks at 0 (64 toks), 48 (52
    # toks), 96 (4 toks): every token covered, overlap = 16
    text = " ".join(f"w{i}" for i in range(100))
    out = pipeline.chunk_documents(
        _docs(spark, [(1, text)]), window=64, stride=48
    ).collect()
    got = {(r.chunk_idx, r.n_chunk_tokens) for r in out}
    assert got == {(0, 64), (1, 52), (2, 4)}


def test_chunking_short_doc_single_chunk(spark):
    out = pipeline.chunk_documents(
        _docs(spark, [(1, "a b c")]), window=64, stride=48
    ).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 3
    # empty/whitespace docs produce no chunks
    assert (
        pipeline.chunk_documents(_docs(spark, [(2, "   ")]),
                                 window=64, stride=48).count() == 0
    )


def test_split_is_stable_under_growth(spark):
    # appending rows never moves existing keys between splits
    small = pipeline.split_assign(_docs(spark, [(i, "x") for i in range(50)]), "doc_id")
    big = pipeline.split_assign(_docs(spark, [(i, "x") for i in range(200)]), "doc_id")
    s = {r.doc_id: r.split for r in small.collect()}
    b = {r.doc_id: r.split for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())
    assert set(b.values()) == {"train", "valid", "test"}


def test_contamination_bounds_and_short_docs(spark):
    shared = " ".join(f"t{i}" for i in range(8))  # one exact 8-gram
    train = _docs(spark, [(1, shared + " trainonly1 trainonly2")])
    test = _docs(
        spark,
        [
            (10, shared),            # fully contaminated (its only shingle)
            (11, " ".join(f"u{i}" for i in range(12))),  # clean
            (12, "too short"),       # < 8 tokens → excluded entirely
        ],
    )
    out = {r.doc_id: r for r in pipeline.ngram_contamination(train, test).collect()}
    assert out[10].n_contaminated == out[10].n_shingles == 1
    assert out[10].contamination == 1.0
    assert out[11].n_contaminated == 0 and out[11].contamination == 0.0
    assert 12 not in out


def test_redaction_order_email_before_phone(spark):
    # the email's digit run must not be half-eaten by the phone regex
    df = spark.createDataFrame(
        [Row(s="mail me at a123-456-7890b@x.co or +1-555-0042")]
    )
    red = df.select(pipeline.redact_pii(F.col("s")).alias("r")).first().r
    assert red == "mail me at [EMAIL] or [PHONE]"
    e, p = pipeline.pii_counts(F.col("s"))
    row = df.select(e.alias("e"), p.alias("p")).first()
    assert (row.e, row.p) == (1, 1)


def test_centroid_exact_mean(spark):
    df = spark.createDataFrame(
        [Row(label=1, embedding=[1.0, 2.0]), Row(label=1, embedding=[3.0, 6.0])]
    )
    out = {(r.label, r.dim): r.centroid for r in pipeline.embedding_centroids(df).collect()}
    assert out == {(1, 0): 2.0, (1, 1): 4.0}


def test_gopher_stats_repetition_and_edges(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b a b"),            # one 2-gram dominates
            Row(doc_id=2, text="all distinct words here now"),
            Row(doc_id=3, text=""),                            # empty → zeros
            Row(doc_id=4, text="x\ny\nx\ny"),                  # duplicate lines
            Row(doc_id=5, text="#### ... #### words"),         # symbol soup
        ]
    )
    out = {r.doc_id: r for r in pipeline.gopher_repetition_stats(df).collect()}
    # "a b" appears 4× among 7 2-grams
    assert out[1].top_2gram_frac == 4 / 7 and not out[1].keep
    assert out[2].top_2gram_frac == 1 / 4
    assert out[3].word_count == 0 and out[3].mean_word_len == 0.0
    assert out[4].dup_line_frac == 0.5
    assert out[5].symbol_word_ratio > 0.1 and not out[5].keep


def test_balance_sources_thresholds(spark):
    rows = [Row(doc_id=i, source="big") for i in range(100)] + [
        Row(doc_id=100 + i, source="small") for i in range(10)
    ]
    out = pipeline.balance_sources(spark.createDataFrame(rows)).collect()
    by_src = {"big": 0, "small": 0}
    for r in out:
        by_src[r.source] += 1
    # every small-source doc survives (threshold = 1e6); big is ~10%
    assert by_src["small"] == 10
    assert 0 < by_src["big"] < 40


def test_shard_assignment_positions(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    out = pipeline.shard_assignment(df, shards=8).collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    for shard in range(8):
        poss = sorted(r.pos for r in out if r.shard_id == shard)
        assert poss == list(range(1, len(poss) + 1))


def test_bloom_contamination_superset_of_exact(spark):
    rng_docs = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(40)]
    shared = " ".join(f"s{j}" for j in range(10))
    train = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rng_docs[:20]] + [Row(doc_id=99, text=shared)]
    )
    test = spark.createDataFrame(
        [Row(doc_id=200, text=shared),                     # fully contaminated
         Row(doc_id=201, text=" ".join(f"z{j}" for j in range(12)))]  # clean
    )
    exact = {r.doc_id: r for r in pipeline.ngram_contamination(train, test).collect()}
    bloom = {r.doc_id: r for r in pipeline.bloom_contamination(train, test).collect()}
    assert bloom.keys() == exact.keys()
    for d in exact:
        # no false negatives: bloom flags at least everything exact found
        assert bloom[d].n_flagged >= exact[d].n_contaminated
        assert bloom[d].n_shingles == exact[d].n_shingles
    assert bloom[200].contamination == 1.0
    # FP budget: the clean doc has 5 shingles; with m=2^20, k=3 and a
    # tiny train set, expected FPs ~ 0
    assert bloom[201].n_flagged == 0


def test_gopher_stats_property_vs_python_reference(spark):
    """Third-implementation check: the per-row fold must agree with a
    plain-Python reference on random ASCII corpora (the DuckDB oracle
    is the second). Exact float equality — both sides run the same
    IEEE int/int divisions in the same order."""
    import re
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = "ab #.\n" + "xy9"

    def ref(text: str):
        # SQL trim strips SPACES only (Spark and DuckDB agree) — not \n
        t = text.strip(" ")
        toks = re.split(r"\s+", t) if t else []
        wc = len(toks)
        mean = sum(len(x) for x in toks) / wc if wc else 0.0
        n_hash = text.count("#")
        n_ell = (len(text) - len(text.replace("...", ""))) / 3
        sym = (n_hash + n_ell) / wc if wc else 0.0
        lines = text.split("\n")
        dup = 1.0 - len(set(lines)) / len(lines)
        grams = [f"{toks[i]} {toks[i+1]}" for i in range(wc - 1)]
        top = max(Counter(grams).values()) / len(grams) if grams else 0.0
        return (wc, mean, sym, dup, top)

    @given(texts=st.lists(st.text(alphabet=alphabet, max_size=60), min_size=1, max_size=25))
    @settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def run(texts):
        df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        got = {
            r.doc_id: (r.word_count, r.mean_word_len, r.symbol_word_ratio,
                       r.dup_line_frac, r.top_2gram_frac)
            for r in pipeline.gopher_repetition_stats(df).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == ref(t), (repr(t), got[i], ref(t))

    run()


def test_token_entropy_edges(spark):
    rows = [
        (1, "a a a a"),        # one distinct token → entropy 0, norm 0
        (2, "a b a b"),        # uniform 2-token dist → entropy 1 bit
        (3, "   "),            # whitespace-only → 0 tokens
        (4, "x"),              # single token
    ]
    out = {r.doc_id: r for r in pipeline.token_entropy(_docs(spark, rows)).collect()}
    assert (out[1].n_tokens, out[1].n_distinct) == (4, 1)
    assert out[1].entropy == 0.0 and out[1].norm_entropy == 0.0
    assert out[2].entropy == 1.0 and out[2].norm_entropy == 1.0
    assert (out[3].n_tokens, out[3].n_distinct, out[3].entropy) == (0, 0, 0.0)
    assert (out[4].n_tokens, out[4].n_distinct, out[4].entropy) == (1, 1, 0.0)


def test_quantize_int8_zero_vector_and_range(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 0.0]),         # zero vector: eps scale, q=0
         Row(vec_id=2, embedding=[1.0, -1.0, 0.5])],  # max|v|=1 → q = ±127, 64
    )
    out = {r.vec_id: r for r in pipeline.quantize_int8(df).collect()}
    assert (out[1].q_min, out[1].q_max, out[1].recon_mae) == (0, 0, 0.0)
    assert (out[2].q_min, out[2].q_max) == (-127, 127)
    # reconstruction of the extreme components is exact (q*scale = ±1);
    # the 0.5 component carries the full half-step error (~0.004)
    assert out[2].recon_mae < 2e-3


def test_random_projection_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i + d) for d in range(8)]) for i in range(3)]
    )
    a = pipeline.random_projection(df, out_dims=4, dim=8).collect()
    b = pipeline.random_projection(df, out_dims=4, dim=8).collect()
    assert len(a) == 12  # 3 vectors × 4 output dims
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # fully deterministic
    # sign matrix is ±1 only → |y_j| ≤ sum|v| / sqrt(k)
    import math
    for r in a:
        bound = sum(abs(float(r.vec_id + d)) for d in range(8)) / math.sqrt(4) + 1e-9
        assert abs(r.value) <= bound


def test_quantize_and_projection_exclude_degenerate_vectors(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()),
         T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, []), (3, None), (4, [1.0, 2.0, 3.0])], schema
    )
    assert {r.vec_id for r in pipeline.quantize_int8(df).collect()} == {1, 4}
    # projection keeps only exact-length vectors (no NULL-padded zip_with)
    out = pipeline.random_projection(df, out_dims=2, dim=2).collect()
    assert {r.vec_id for r in out} == {1}
    assert all(r.value is not None for r in out)


def test_pack_sequences_rows_frame_with_tied_order_values(spark):
    # three docs in one stream, first two tied on order_col: the ROWS
    # frame must advance the running sum one doc at a time, so some doc
    # starts at offset 0 and bins stay physically packable (the default
    # RANGE frame gave every peer the same inclusive sum)
    df = spark.createDataFrame(
        [(1, "en", " ".join(["w"] * 10)),
         (1, "en", " ".join(["w"] * 20)),
         (2, "en", " ".join(["w"] * 5))],
        "ord int, lang string, text string",
    )
    out = pipeline.pack_sequences(df, part_col="lang", order_col="ord", budget=16).collect()
    bins = {r.bin_id: r.n_tokens for r in out}
    assert min(bins) == 0  # something starts in bin 0
    assert sum(bins.values()) == 35


def test_scd2_null_op_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from kafkaconnect_spark.operators.scd import scd2_history

    df = spark.createDataFrame(
        [(1, 10, 1, "c", "a"), (1, 20, 2, None, "b")],
        "key int, ts long, change_id int, op string, payload string",
    )
    with pytest.raises(Exception) as ei:
        scd2_history(df).collect()
    assert "invalid op" in str(ei.value)


def test_reservoir_sample_fixed_size_and_deterministic(spark):
    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(100)] + [
        Row(doc_id=1000, source="tiny")  # group smaller than k
    ]
    df = spark.createDataFrame(rows)
    a = pipeline.reservoir_sample(df, group_col="source", k=10).collect()
    b = pipeline.reservoir_sample(df, group_col="source", k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    by_src = {}
    for r in a:
        by_src.setdefault(r.source, []).append(r.sample_rank)
    # exactly min(k, |group|) per group, ranks dense from 1
    assert sorted(by_src["tiny"]) == [1]
    for s in ("s0", "s1", "s2"):
        assert sorted(by_src[s]) == list(range(1, 11))


def test_temperature_weights_sum_to_one_and_upsample_tail(spark):
    rows = [Row(doc_id=i, source="big") for i in range(90)] + [
        Row(doc_id=100 + i, source="small") for i in range(10)
    ]
    out = {r.source: r for r in pipeline.temperature_weights(
        spark.createDataFrame(rows), alpha=0.5
    ).collect()}
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-6
    # alpha=0.5 upsamples the tail: small's weight share (0.25) beats
    # its count share (0.10)
    assert out["small"].weight > 0.10
    assert abs(out["small"].weight - (10 ** 0.5) / (90 ** 0.5 + 10 ** 0.5)) < 1e-5
    assert abs(out["big"].expected_docs + out["small"].expected_docs - 100) < 1e-2


def test_temperature_alpha_extremes(spark):
    rows = [Row(doc_id=i, source="a") for i in range(80)] + [
        Row(doc_id=100 + i, source="b") for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    prop = {r.source: r.weight for r in pipeline.temperature_weights(df, alpha=1.0).collect()}
    assert abs(prop["a"] - 0.8) < 1e-6  # alpha=1 → proportional
    uni = {r.source: r.weight for r in pipeline.temperature_weights(df, alpha=0.0).collect()}
    assert abs(uni["a"] - 0.5) < 1e-6  # alpha=0 → uniform


def test_bigram_topk_counts_and_tiebreak(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b c"),      # "a b"×2, "b a"×1, "b c"×1
            (2, "a b"),            # "a b"×1
            (3, "solo"),           # 1 token → no bigrams
            (4, "   "),            # whitespace-only → no bigrams
            (5, None),             # NULL → no bigrams
        ],
    )
    out = pipeline.bigram_topk(df, k=10).collect()
    got = [(r.bigram, r.freq) for r in out]
    # (freq desc, bigram asc) total order
    assert got == [("a b", 3), ("b a", 1), ("b c", 1)]
    # k truncates at the deterministic boundary
    top2 = [(r.bigram, r.freq) for r in pipeline.bigram_topk(df, k=2).collect()]
    assert top2 == [("a b", 3), ("b a", 1)]


def test_norm_outliers_flags_extremes_only(spark):
    # 20 unit-norm vectors + one zero vector + one huge vector:
    # the Tukey fence from the quartiles flags exactly the two extremes
    rows = [Row(vec_id=i, embedding=[1.0, 0.0]) for i in range(20)]
    rows.append(Row(vec_id=100, embedding=[0.0, 0.0]))
    rows.append(Row(vec_id=101, embedding=[100.0, 0.0]))
    out = {r.vec_id: r for r in pipeline.norm_outliers(
        spark.createDataFrame(rows)
    ).collect()}
    assert len(out) == 22
    flagged = {k for k, r in out.items() if r.is_outlier}
    assert flagged == {100, 101}
    assert abs(out[0].norm - 1.0) < 1e-9
    # empty vectors are excluded, not flagged
    with_empty = spark.createDataFrame(
        rows + [Row(vec_id=200, embedding=[])]
    )
    assert 200 not in {
        r.vec_id for r in pipeline.norm_outliers(with_empty).collect()
    }


def test_bigram_lm_score_exact_hand_computed(spark):
    import math

    # corpus: "a b" x3, "a c" x1, "solo" → B(a,b)=3, B(a,c)=1,
    # U(a)=4, V=4 (a, b, c, solo) ⇒ P(b|a)=4/8, P(c|a)=2/8
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "solo"), (6, None)])
    out = {r.doc_id: r for r in pipeline.bigram_lm_score(df).collect()}
    p_ab = (3 + 1) / (4 + 4)
    p_ac = (1 + 1) / (4 + 4)
    # engine emits the raw decimal-sum/count division (no final round)
    want_ab = -round(math.log2(p_ab), 7)
    want_ac = -round(math.log2(p_ac), 7)
    for i in (1, 2, 3):
        assert out[i].n_bigrams == 1 and abs(out[i].bits_per_bigram - want_ab) < 1e-9
    assert out[4].n_bigrams == 1 and abs(out[4].bits_per_bigram - want_ac) < 1e-9
    # rarer continuation costs more bits
    assert out[4].bits_per_bigram > out[1].bits_per_bigram
    # short/empty docs report zero bigrams, zero bits
    assert (out[5].n_bigrams, out[5].bits_per_bigram) == (0, 0.0)
    assert (out[6].n_bigrams, out[6].bits_per_bigram) == (0, 0.0)


def test_orders_profile_approx_matches_exact_within_rsd(spark):
    """The approx (HLL++) profile variant — the documented 100 TB
    path — must agree with the exact profile on everything except
    n_distinct, and stay within ~5 sigma of the 2% rsd there."""
    from kafkaconnect_spark.queries import orders_profile, orders_profile_approx

    sf = "/root/testdata/sf0.001"
    exact = {r.column_name: r for r in orders_profile(spark, sf).collect()}
    approx = {r.column_name: r for r in orders_profile_approx(spark, sf).collect()}
    assert exact.keys() == approx.keys()
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_nulls, a.min_str, a.max_str, a.null_frac) == (
            e.n_rows, e.n_nulls, e.min_str, e.max_str, e.null_frac
        )
        assert abs(a.n_distinct - e.n_distinct) <= max(1, 0.1 * e.n_distinct)
    # the scale win is structural: no Expand (the 5x row multiplier a
    # multi-countDistinct aggregate compiles to) in EITHER plan since
    # the r4 exact rework (per-column two-phase distinct pipelines)
    for fn in (orders_profile_approx, orders_profile):
        p = fn(spark, sf)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Expand" not in p, p


def test_tfidf_pairs_hand_computed(spark):
    """Two identical-term docs -> cosine exactly 1.0; df=1 terms
    pruned so the third doc pairs with nothing."""
    from kafkaconnect_spark.operators.similarity import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple banana"), (3, "cherry durian")],
        "doc_id LONG, text STRING",
    )
    got = [(r.id_a, r.id_b, r.cosine) for r in tfidf_cosine_pairs(df).collect()]
    assert got == [(1, 2, 1.0)]


def test_mixture_epoch_schedule_invariants(spark):
    from kafkaconnect_spark.queries_r3 import mixture_epoch_schedule

    rows = mixture_epoch_schedule(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0 < r.epochs <= 4.0
        assert abs(r.planned_tokens - round(r.epochs * r.n_tokens, 2)) < 1e-6
        # the cap binds exactly when the uncapped target exceeds 4 epochs
        assert r.planned_tokens <= 4.0 * r.n_tokens + 1e-6

"""Physical-plan regression guards: the properties that make these
queries scale must stay in the plan — pushdown reaching the scan,
column pruning, dims broadcast, codegen in the hot path."""

from __future__ import annotations

import pytest

from kafkaconnect_spark.queries import QUERY_CATALOG

SF = "/root/testdata/sf0.001"


def plan(spark, name, mode="formatted"):
    df = QUERY_CATALOG[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q1_filter_pushdown_and_pruning(spark):
    p = plan(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p  # predicate reaches the scan
    # projection pruned: orderkey/partkey/suppkey never read
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read
    # the hot path is JVM-side: no row- or Arrow-batched Python eval
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_q3_broadcasts_the_filtered_dim(spark):
    p = plan(spark, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in p
    assert "EqualTo(c_mktsegment,BUILDING)" in p  # filter pushed into dim scan
    # top-10 is TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in p


def test_q5_dims_never_shuffle(spark):
    p = plan(spark, "q5_supplier_volume")
    assert p.count("BroadcastExchange") >= 3  # supplier, nation, region
    assert "GreaterThanOrEqual(o_orderdate" in p  # date filter pushed


def test_anti_join_is_a_real_anti_join(spark):
    p = plan(spark, "customers_without_orders")
    assert "LeftAnti" in p


def test_minhash_reuses_persisted_shingles(spark):
    p = plan(spark, "dedup_minhash_lsh", mode="simple")
    assert "InMemoryTableScan" in p  # the shingle index is reused, not recomputed


def test_lsh_weights_are_literals_not_hashes(spark):
    p = plan(spark, "similarity_ann_lsh", mode="simple")
    assert "md5" not in p  # hyperplane weights folded driver-side


def test_q6_is_scan_filter_agg_only(spark):
    p = plan(spark, "q6_forecast_revenue")
    # every predicate reaches the parquet scan
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "GreaterThanOrEqual(l_discount" in p and "LessThan(l_quantity" in p
    # 4-column projection, no join, no Python in the path
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_returnflag" not in read
    assert "Join" not in p and "BatchEvalPython" not in p


def test_q4_exists_is_a_semi_join(spark):
    p = plan(spark, "q4_priority_late_ship")
    assert "LeftSemi" in p
    # lineitem side pruned to the two columns the semi-join needs
    reads = [l for l in p.splitlines() if "ReadSchema" in l]
    assert any("l_orderkey" in r and "l_extendedprice" not in r for r in reads)


def test_q16_not_in_is_a_broadcast_anti_join(spark):
    p = plan(spark, "q16_part_supplier_counts")
    assert "LeftAnti" in p and "BroadcastExchange" in p


def test_q19_disjunction_keeps_hash_join(spark):
    # Catalyst must extract the common l_partkey equi-key; the OR
    # bands stay as a residual filter, not a nested-loop join
    p = plan(spark, "q19_banded_revenue")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q9_star_join_broadcasts_dims(spark):
    # part/supplier/nation broadcast; the only shuffle join is
    # lineitem x orders on orderkey
    p = plan(spark, "q9_product_profit")
    assert p.count("BroadcastHashJoin") >= 3
    # p_name filter reaches the part scan
    assert "StringContains(p_name,widget)" in p


def test_cube_is_single_pass(spark):
    # CUBE must expand map-side (Expand node), not union N aggregates
    p = plan(spark, "orders_cube_status_segment")
    assert "Expand" in p
    # one scan per table (location line appears once per scan node)
    assert p.count("orders.parquet") == 1 and p.count("customer.parquet") == 1


def test_q15_has_no_global_window(spark):
    # rank() over a partitionless window funnels one row per supplier
    # (SF x 10k) through a single task; the scalar-max broadcast join
    # keeps every stage distributed
    p = plan(spark, "q15_top_supplier")
    assert "Window" not in p
    assert "BroadcastExchange" in p


def test_q18_having_filter_precedes_join(spark):
    p = plan(spark, "q18_large_volume_customers", mode="simple")
    # the >300 filter applies to the agg output before the orders join
    assert "Filter (isnotnull(sum_qty" in p or "(sum_qty#" in p.split("Join")[-1]


def test_pipeline_split_is_single_scan_no_join(spark):
    p = plan(spark, "split_train_valid_test", mode="simple")
    assert "Join" not in p and p.count("Exchange") <= 2  # partial agg + final
    # pruning: only the three needed columns are read
    fp = plan(spark, "split_train_valid_test")
    read = next(l for l in fp.splitlines() if "ReadSchema" in l)
    assert "lang" not in read and "source" not in read


def test_pack_sequences_partitions_by_stream_not_global(spark):
    p = plan(spark, "docs_pack_sequences")
    # the window must partition by lang — a global (empty-key) window
    # would serialize the whole corpus through one task at scale
    assert "Window" in p
    # the partition spec appears as "..., [lang#N], [doc_id#N ASC ..."
    import re

    assert re.search(r"windowspecdefinition\(lang#\d+", p), p


def test_q20_is_all_broadcast_semi_joins(spark):
    p = plan(spark, "q20_excess_suppliers", mode="simple")
    assert "SortMergeJoin" not in p  # every probe side joins a small set
    assert p.count("LeftSemi") >= 3


def test_decontamination_joins_on_hash_not_text(spark):
    p = plan(spark, "decontaminate_test_split", mode="simple")
    # the contamination join key is the 64-bit shingle hash, never the
    # shingle string (shuffle row width at 100 TB)
    import re
    join_lines = [l for l in p.splitlines() if "Join" in l and "sh_hash" in l]
    assert join_lines, p


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key -> the join runs
    exchange-free (the storage layout IS the shuffle)."""
    from kafkaconnect_spark.operators.bucketing import bucketed_join, write_bucketed

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(f"{SF}/orders.parquet").selectExpr(
        "o_orderkey AS l_orderkey", "o_totalprice"
    )
    write_bucketed(li, "bt_lineitem", ["l_orderkey"], 4, path=str(tmp_path / "li"))
    write_bucketed(od, "bt_orders", ["l_orderkey"], 4, path=str(tmp_path / "od"))
    # at sf0.001 both sides fit the broadcast threshold, which hides
    # the bucketing; disable it to see the 100 TB plan (where neither
    # side of a fact-fact join broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bt_lineitem", "bt_orders", ["l_orderkey"])
        p = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p
        # and the result is still correct
        plain = li.join(od, "l_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_new_pipeline_ops_plan_shapes(spark):
    from kafkaconnect_spark.operators import pipeline

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # Gopher metrics: fully narrow — quality filtering at scan speed
    p = pipeline.gopher_repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p

    # shard assignment: exactly one hash exchange (the shard routing)
    p = pipeline.shard_assignment(docs)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p

    # source balancing: the corpus side joins the tiny per-source rate
    # table via broadcast — no shuffle of the documents scan
    p = pipeline.balance_sources(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p


def test_embedding_and_entropy_ops_are_narrow(spark):
    from kafkaconnect_spark.operators import pipeline

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # int8 quantization: per-row folds only — no shuffle, no Python eval
    p = pipeline.quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    # random projection: sign matrix folded into literals — no join,
    # no shuffle, no md5 in the plan (signs precomputed driver-side)
    p = pipeline.random_projection(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "Join" not in p, p
    assert "md5" not in p, p

    # token entropy: narrow map at scan speed
    p = pipeline.token_entropy(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_ivf_probe_join_is_broadcast(spark):
    # the probe side (queries × n_probe rows) must broadcast: a shuffle
    # join on "cell" would repartition the whole corpus into n_cells
    # reducer partitions
    p = plan(spark, "similarity_ivf", mode="simple")
    assert "BroadcastHashJoin" in p, p


def test_semdedup_joins_on_cell_no_cartesian(spark):
    # within-cell prune must be an equi-join on the cell id — an
    # all-pairs product would be quadratic in corpus size
    p = plan(spark, "similarity_semdedup", mode="simple")
    assert "CartesianProduct" not in p, p
    assert "cell" in p
    # cell assignment is folded literals, narrow — no Python eval
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_span_dup_single_pass_over_persisted_spans(spark):
    # the md5-window explode runs once (persisted + reused for the
    # df-count join), the join is keyed on the window hash — never a
    # doc×doc product — and both per-doc counts come from one groupBy
    p = plan(spark, "dedup_span_frac", mode="simple")
    assert "CartesianProduct" not in p, p
    # both consumers (df-count build side + per-doc probe side) read
    # the cache — the md5 explode is never recomputed from the scan
    assert p.count("InMemoryTableScan") >= 2, p


def test_containment_candidates_carry_hot_shingle_cap(spark):
    # when a shingle exceeds max_doc_freq the candidate join must
    # carry the broadcast anti-join prune; when none does, the
    # control-plane probe elides the correction machinery entirely
    from kafkaconnect_spark.operators import dedup
    from kafkaconnect_spark.queries import _t

    docs = _t(spark, SF, "documents")
    forced = dedup.containment_pairs(docs, threshold=0.4, max_doc_freq=1)
    fp = forced._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "LeftAnti" in fp, fp
    # gate-default path (cap 10k, no hot shingles at this SF): no
    # anti-join, no correction joins, no cartesian
    p = plan(spark, "dedup_containment", mode="simple")
    assert "LeftAnti" not in p, p
    assert "CartesianProduct" not in p, p


def test_temperature_weights_denominator_broadcasts(spark):
    # the 1-row global denominator joins via broadcast nested loop —
    # never a shuffled exchange of the per-source aggregates
    p = plan(spark, "sampling_temperature", mode="simple")
    assert "BroadcastNestedLoopJoin" in p, p


def test_bigram_topk_is_takeordered_jvm_only(spark):
    # top-k is a TakeOrdered (driver holds k rows), never a global
    # sort; the bigram build is JVM-side (no Python eval)
    p = plan(spark, "docs_bigram_topk")
    assert "TakeOrderedAndProject" in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_norm_outliers_fence_broadcasts(spark):
    # the 1-row fence joins via broadcast nested loop — the norms are
    # never shuffled against the percentile aggregate
    p = plan(spark, "embedding_norm_outliers", mode="simple")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_zscore_stats_broadcast_back(spark):
    # per-type moments are a few rows — they broadcast onto events,
    # never a shuffled sort-merge join of the full stream
    p = plan(spark, "events_anomaly_zscore", mode="simple")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_sliding_window_no_python_no_cartesian(spark):
    # the x4 window expansion happens inside the JVM window operator
    # with map-side partial aggregation — no explode-join, no Python
    p = plan(spark, "events_sliding_window")
    assert "partial_count" in p or "HashAggregate" in p, p
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_entity_resolution_blocked_equi_join(spark):
    # blocking must be an equi-join — never a cartesian pairwise
    # compare; levenshtein stays JVM-side
    p = plan(spark, "customers_entity_resolution")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the join key must include the name-derived blocking component:
    # (nation, segment) alone has fixed cardinality (125 blocks), so
    # block size — and pairwise volume, quadratically — would grow
    # with the corpus
    import re

    join_lines = [
        l for l in p.splitlines()
        if "Join" in l or "Keys" in l.replace("keys", "Keys")
    ]
    assert any(re.search(r"name_blk#\d+", l) for l in join_lines), p


def test_rfm_fence_broadcasts_no_global_window(spark):
    # quartiles come from a broadcast percentile fence, never a
    # global ntile window (single-task sort at scale)
    p = plan(spark, "customers_rfm_segments", mode="simple")
    assert "Window" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p


def test_copurchase_is_keyed_self_join(spark):
    p = plan(spark, "parts_copurchase_edges", mode="simple")
    assert "CartesianProduct" not in p, p
    # count reduces map-side before the exchange
    fp = plan(spark, "parts_copurchase_edges")
    assert "partial_count" in fp, fp


def test_windowed_topk_rank_is_window_keyed(spark):
    # the rank partitions by window — a global rank would serialize
    # every (window, type) row through one task
    import re

    p = plan(spark, "events_windowed_topk")
    assert re.search(r"windowspecdefinition\(window_start#\d+", p), p


def test_latency_histogram_reduces_mapside(spark):
    p = plan(spark, "lineitem_latency_histogram")
    assert "partial_count" in p, p  # bins collapse before the exchange
    assert "CartesianProduct" not in p


def test_tfidf_pairs_posting_join_shapes(spark):
    # the posting-list self-join must be an equi-join on term (df caps
    # bound fan-out); the global doc count rides a broadcast 1-row
    # crossJoin; the weighted postings are persisted and reused for
    # norms and dots
    p = plan(spark, "docs_tfidf_pairs", mode="simple")
    assert "CartesianProduct" not in p, p
    assert "InMemoryTableScan" in p, p


def test_oov_vocab_join_is_broadcast(spark):
    # top-1000 vocab membership must be a broadcast join, never a
    # shuffled join of the full token explosion against the vocab
    p = plan(spark, "docs_oov_rate", mode="simple")
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p


def test_pq_codes_is_pure_map(spark):
    # codebooks are folded literals: no join, no aggregate exchange —
    # the only allowed exchange is the small-scan spread repartition
    p = plan(spark, "embedding_pq_codes", mode="simple")
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_shingle_novelty_reuses_persisted_shingles(spark):
    p = plan(spark, "docs_shingle_novelty", mode="simple")
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p


def test_erasure_audit_joins_are_broadcast(spark):
    p = plan(spark, "events_user_erasure_audit", mode="simple")
    assert "CartesianProduct" not in p, p
    assert "BroadcastExchange" in p, p


def test_r3_catalog_has_no_cartesian_or_row_python(spark):
    """Blanket guard over every round-3 query: no CartesianProduct
    (the 1-row global-scalar crossJoins compile to BroadcastNestedLoop
    with a single-row side — allowed, documented) and no row-at-a-time
    Python in any plan."""
    from kafkaconnect_spark.queries_r3 import R3_CATALOG

    for name in R3_CATALOG:
        p = plan(spark, name, mode="simple")
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name


def test_r3b_catalog_has_no_cartesian_or_row_python(spark):
    """Same blanket guard over the batch B-F queries (queries_r3b)."""
    from kafkaconnect_spark.queries_r3b import R3B_CATALOG

    for name in R3B_CATALOG:
        p = plan(spark, name, mode="simple")
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name


def test_r4_catalog_has_no_cartesian_or_row_python(spark):
    """Same blanket guard over the round-4 queries (queries_r4)."""
    from kafkaconnect_spark.queries_r4 import R4_CATALOG

    for name in R4_CATALOG:
        p = plan(spark, name, mode="simple")
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name


def test_tiled_catalog_queries_have_no_partitionless_window(spark):
    """The r4 rework's whole point, pinned at the CATALOG level (the
    helper-level property lives in test_prefix_scans.py): the three
    formerly-allow-listed cumulative queries plus the sweep-line
    query run with every windowspecdefinition carrying a partition
    column."""
    import re

    for name in (
        "docs_trigram_vocab_growth",
        "events_watermark_late_drop",
        "orders_open_backlog_monthly",
        "events_peak_concurrency",
    ):
        p = plan(spark, name)
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", p):
            assert not re.match(r"^\s*\w+#\d+ (ASC|DESC)", m.group(1)), name


def test_series_topk_multi_anchors_broadcast(spark):
    """Multi-anchor series search: anchors reach the distance join as
    a BroadcastExchange; the corpus side never sort-merge-joins."""
    p = plan(spark, "events_series_topk_multi")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_hard_negatives_anchor_broadcast_corpus_no_shuffle(spark):
    """The anchor set broadcasts; the corpus side reaches the join
    without an Exchange (only the per-anchor ranking shuffles)."""
    p = plan(spark, "embedding_hard_negatives")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # exactly one shuffle exchange: the rank window on query_id
    import re

    shuffles = re.findall(r"Exchange hashpartitioning\(([^,]+)", p)
    assert all("query_id" in s for s in shuffles), shuffles


def test_cms_counter_groupby_is_mapside_combined(spark):
    """The CMS counter build must show a partial_count before its
    exchange — the bounded-cardinality map-side combine that keeps the
    shuffle constant-size."""
    p = plan(spark, "events_cms_error_audit")
    assert "partial_count" in p


def test_rolling_revenue_filter_pushed_and_pruned(spark):
    p = plan(spark, "lineitem_rolling_7day_revenue")
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    for absent in ("l_orderkey", "l_partkey", "l_returnflag"):
        assert absent not in read
    assert "l_suppkey" in p.split("PushedFilters", 1)[1].splitlines()[0] or (
        "IsNotNull(l_suppkey)" in p
    )


def test_weighted_sample_never_reads_text(spark):
    """Length-proportional sampling works off n_chars — the text
    column must not be scanned."""
    p = plan(spark, "docs_weighted_sample")
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "text" not in read


def test_watermark_replay_block_table_broadcasts(spark):
    p = plan(spark, "events_watermark_late_drop")
    assert "BroadcastHashJoin" in p


def test_r5_catalog_has_no_cartesian_or_row_python(spark):
    """Blanket guard over the round-5 queries (queries_r5). The
    lifecycle query is excluded here — it executes eagerly (index
    writes) and is plan-pinned operator-level in test_lsh_index.py —
    and covered by tools/plan_audit.py's full-catalog sweep."""
    from kafkaconnect_spark.queries_r5 import R5_CATALOG

    for name in R5_CATALOG:
        if name == "dedup_lsh_index_lifecycle":
            continue
        p = plan(spark, name, mode="simple")
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name


def test_knn_and_sweep_queries_broadcast(spark):
    """The query side of every r5 ANN audit broadcasts; the corpus
    never shuffles to be scored."""
    for name in ("embedding_knn_label_agreement", "embedding_ivf_nprobe_sweep"):
        p = plan(spark, name, mode="simple")
        assert "BroadcastExchange" in p, name


def test_contamination_semi_join_shape(spark):
    """Test docs reach the train side via LeftSemi on the shingle key
    — no doc-payload join, no pair explosion."""
    p = plan(spark, "docs_contamination_ngram_overlap", mode="simple")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_gini_has_no_partitionless_window(spark):
    """The Gini query's whole point: the rank formula runs on the
    tiled prefix scan, never a global sort/window."""
    import re

    p = plan(spark, "events_user_activity_gini")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", p):
        assert not re.match(r"^\s*\w+#\d+ (ASC|DESC)", m.group(1))
    assert "CartesianProduct" not in p


def test_drift_snapshot_fence_is_broadcast(spark):
    """The v1-baseline and cutoff 1-row frames ride broadcast joins —
    the only join shapes in the query."""
    p = plan(spark, "dedup_drift_snapshots", mode="simple")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p

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

"""Extended TPC-H-shape analytics catalog.

The driver's star schema is a simplified TPC-H (no partsupp, no
commit/receipt dates, single-word p_type), so each classic query is
adapted to the available columns while keeping its *plan shape* — the
thing that matters at 100 TB: which side broadcasts, where the
shuffles land, whether predicates reach the scan.

Determinism rules match queries.py: money aggregations go per-row
round → DECIMAL sum (order-independent, exact at any parallelism) →
final cast to double; quantity sums/avgs stay in double because the
values are integral (exact under double addition in any order);
ratios divide two exactly-determined doubles. Every LIMIT is guarded
by a total tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # delegate to queries._t (lazy import — queries.py imports this
    # module at its bottom) so the temporal normalization applied to
    # ALL tables there (timestamp[ns]→µs, TIMESTAMP_NTZ cast) covers
    # this catalog too; a bare read would silently return BIGINT date
    # columns on a ns-encoded regeneration and filter every row out
    from kafkaconnect_spark.queries import _t as _queries_t

    return _queries_t(spark, sf_dir, name)


def _rev_dec():
    """Exact order-independent revenue term: round to the source's 4
    significant decimals, then accumulate in DECIMAL."""
    return F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
        T.DecimalType(22, 4)
    )


_REV_SQL = "round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(22,4)"


# ---------------------------------------------------------------------------
# Q6 — forecast revenue: pure scan → filter → single agg. The whole
# query should collapse to one parquet scan with every predicate
# pushed (verified by test_plan_shapes); at 100 TB this is the
# pattern where column pruning + predicate pushdown are the entire
# game — no shuffle beyond the final 1-row reduce.
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_rev = F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).cast(
        T.DecimalType(22, 4)
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(disc_rev).cast("double").alias("revenue"))
    )


Q6_ORACLE = """
SELECT sum(round(l_extendedprice * l_discount, 4)::DECIMAL(22,4))::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS → left-semi join. Spark plans
# this as a shuffled semi-join on o_orderkey; the lineitem side is
# projected to two columns before the shuffle.
# ---------------------------------------------------------------------------


def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (per priority) having at least one lineitem shipped
    >90 days after the order date (adaptation: the driver schema has
    no commit/receipt dates, so 'late' = shipdate lag)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        orders.join(li, (orders.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations: the double-role dimension
# (nation joined twice under different names). Both nation joins and
# the supplier join broadcast; only customer⋈orders⋈lineitem shuffle.
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nk"))
        .where(pair)
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
    )


Q7_ORACLE = f"""
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       sum({_REV_SQL})::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE ((n2.n_name = 'NATION_18' AND n1.n_name = 'NATION_19')
    OR (n2.n_name = 'NATION_19' AND n1.n_name = 'NATION_18'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 — market share: conditional-numerator ratio per year. One fact
# pipeline, two decimal sums, double division at the end.
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    n_cust = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    ).where(F.col("c_rk") == 1)
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit("0").cast(T.DecimalType(22, 4))
    nation_rev = F.when(F.col("supp_nation") == "NATION_1", _rev_dec()).otherwise(zero)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_rev).cast("double")
                / F.sum(_rev_dec()).cast("double")
            ).alias("mkt_share")
        )
    )


Q8_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       sum(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_SQL}
                ELSE 0::DECIMAL(22,4) END)::DOUBLE
       / sum({_REV_SQL})::DOUBLE AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD' AND n1.n_regionkey = 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q10 — returned items: 3-table join + top-20 by revenue. TakeOrdered
# on the already-aggregated (small) side; no global sort of the fact.
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       sum({_REV_SQL})::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 — important stock (partsupp-less adaptation): per-nation value
# vs a global-total scalar. The scalar is a 1-row broadcast cross
# join, not a driver-side collect.
# ---------------------------------------------------------------------------


def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    per_nation = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_dec()).alias("value_dec"))
    )
    # two consumers (the broadcast total and the main plan) — persist
    # so the lineitem scan+join+agg runs once, same pattern as q15
    from pyspark import StorageLevel

    per_nation = per_nation.persist(StorageLevel.MEMORY_AND_DISK)
    total = per_nation.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * 0.04
        )
        .select("n_name", F.col("value_dec").cast("double").alias("value"))
    )


Q11_ORACLE = f"""
WITH per_nation AS (
  SELECT n_name, sum({_REV_SQL}) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY 1)
SELECT n_name, value_dec::DOUBLE AS value
FROM per_nation
WHERE value_dec::DOUBLE > (SELECT sum(value_dec)::DOUBLE FROM per_nation) * 0.04
"""


# ---------------------------------------------------------------------------
# Q12 — shipping priority classes: join + conditional counts
# (linestatus stands in for shipmode).
# ---------------------------------------------------------------------------


def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join with an ON-side
# predicate, then a two-level aggregation (per-customer count →
# histogram). The second agg is tiny; the first shuffles on custkey.
# ---------------------------------------------------------------------------


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue: conditional ratio over a part join.
# ---------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _t(spark, sf_dir, "part")
    zero = F.lit("0").cast(T.DecimalType(22, 4))
    promo = F.when(F.col("p_type") == "PROMO", _rev_dec()).otherwise(zero)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_rev_dec()).cast("double")
            ).alias("promo_revenue")
        )
    )


Q14_ORACLE = f"""
SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                        ELSE 0::DECIMAL(22,4) END)::DOUBLE
       / sum({_REV_SQL})::DOUBLE AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: agg → scalar max → equality join back. NOT a
# global rank() window: that funnels one row per supplier (SF×10k —
# ~1B at the 100 TB SF) through a single partition. The scalar max is
# a distributed 1-row reduce, broadcast back as a join literal; the
# equality is tie-safe because rev_dec is exact DECIMAL (all tied
# suppliers match, identical to rank=1 semantics).
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier")
    from pyspark import StorageLevel

    # rev feeds both the scalar max and the join-back; persist so the
    # lineitem scan+agg runs once (the per-supplier rollup is tiny
    # relative to lineitem — SF×10k rows)
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev_dec()).alias("rev_dec"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    max_rev = rev.agg(F.max("rev_dec").alias("max_rev"))
    top = rev.join(F.broadcast(max_rev), rev.rev_dec == max_rev.max_rev)
    return top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
    )


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, sum({_REV_SQL}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1),
ranked AS (SELECT *, rank() OVER (ORDER BY rev_dec DESC) AS rk FROM rev)
SELECT s_suppkey, s_name, rev_dec::DOUBLE AS total_revenue
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Q16 — supplier-part relationship counts: distinct pair derivation
# (lineitem stands in for partsupp), NOT-IN as a broadcast anti-join,
# count(distinct) per group.
# ---------------------------------------------------------------------------


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 100).select(
        "s_suppkey"
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad_supp), ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue: per-part average as a re-joined agg
# (the correlated-subquery shape). quantity sums stay double — the
# values are integral, so the sums are exact in any order.
# ---------------------------------------------------------------------------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    ep = F.col("l_extendedprice").cast(T.DecimalType(18, 2))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.a_partkey)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(ep).cast("double") / 7.0).alias("avg_yearly"))
    )


Q17_ORACLE = """
SELECT sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (SELECT l_partkey AS a_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY 1) a ON l_partkey = a_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING over a fact agg, re-joined to
# orders/customer. The >300 filter shrinks the agg output to near
# nothing before any wide join — the join input is the small side.
# ---------------------------------------------------------------------------


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.b_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey AS b_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) b
  ON o_orderkey = b_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive join predicates: three OR'd brand/size/quantity
# bands over a part join. Catalyst extracts the common l_partkey
# equi-key so this stays a hash join (not a nested-loop) with the
# residual OR as a post-join filter.
# ---------------------------------------------------------------------------


def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bands = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(bands)
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
    )


Q19_ORACLE = f"""
SELECT sum({_REV_SQL})::DOUBLE AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: the EXISTS + NOT-EXISTS
# double-correlation, planned as semi-join then anti-join over a
# deduplicated (orderkey, suppkey) edge set.
# ---------------------------------------------------------------------------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that were the *sole* late shipper (>120 days after
    order date) on finished multi-supplier orders, counted and
    ranked. 'Late' adapted to shipdate lag (no receipt/commit dates
    in the driver schema)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk")
    )
    sole_late = (
        late.join(
            other,
            (late.l_orderkey == other.o_ok) & (late.l_suppkey != other.o_sk),
            "left_semi",
        ).join(
            other_late,
            (late.l_orderkey == F.col("x_ok")) & (late.l_suppkey != F.col("x_sk")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


Q21_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 120 DAY)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM pairs l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q9 — profit by supplier nation and order year: the widest star join
# in the catalog (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders). The
# driver schema has no partsupp, so unit cost is a deterministic
# stand-in (60% of p_retailprice). Plan shape that matters at scale:
# part (filtered) / supplier / nation broadcast; the only big shuffle
# is lineitem ⋈ orders on orderkey, then the groupBy reduce.
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    profit = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.round(F.col("p_retailprice") * 0.6, 4) * F.col("l_quantity"),
        4,
    ).cast(T.DecimalType(22, 4))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_dec"))
        .select(
            "nation", "o_year", F.col("profit_dec").cast("double").alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       (sum(round(l_extendedprice * (1 - l_discount)
                  - round(p_retailprice * 0.6, 4) * l_quantity,
                  4)::DECIMAL(22,4)))::DOUBLE AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Cube — multi-dimensional rollup over orders × customer segment
# (GROUPING SETS family; the reference has none of these — SURVEY
# §2.7 — but any analytics engine at this scale needs them). CUBE is
# a single shuffle: Spark expands the grouping sets map-side and
# aggregates once. grouping_id disambiguates "NULL because
# aggregated" from a real NULL group value.
# ---------------------------------------------------------------------------


def orders_cube_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    price_dec = F.round(F.col("o_totalprice"), 4).cast(T.DecimalType(22, 4))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .cube("o_orderstatus", "c_mktsegment")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(price_dec).alias("total_dec"),
        )
        .select(
            "o_orderstatus",
            "c_mktsegment",
            "gid",
            "n_orders",
            F.col("total_dec").cast("double").alias("total_price"),
        )
    )


CUBE_ORACLE = """
SELECT o_orderstatus, c_mktsegment,
       GROUPING(o_orderstatus, c_mktsegment) AS gid,
       count(*) AS n_orders,
       (sum(round(o_totalprice, 4)::DECIMAL(22,4)))::DOUBLE AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (o_orderstatus, c_mktsegment)
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier. The driver schema has no partsupp, so
# the (part, supplier) cost table is derived from lineitem: cost =
# cheapest observed line price. The plan shape is Q2's: a derived
# aggregate joined to its own per-part min (correlated subquery →
# groupBy + self-join), with all dimension joins broadcast.
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "SMALL")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    # dims are tiny at any SF — broadcast the supplier→nation→region
    # chain so the big derived aggregate never shuffles for them
    sup_eu = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(sup_eu), ps.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "cost")
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        offers.join(
            min_cost,
            (offers.p_partkey == F.col("mc_partkey"))
            & (offers.cost == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem GROUP BY 1, 2),
offers AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, cost
  FROM ps
  JOIN part ON p_partkey = l_partkey AND p_size <= 10 AND p_type = 'SMALL'
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
FROM offers o
WHERE cost = (SELECT min(cost) FROM offers i WHERE i.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested IN-subqueries → a chain of
# semi-joins. The part filter reduces before the lineitem aggregate;
# the supplier probe side is joined last against the small
# qualifying-supplier set.
# ---------------------------------------------------------------------------


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in ASIA that shipped > 100 total units of 'small %'
    parts during 1996 (adaptation of Q20's availqty threshold: the
    derived 'stock' is shipped volume)."""
    li = _t(spark, sf_dir, "lineitem")
    part_ids = _t(spark, sf_dir, "part").where(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    qualifying = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(part_ids), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    nat_asia = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey, "left_semi")
    return (
        sup.join(F.broadcast(nat_asia), sup.s_nationkey == nat_asia.n_nationkey, "left_semi")
        .join(qualifying, sup.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA')
  AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Q22 — global-outlook: customers above the global average balance
# with no orders. The scalar average broadcasts (one row), the
# no-orders test is a real anti-join; grouping is by nation.
# ---------------------------------------------------------------------------


def q22_global_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no 2000s orders (the
    synthetic data gives every customer *some* order, so 'inactive'
    = no recent order — the date filter pushes into the orders scan
    before the anti-join)."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.round("c_acctbal", 4).cast(T.DecimalType(22, 4)))
        .cast("double")
        .alias("totacctbal"),
    )


Q22_ORACLE = """
SELECT c_nationkey, count(*) AS numcust,
       sum(round(c_acctbal, 4)::DECIMAL(22,4))::DOUBLE AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


TPCH_CATALOG = {
    "q22_global_balance": (q22_global_balance, Q22_ORACLE),
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_ORACLE),
    "q20_excess_suppliers": (q20_excess_suppliers, Q20_ORACLE),
    "q4_priority_late_ship": (q4_priority_late_ship, Q4_ORACLE),
    "q9_product_profit": (q9_product_profit, Q9_ORACLE),
    "orders_cube_status_segment": (orders_cube_status_segment, CUBE_ORACLE),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_ORACLE),
    "q7_volume_shipping": (q7_volume_shipping, Q7_ORACLE),
    "q8_market_share": (q8_market_share, Q8_ORACLE),
    "q10_returned_items": (q10_returned_items, Q10_ORACLE),
    "q11_important_value": (q11_important_value, Q11_ORACLE),
    "q12_priority_classes": (q12_priority_classes, Q12_ORACLE),
    "q13_order_distribution": (q13_order_distribution, Q13_ORACLE),
    "q14_promo_revenue": (q14_promo_revenue, Q14_ORACLE),
    "q15_top_supplier": (q15_top_supplier, Q15_ORACLE),
    "q16_part_supplier_counts": (q16_part_supplier_counts, Q16_ORACLE),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_ORACLE),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_ORACLE),
    "q19_banded_revenue": (q19_banded_revenue, Q19_ORACLE),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_ORACLE),
}

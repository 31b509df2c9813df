"""spark.sql over registered views matches the DataFrame path — the
oracle SQL dialect (minus DuckDB-isms) runs verbatim on Spark SQL."""

from __future__ import annotations

from kafkaconnect_spark.sql import TABLES, register_views


def test_views_register_and_query(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert names == list(TABLES)
    got = spark.sql(
        """
        SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    assert len(got) >= 2 and all(r.sum_qty > 0 for r in got)
    ev = spark.sql("SELECT count(*) AS n, min(ts) AS t0 FROM events").first()
    assert ev.n > 0 and ev.t0 is not None

"""Bucketed-table co-located join: prove the exchange disappears.

At 100 TB, repeated fact-fact joins on the same key pay a full shuffle
each time unless both sides are bucketed on the join key — then the join
is exchange-free (SCALING.md's co-location claim, demonstrated)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) under the session default
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_exchange_free(spark, bucketed):
    o, l = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderpriority").count()
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        # ONE exchange total (the final aggregation); the join reads the
        # bucketed scans directly. Formatted explain mentions each
        # exchange twice (tree + node detail). An unbucketed plan would
        # carry two extra join-input exchanges.
        assert plan.count("Exchange") <= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed):
    o, l = bucketed
    plain_o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain_l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = {
        tuple(r)
        for r in o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    b = {
        tuple(r)
        for r in plain_o.join(plain_l, plain_o.o_orderkey == plain_l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert a == b

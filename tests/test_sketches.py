"""Mergeable HLL sketch pins (operators/sketches.py): merge-equals-
direct associativity, exactness in the sparse regime, further
mergeability of merged sketches, and the plan staying a plain two-phase
hash agg."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    sketches as SK,
)


@pytest.fixture(scope="module")
def events(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_type", "user_id")
    )


def test_rollup_estimates_exact_in_sparse_regime(spark, events):
    per = {r.event_type: r.n_distinct for r in SK.hll_rollup(events, ["event_type"], "user_id").collect()}
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert per == exact


def test_merge_equals_direct_and_exact(spark, events):
    per = SK.hll_rollup(events, ["event_type"], "user_id")
    merged = SK.hll_merge(per).collect()[0].n_distinct
    direct = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(SK.DEFAULT_LGK))
        ).alias("e")
    ).collect()[0].e
    exact = events.select("user_id").distinct().count()
    assert merged == direct == exact


def test_merged_sketches_merge_again(spark):
    # day -> week -> global: the merged sketch column is itself
    # mergeable, and every level agrees with the exact count
    df = spark.range(5000).select(
        (F.col("id") % 14).alias("day"),
        (F.floor(F.col("id") % 14 / 7)).alias("week"),
        (F.col("id") % 311).alias("user"),
    )
    daily = SK.hll_rollup(df, ["day", "week"], "user")
    weekly = SK.hll_merge(daily, ["week"])
    overall = SK.hll_merge(weekly).collect()[0].n_distinct
    exact_weekly = {
        r.week: r.n
        for r in df.groupBy("week").agg(F.count_distinct("user").alias("n")).collect()
    }
    assert {r.week: r.n_distinct for r in weekly.collect()} == exact_weekly
    assert overall == 311


def test_rollup_checked_raises_nothing_on_fixture(spark, events):
    out = SK.hll_rollup_checked(events, ["event_type"], "user_id").collect()
    assert out
    r = out[0]
    assert r.global_merged == r.global_direct == r.global_exact


def test_rollup_plan_is_two_phase_agg_no_join(spark, events):
    plan = (
        SK.hll_rollup(events, ["event_type"], "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    # partial + final aggregate pair over ONE exchange
    assert plan.count("Exchange") == 1

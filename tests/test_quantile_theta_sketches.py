"""Pins for the r11 sketch extensions: KLL mergeable quantiles
(operators/quantiles.py) and Theta distinct-set algebra
(operators/setsketches.py). Registration is queued for the r12
window (new-module discipline: zero query closure today)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    quantiles as Q,
    setsketches as TS,
)


@pytest.fixture(scope="module")
def facts(spark):
    # 4 groups x 2500 rows; v uniform 0..9999 per group with disjoint
    # offsets so per-group and rolled-up quantiles differ measurably
    return spark.range(10_000).selectExpr(
        "id % 4 AS g",
        "CAST(id AS DOUBLE) / 1.0 AS v",
        "id % 1500 AS u",
        "CASE WHEN id % 4 < 2 THEN 'day1' ELSE 'day2' END AS day",
    )


def test_kll_rollup_matches_direct_within_rank_bound(spark, facts):
    """Merged-sketch quantiles must sit within the KLL rank bound of
    the true quantiles — for BOTH the per-group sketches and a
    full-table rollup (merge path compounds error; the audit bound
    covers it)."""
    sk = Q.kll_group_sketches(facts, "v", ["g"])
    assert sk.count() == 4
    probs = [0.1, 0.5, 0.9]
    per_group = Q.kll_quantile_table(sk, probs, ["g"])
    audit = Q.kll_rank_check(facts, "v", per_group, ["g"]).collect()
    assert len(audit) == 12 and all(r.within_bound for r in audit)

    total = Q.kll_rollup(sk.withColumn("all", F.lit(1)), ["all"])
    assert total.first().n_rows == 10_000
    qt = Q.kll_quantile_table(total, probs, ["all"])
    audit2 = Q.kll_rank_check(
        facts.withColumn("all", F.lit(1)), "v", qt, ["all"]
    ).collect()
    assert len(audit2) == 3 and all(r.within_bound for r in audit2)


def test_kll_sketch_state_is_storable(spark, facts, tmp_path):
    """The whole point over percentile_approx: the sketch column
    round-trips through parquet and still merges/answers."""
    p = str(tmp_path / "kll")
    Q.kll_group_sketches(facts, "v", ["g"]).write.parquet(p)
    back = Q.kll_rollup(
        spark.read.parquet(p).withColumn("all", F.lit(1)), ["all"]
    )
    med = Q.kll_quantile_table(back, [0.5], ["all"]).first().est
    assert abs(med - 4999.5) < 10_000 * 3 * Q.RANK_EPS_K200


def test_theta_exact_regime_equals_join_answers(spark, facts):
    """Sparse regime (1500 distinct < 2^12 nominal): every estimate —
    union, intersection, both differences, jaccard — must EQUAL the
    exact join-side answers. This is the contract that lets a daily
    overlap report self-verify and RAISE on drift."""
    sk = TS.theta_group_sketches(facts, "u", ["day"])
    est = TS.theta_set_algebra(sk, "day", "day1", "day2")
    want = TS.exact_set_algebra(facts, "u", "day", "day1", "day2")
    assert est.collect() == want.collect()
    # drift check composes as exceptAll + raise; here assert empty
    assert est.exceptAll(want).count() == 0


def test_theta_rollup_unions_distinct_sets(spark, facts):
    """Rolling 4 per-group sketches up to one total must estimate the
    table-wide distinct count exactly in the sparse regime."""
    sk = TS.theta_group_sketches(facts, "u", ["g", "day"])
    assert sk.count() == 4
    total = TS.theta_rollup(sk.withColumn("all", F.lit(1)), ["all"])
    got = TS.theta_estimates(total, ["all"]).first().distinct_est
    assert got == 1500


def test_theta_null_values_are_not_set_members(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "grp string, u int"
    )
    sk = TS.theta_group_sketches(df, "u", ["grp"])
    assert TS.theta_estimates(sk, ["grp"]).first().distinct_est == 2


def test_theta_set_algebra_missing_group_raises(spark):
    """r11 ADVICE (setsketches.py): a group name with no sketch row
    must RAISE, not return an empty frame — a churn report against a
    missing snapshot has to fail loudly."""
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2)], ["snap", "v"]
    )
    sk = TS.theta_group_sketches(df, "v", ["snap"])
    got = TS.theta_set_algebra(sk, "snap", "a", "b").collect()
    assert len(got) == 1 and got[0]["n_union"] == 2
    with pytest.raises(SparkRuntimeException, match="both sides must exist"):
        TS.theta_set_algebra(sk, "snap", "a", "nope").collect()

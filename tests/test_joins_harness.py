"""As-of/range join unit tests + harness registry invariants."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark import harness
from rag_project_with_embeddings_and_vector_database_spark.operators import joins as J


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-10T00:00:00"), "a"), (1, _ts("2024-01-01T00:00:00"), "b"),
         (2, _ts("2024-01-05T00:00:00"), "c")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), 100), (1, _ts("2024-01-09T00:00:00"), 200),
         (2, _ts("2024-01-06T00:00:00"), 300)],
        ["k", "rts", "val"],
    )
    out = {r.tag: r for r in J.asof_join(left, right, "k", "ts", "rts", ["val"]).collect()}
    assert out["a"].asof_val == 200          # most recent prior
    assert out["b"].asof_val is None         # nothing before
    assert out["c"].asof_val is None         # right row is after left ts


def test_asof_join_exact_tie_and_tiebreak(spark):
    t = _ts("2024-01-05T00:00:00")
    left = spark.createDataFrame([(1, t, "x")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, t, 7), (1, t, 9), (1, _ts("2024-01-04T00:00:00"), 5)], ["k", "rts", "val"]
    )
    row = J.asof_join(left, right, "k", "ts", "rts", ["val"], right_tiebreak="val").collect()[0]
    # equal timestamp matches; tie among equal rts resolved to max tiebreak
    assert row.asof_val == 9


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-10T00:00:00"), "x")], ["k", "ts", "tag"])
    right = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"), 1)], ["k", "rts", "val"])
    out = J.asof_join(left, right, "k", "ts", "rts", ["val"], tolerance_seconds=3600).collect()[0]
    assert out.asof_val is None  # match older than tolerance is dropped


def test_range_join(spark):
    points = spark.createDataFrame([(5,), (15,)], ["p"])
    ranges = spark.createDataFrame([(0, 10, "lo"), (10, 20, "hi")], ["lo", "hi", "name"])
    got = {(r.p, r.name) for r in J.range_join(points, ranges, None, "p", "lo", "hi").collect()}
    assert got == {(5, "lo"), (15, "hi")}


def test_registry_invariants(spark):
    qs = harness.queries()
    oracles = harness.oracle_sql()
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # a healthy majority of queries are oracle-checked
    assert len(oracles) >= 45
    assert len(qs) >= 60
    # names are stable snake_case identifiers
    assert all(n.replace("_", "").isalnum() for n in qs)


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"config", "top_3_accuracy", "mrr", "combined_score", "rank"}

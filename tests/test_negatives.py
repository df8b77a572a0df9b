"""Hard-negative mining pins (operators/negatives.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    negatives as NG,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # 1-d embeddings on a line: similarity to query q at position p is
    # -|p - x| after trivial scoring; use 2-d unit-ish vectors instead
    # so cosine ordering is hand-checkable
    import math

    rows = [
        (i, [math.cos(i * 0.17), math.sin(i * 0.17)]) for i in range(12)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_positives_and_margin_are_excluded(spark, tiny):
    q = tiny.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # by construction the cosine ranking for query 0 is 0,1,2,...;
    # label 1 and 2 positive; rank-1 margin skips the self-hit (0)
    pos = spark.createDataFrame([(0, 1), (0, 2)], "query_id long, vec_id long")
    out = NG.mine_hard_negatives(
        q, tiny, pos, k=6, n_negatives=3, min_rank=1,
        corpus_id="vec_id", normalized=True,
    ).collect()
    ids = [r.vec_id for r in sorted(out, key=lambda r: r.neg_rank)]
    assert ids == [3, 4, 5]
    assert [r.neg_rank for r in sorted(out, key=lambda r: r.neg_rank)] == [1, 2, 3]


def test_candidates_hook_replaces_bruteforce(spark, tiny):
    """The stored-ANN scale path: a precomputed candidate frame is
    mined without touching the corpus at all."""
    cand = spark.createDataFrame(
        [(0, 10, 0.9, 1), (0, 11, 0.8, 2), (0, 5, 0.7, 3)],
        "query_id long, vec_id long, score double, rank int",
    )
    pos = spark.createDataFrame([(0, 11)], "query_id long, vec_id long")
    out = NG.mine_hard_negatives(
        None, None, pos, n_negatives=2, min_rank=1,
        corpus_id="vec_id", candidates=cand,
    ).collect()
    assert [(r.vec_id, r.neg_rank) for r in sorted(out, key=lambda r: r.neg_rank)] == [
        (5, 1)
    ]  # rank 1 skipped by margin, 11 is positive -> only 5 survives


def test_per_query_quota(spark, tiny):
    q = tiny.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pos = q.select("query_id", F.col("query_id").alias("vec_id"))
    out = NG.mine_hard_negatives(
        q, tiny, pos, k=8, n_negatives=4, corpus_id="vec_id", normalized=True
    )
    counts = {r.query_id: r.n for r in out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 4, 1: 4, 2: 4}


def test_broadcast_positives_flag(spark, tiny):
    """ADVICE r10: a positives table beyond the broadcast budget needs
    a way to drop the hint. broadcast_positives=False must return the
    identical mined set while planning NO broadcast side for the
    positives anti-join."""
    q = tiny.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pos = spark.createDataFrame([(0, 1), (0, 2)], "query_id long, vec_id long")
    kw = dict(k=6, n_negatives=3, min_rank=1, corpus_id="vec_id", normalized=True)
    a = NG.mine_hard_negatives(q, tiny, pos, **kw)
    b = NG.mine_hard_negatives(q, tiny, pos, broadcast_positives=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = b._jdf.queryExecution().optimizedPlan().toString()
    import re

    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("rightHint=(strategy=broadcast)" not in ln for ln in anti)

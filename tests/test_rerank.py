"""MMR re-ranking pins (operators/rerank.py): diversification on a
planted near-duplicate neighborhood, first-pick semantics, the
single-candidate edge, and argument validation."""

from __future__ import annotations

import math

import pytest

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    rerank as RR,
)


def _unit(*xs):
    n = math.sqrt(sum(x * x for x in xs))
    return [x / n for x in xs]


@pytest.fixture(scope="module")
def planted(spark):
    """Query q; corpus = two near-identical high-relevance vectors
    (A, A2), one diverse mid-relevance vector (B), one low (C)."""
    q = spark.createDataFrame(
        [(0, _unit(1.0, 0.0, 0.0, 0.0))], "query_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (10, _unit(0.90, 0.436, 0.0, 0.0)),   # A: rel 0.90
            (11, _unit(0.89, 0.456, 0.0, 0.0)),   # A2: rel 0.89, sim(A,A2) ~ 0.999
            (12, _unit(0.60, -0.80, 0.0, 0.0)),   # B: rel 0.60, sim(A,B) ~ 0.19
            (13, _unit(0.10, 0.0, 0.995, 0.0)),   # C: rel 0.10
        ],
        "vec_id long, embedding array<double>",
    )
    return q, corpus


def test_mmr_skips_near_duplicate(spark, planted):
    """Plain top-2 is {A, A2}; MMR top-2 at lam=0.5 must swap the
    near-copy A2 for the diverse B."""
    q, corpus = planted
    out = RR.mmr_rerank(
        q, corpus, n=2, k_candidates=4, lam=0.5,
        corpus_id="vec_id", normalized=True,
    ).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [10, 12]


def test_mmr_first_pick_is_relevance_argmax(spark, planted):
    q, corpus = planted
    out = RR.mmr_rerank(
        q, corpus, n=3, k_candidates=4, lam=0.7,
        corpus_id="vec_id", normalized=True,
    ).orderBy("rank").collect()
    assert out[0]["vec_id"] == 10
    # rank-1 score is lam * rel with an empty-selection penalty of 0
    assert out[0]["mmr_score"] == pytest.approx(0.7 * 0.90, abs=1e-4)
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_mmr_lam_one_reduces_to_topk(spark, planted):
    """lam=1 disables the penalty: MMR order == relevance order."""
    q, corpus = planted
    out = RR.mmr_rerank(
        q, corpus, n=4, k_candidates=4, lam=1.0,
        corpus_id="vec_id", normalized=True,
    ).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [10, 11, 12, 13]


def test_mmr_single_candidate_query_survives(spark, planted):
    """A query whose candidate pool is one row must still return it
    (the self-pair keeps the group alive)."""
    q, _ = planted
    corpus1 = spark.createDataFrame(
        [(42, _unit(0.5, 0.5, 0.5, 0.5))], "vec_id long, embedding array<double>"
    )
    out = RR.mmr_rerank(
        q, corpus1, n=3, k_candidates=5, lam=0.7,
        corpus_id="vec_id", normalized=True,
    ).collect()
    assert len(out) == 1 and out[0]["vec_id"] == 42 and out[0]["rank"] == 1


def test_mmr_negative_sim_penalty_is_true_max(spark):
    """Anti-similar candidates (negative max-sim to the selected set)
    must be PENALIZED BY the negative max — i.e. boosted — exactly as
    the documented formula and the unrolled-SQL oracle compute it. A
    zero-floored penalty (the pre-round-8 bug) would score D at
    lam*rel = 0.05 and wrongly pick E second; the true max gives D
    0.5*0.1 - 0.5*(-0.34) ~ 0.22 and D must win rank 2."""
    q = spark.createDataFrame(
        [(0, _unit(1.0, 0.0, 0.0, 0.0))], "query_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [
            (10, _unit(0.90, 0.436, 0.0, 0.0)),     # A: rel ~0.90, picked first
            (13, _unit(0.10, -0.995, 0.0, 0.0)),    # D: rel 0.10, sim(A,D) ~ -0.34
            (14, _unit(0.40, -0.367, 0.840, 0.0)),  # E: rel 0.40, sim(A,E) ~ +0.20
        ],
        "vec_id long, embedding array<double>",
    )
    out = RR.mmr_rerank(
        q, corpus, n=2, k_candidates=3, lam=0.5,
        corpus_id="vec_id", normalized=True,
    ).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [10, 13]
    # rank-2 score must include the NEGATIVE max-sim term
    assert out[1]["mmr_score"] == pytest.approx(0.222, abs=5e-3)


def test_mmr_argument_validation(spark, planted):
    q, corpus = planted
    with pytest.raises(ValueError):
        RR.mmr_rerank(q, corpus, n=10, k_candidates=5, corpus_id="vec_id")
    with pytest.raises(ValueError):
        RR.mmr_rerank(q, corpus, n=2, k_candidates=5, lam=1.5, corpus_id="vec_id")


def test_cosine_norms_hoisted_below_pair_joins(spark, planted):
    """r15 (VERDICT r14 item 4): the normalized=False branch computes
    each side's L2 norm ONCE per join-side row (cosine_with_norms,
    r14) — the physical plan must show the norm aggregates (sqrt over
    an aggregate loop) BELOW the pair join, never re-evaluated per
    joined pair above it. Pinned for both driven sites: score_pairs'
    broadcast nested-loop join and mmr_rerank's candidate self-join.
    In a formatted plan tree the operators ABOVE a join print before
    the join line, so partitioning the string at the join node name
    separates per-pair work from per-side work."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    q, corpus = planted
    scored = R.score_pairs(q, corpus, normalized=False)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    head, sep, below = plan.partition("BroadcastNestedLoopJoin")
    assert sep, plan[:400]
    assert "sqrt(" not in head.lower(), "per-pair norm aggregation above the join"
    assert below.lower().count("sqrt(") >= 2, "per-side norm projections missing"

    reranked = RR.mmr_rerank(
        q, corpus, n=2, k_candidates=4, lam=0.5,
        corpus_id="vec_id", normalized=False,
    )
    plan2 = reranked._jdf.queryExecution().executedPlan().toString()
    # the candidate self-join is the LAST join in the plan (its inputs
    # are the windowed top-k sides); everything above it — including
    # the sim projection — must be sqrt-free
    head2 = plan2[: plan2.rindex("Join")]
    assert "sqrt(" not in head2.partition("Join")[0].lower(), (
        "per-pair norm aggregation above the candidate self-join"
    )

    # the branch also returns the same rows as the dot path here: the
    # fixture vectors are unit, so full cosine == dot
    got = sorted(
        (r.vec_id, r.rank) for r in reranked.collect()
    )
    want = sorted(
        (r.vec_id, r.rank)
        for r in RR.mmr_rerank(
            q, corpus, n=2, k_candidates=4, lam=0.5,
            corpus_id="vec_id", normalized=True,
        ).collect()
    )
    assert got == want

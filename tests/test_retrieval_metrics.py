"""Retrieval + metric layer tests with hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import metrics as M
from rag_project_with_embeddings_and_vector_database_spark.operators import retrieval as R


def test_knn_bruteforce_exact(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.6, 0.8])], ["id", "embedding"]
    )
    queries = spark.createDataFrame([(10, [1.0, 0.0])], ["query_id", "embedding"])
    out = R.knn_bruteforce(queries, corpus, k=2, normalized=False).collect()
    assert [(r.id, r.rank) for r in out] == [(1, 1), (3, 2)]
    assert out[0].score == 1.0 and abs(out[1].score - 0.6) < 1e-9


def test_knn_lsh_recall_against_bruteforce(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = R.knn_bruteforce(q, e, 10, corpus_id="vec_id", normalized=True).collect()
    approx = R.knn_lsh(q, e, 10, corpus_id="vec_id", bucket_length=2.0, num_hash_tables=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q_] & approx_sets.get(q_, set())) / len(exact_sets[q_]) for q_ in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # LSH tested for recall, not equality


def test_metrics_hand_computed(spark):
    # one query, 4 hits: relevant at ranks 2 and 3
    hits = spark.createDataFrame(
        [("q1", 1, 0.9, False), ("q1", 2, 0.8, True), ("q1", 3, 0.7, True), ("q1", 4, 0.6, False)],
        ["qid", "rank", "score", "relevant"],
    )
    row = M.per_query_metrics(hits, ["qid"]).collect()[0]
    assert row.top_1 == 0.0
    assert row.top_3 == 1.0
    assert row.mrr == 0.5
    assert abs(row.avg_similarity - 0.75) < 1e-12


def test_metrics_no_relevant_hits_zero(spark):
    hits = spark.createDataFrame(
        [("q1", 1, 0.9, False), ("q1", 2, 0.8, False)], ["qid", "rank", "score", "relevant"]
    )
    row = M.per_query_metrics(hits, ["qid"]).collect()[0]
    assert (row.top_1, row.top_3, row.mrr, row.avg_similarity) == (0.0, 0.0, 0.0, 0.0)


def test_metrics_grid_emits_zero_rows_for_hitless_groups(spark):
    """A (query, config) group with zero retrieved hits must still show
    up as a 0.0-metric row when the full grid is passed (reference
    scores every query per config, evaluation.py:160-186)."""
    hits = spark.createDataFrame(
        [("q1", "cfgA", 1, 0.9, True)], ["qid", "config", "rank", "score", "relevant"]
    )
    grid = spark.createDataFrame(
        [("q1", "cfgA"), ("q1", "cfgB"), ("q2", "cfgA")], ["qid", "config"]
    )
    rows = {
        (r.qid, r.config): (r.top_1, r.top_3, r.mrr, r.avg_similarity)
        for r in M.per_query_metrics(hits, ["qid", "config"], grid=grid).collect()
    }
    assert set(rows) == {("q1", "cfgA"), ("q1", "cfgB"), ("q2", "cfgA")}
    assert rows[("q1", "cfgA")] == (1.0, 1.0, 1.0, 0.9)
    assert rows[("q1", "cfgB")] == (0.0, 0.0, 0.0, 0.0)
    assert rows[("q2", "cfgA")] == (0.0, 0.0, 0.0, 0.0)


def test_config_agg_and_rank(spark):
    pq = spark.createDataFrame(
        [("a", 1.0, 1.0, 1.0, 0.9), ("a", 0.0, 1.0, 0.5, 0.8), ("b", 0.0, 0.0, 0.0, 0.0)],
        ["config", "top_1", "top_3", "mrr", "avg_similarity"],
    )
    cfg = M.per_config_metrics(pq, ["config"])
    rows = {r.config: r for r in cfg.collect()}
    assert rows["a"].top_1_accuracy == 0.5
    assert rows["a"].mrr == 0.75
    assert rows["a"].num_queries == 2
    ranked = M.rank_configs(M.combined_score(cfg), ["config"]).collect()
    assert [r.config for r in ranked] == ["a", "b"]
    assert ranked[0].rank == 1
    best = M.argmax_by_metric(cfg, "mrr", ["config"]).collect()[0]
    assert best.config == "a" and best.metric == "mrr"


def test_relevance_predicate(spark):
    df = spark.createDataFrame(
        [("report_q1.md", "Revenue GREW a lot", "q1", ["revenue"]),
         ("report_q1.md", "nothing here", "q1", ["revenue"]),
         ("other.md", "revenue too", "q1", ["revenue"])],
        ["source_file", "content", "exp", "kws"],
    )
    got = [
        r.rel
        for r in df.select(
            M.relevance("source_file", "content", F.lit("q1"), "kws").alias("rel")
        ).collect()
    ]
    assert got == [True, False, False]


def test_vector_table_roundtrip(spark, tmp_path):
    vt = R.VectorTable(spark, str(tmp_path / "vectors"))
    df = spark.createDataFrame(
        [("fixed", "m1", 1, [1.0, 0.0]), ("fixed", "m2", 2, [0.0, 1.0])],
        ["strategy", "model", "id", "embedding"],
    )
    vt.upsert(df)
    assert vt.read().count() == 2
    assert {tuple(r) for r in vt.collections().collect()} == {("fixed", "m1"), ("fixed", "m2")}
    assert vt.info(strategy="fixed", model="m1")["points_count"] == 1
    # dynamic partition overwrite: rewriting one collection leaves the other
    vt.upsert(
        spark.createDataFrame([("fixed", "m1", 9, [0.5, 0.5])], ["strategy", "model", "id", "embedding"])
    )
    left = {(r.model, r.id) for r in vt.read().collect()}
    assert left == {("m1", 9), ("m2", 2)}


def test_ndcg_at_k_known_values(spark):
    """nDCG@k pins (r14): perfect ranking -> 1.0; single relevant hit at
    rank 3 with one relevant candidate -> 1/log2(4) = 0.5; no relevant
    candidates -> 0.0; and the metric never exceeds 1."""
    import math

    hits = spark.createDataFrame(
        # q1: both hits relevant at ranks 1-2 (perfect for n_rel=2)
        # q2: single relevant at rank 3 (n_rel=1)
        # q3: nothing relevant (n_rel=0)
        [(1, 1, True), (1, 2, True),
         (2, 1, False), (2, 2, False), (2, 3, True),
         (3, 1, False)],
        "qid int, rank int, relevant boolean",
    )
    n_rel = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 0)], "qid int, n_rel int"
    )
    got = {r.qid: r.ndcg for r in M.ndcg_at_k(hits, n_rel, ("qid",), k=10).collect()}
    assert got[1] == 1.0
    assert got[2] == round(1.0 / math.log2(4), 6)
    assert got[3] == 0.0
    assert all(0.0 <= v <= 1.0 for v in got.values())

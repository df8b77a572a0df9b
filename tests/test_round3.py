"""Round-3 additions: quadratic-path gates, metrics grid outer join,
the reference-corpus end-to-end run, and the drain-and-stop streaming
sessionize mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import dedup as DD
from rag_project_with_embeddings_and_vector_database_spark.operators import metrics as M


def test_embedding_neardup_requires_bounded_probe(spark):
    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_probe_docs"):
        DD.embedding_neardup_pairs(df, max_probe_docs=10).collect()
    # bounded probe passes the gate
    out = DD.embedding_neardup_pairs(
        df, probe_filter=F.col("vec_id") < 5, max_probe_docs=10, normalized=True, threshold=0.5
    )
    assert out.count() > 0


def test_ngram_jaccard_gate_single_count_and_raise(spark):
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text "), F.col("id")).alias("text")
    )
    with pytest.raises(ValueError, match="max_docs"):
        DD.ngram_jaccard_pairs(docs, max_docs=10)
    # under the gate it runs
    assert DD.ngram_jaccard_pairs(docs.filter("doc_id < 5"), max_docs=10).count() == 10


def test_metrics_grid_full_outer_keeps_ungridded_groups(spark):
    hits = spark.createDataFrame(
        [("q1", 1, True, 0.9), ("q2", 1, False, 0.5)],
        "query_id string, rank int, relevant boolean, score double",
    )
    # grid misses q2 entirely and adds an empty q3
    grid = spark.createDataFrame([("q1",), ("q3",)], "query_id string")
    out = M.per_query_metrics(hits, ["query_id"], grid=grid).collect()
    got = {r.query_id: r for r in out}
    assert set(got) == {"q1", "q2", "q3"}  # q2 kept, q3 zero-filled
    assert got["q3"].mrr == 0.0 and got["q3"].top_1 == 0.0
    assert got["q1"].top_1 == 1.0
    assert got["q2"].mrr == 0.0  # present, no relevant hit


def test_stateful_sessionize_no_timeout_batchless_flag():
    # idle_timeout_ms=0 must select NoTimeout (drain-and-stop mode); the
    # session fn must then never register a processing-time timeout.
    from rag_project_with_embeddings_and_vector_database_spark.streaming.stateful import (
        _session_fn,
    )

    fn = _session_fn(gap_us=60_000_000, timeout_ms=0)

    class _State:
        hasTimedOut = False
        exists = False

        def update(self, v):
            self.v = v

        def setTimeoutDuration(self, ms):  # pragma: no cover
            raise AssertionError("timeout registered in NoTimeout mode")

    import pandas as pd

    out = list(fn((7,), [pd.DataFrame({"ts_us": [0, 10, 200_000_000]})], _State()))
    # one closed session (0..10), one left open in state
    assert len(out) == 1 and out[0].values.tolist() == [[7, 0, 10, 2]]


def test_repetition_stats_edges(spark):
    from rag_project_with_embeddings_and_vector_database_spark.functions.text import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b\na b\na b"),        # all 3 lines identical, bigram 'a b' x3
            (2, "x y\nz w"),             # no repeats
            (3, ""),                     # empty -> zeros
            (4, "solo"),                 # 1 line, no bigram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].dup_line_frac == 1.0 and got[1].dup_line_char_frac == 1.0
    # tokens a b a b a b -> bigrams 'a b' x3, 'b a' x2 -> top share 3/5
    assert got[1].top_2gram_frac == 0.6
    # tokens x y z w -> bigrams 'x y','y z','z w' all distinct -> 1/3
    assert got[2].dup_line_frac == 0.0 and got[2].top_2gram_frac == 0.333333
    assert got[3].dup_line_frac == 0.0 and got[3].top_2gram_frac == 0.0
    assert got[4].top_2gram_frac == 0.0


def test_hash_split_stable_and_validated(spark):
    from rag_project_with_embeddings_and_vector_database_spark.operators import sampling as SA

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        SA.hash_split(df, weights={"train": 0.5, "test": 0.4})
    a = dict(SA.hash_split(df).select("doc_id", "split").collect())
    # stable under repartitioning (the property rand()-splits lack)
    b = dict(SA.hash_split(df.repartition(7)).select("doc_id", "split").collect())
    assert a == b
    from collections import Counter

    counts = Counter(a.values())
    assert 820 <= counts["train"] <= 970  # ~90% of 1000
    sampled = SA.deterministic_sample(df, fraction=0.2).count()
    assert 140 <= sampled <= 260  # ~20% of 1000


def test_pii_scan_positive_path(spark, sf_dir, monkeypatch):
    # the driver corpus contains no PII (all-zero counts), so the
    # positive path needs explicit exercise: plant each pattern kind
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or alice@test.org today"),
            (2, "call +1 555-123-4567 about server 10.0.0.1"),
            (3, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(H, "_t", lambda spark, sf_dir, name: docs)
    got = {r.doc_id: r for r in H.SPARK_QUERIES["pii_scan"](spark, sf_dir).collect()}
    assert got[1].n_emails == 2 and got[1].has_pii
    assert got[2].n_phones == 1 and got[2].n_ipv4 == 1 and got[2].has_pii
    assert got[3].n_emails == got[3].n_phones == got[3].n_ipv4 == 0 and not got[3].has_pii


def test_decontaminate_flags_overlap(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    out = H.SPARK_QUERIES["decontaminate"](spark, sf_dir)
    counts = {r.contaminated: r.n for r in out.groupBy("contaminated").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    assert counts.get(False, 0) > 0  # most docs clean


def test_sequence_pack_properties(spark):
    from rag_project_with_embeddings_and_vector_database_spark.operators.packing import (
        sequence_pack,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        # token counts vary 1..~60; doc 7 is oversized vs budget 40
        F.when(F.col("id") == 7, F.lit(" ".join(["w"] * 200))).otherwise(
            F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 40 + 1).cast("int")))
        ).alias("text"),
    )
    out = sequence_pack(docs, budget_tokens=40, n_buckets=4).collect()
    assert sorted(r.doc_id for r in out) == list(range(300))  # every doc exactly once
    from collections import defaultdict

    seq_tokens, seq_sizes = defaultdict(int), defaultdict(int)
    for r in out:
        seq_tokens[(r.bucket, r.seq_id)] += r.doc_tokens
        seq_sizes[(r.bucket, r.seq_id)] += 1
    for k, tot in seq_tokens.items():
        assert tot <= 40 or seq_sizes[k] == 1  # budget holds except oversized singletons
    # deterministic under repartitioning
    again = sequence_pack(docs.repartition(13), budget_tokens=40, n_buckets=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_quantize_int8_bounds_and_zero_vector(spark):
    from rag_project_with_embeddings_and_vector_database_spark.functions import vectors as V

    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125]), (2, [0.0, 0.0, 0.0]), (3, [-1.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    amax = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    q = df.select(
        "vec_id",
        V.quantize_int8("embedding").alias("q"),
        F.aggregate(
            F.zip_with(
                V.dequantize_int8(V.quantize_int8("embedding"), amax),
                F.col("embedding"),
                lambda d, x: F.abs(d - x),
            ),
            F.lit(0.0),
            lambda a, x: F.greatest(a, x),
        ).alias("max_err"),
    ).collect()
    got = {r.vec_id: r for r in q}
    assert got[1].q == [127, -63, 32]
    assert got[1].max_err <= 0.5 / 254 + 1e-12  # half-up worst case = scale/254
    assert got[2].q == [0, 0, 0] and got[2].max_err == 0.0  # zero vector passes through
    assert got[3].q == [-127, 127, 0]


def test_pipeline_reference_corpus_deterministic(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    fn = H.SPARK_QUERIES["pipeline_reference_corpus"]
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == 25  # the reference's full grid: 5 strategies x 5 models
    assert [r[-1] for r in sorted(a, key=lambda r: r[-1])] == list(range(1, 26))

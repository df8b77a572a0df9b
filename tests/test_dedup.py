"""Dedup operator tests: exact, minhash, simhash, jaccard, components."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import dedup as DD

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (3, "completely different content about spark query engines at scale"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups(spark):
    out = DD.exact_dedup(_docs(spark)).collect()
    by_keeper = {r.keeper_id: r.n_dups for r in out}
    assert by_keeper[0] == 2  # docs 0,1 collapse
    assert by_keeper[2] == 1 and by_keeper[3] == 1


def test_minhash_identical_docs_identical_sigs(spark):
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in _docs(spark)
        .select("doc_id", DD.minhash_signature(DD.shingles("text"), 16, 42).alias("sig"))
        .collect()
    }
    assert sigs[0] == sigs[1]
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 16
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 16
    assert agree_near > agree_far
    assert all(0 <= v < (1 << 31) for v in sigs[0])


def test_minhash_lsh_finds_dup_pair(spark):
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in DD.minhash_lsh_pairs(_docs(spark)).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert all(a < b for a, b in pairs)


def test_simhash_hamming(spark):
    sh = {
        r.doc_id: r.sh
        for r in _docs(spark).select("doc_id", DD.simhash("text", 32).alias("sh")).collect()
    }
    assert sh[0] == sh[1]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[0], sh[2]) < ham(sh[0], sh[3])
    assert all(0 <= v < (1 << 32) for v in sh.values())


def test_ngram_jaccard_pairs(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard for r in DD.ngram_jaccard_pairs(_docs(spark), n=3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.0 < pairs[(0, 2)] < 1.0
    assert pairs[(0, 3)] == 0.0


def test_connected_components_collapses_cluster(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r.id: r.component for r in DD.connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_embedding_neardup_threshold(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.04]), (3, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    pairs = DD.embedding_neardup_pairs(df, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_simhash_pairs_pigeonhole_blocking(spark):
    pairs = {
        (r.id_a, r.id_b): r.hamming for r in DD.simhash_pairs(_docs(spark)).collect()
    }
    assert pairs[(0, 1)] == 0  # identical docs: distance 0, found via every block
    assert all(h <= 3 for h in pairs.values())
    assert all(a < b for a, b in pairs)


def test_lsh_giant_bucket_guard_degenerate_corpus(spark):
    """Thousands of identical docs -> one degenerate bucket. The guard
    must drop it (no quadratic pair blowup) while distinct documents
    still pair up; bucket_stats flags what was dropped."""
    boiler = [(i, "identical boilerplate text repeated across the whole corpus") for i in range(3000)]
    distinct = [
        (100000, "the quick brown fox jumps over the lazy dog again and again"),
        (100001, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(boiler + distinct, ["doc_id", "text"])

    pairs = DD.minhash_lsh_pairs(df, max_bucket_size=1000).collect()
    ids = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert not (ids & set(range(3000)))  # boilerplate bucket dropped, not exploded
    assert {(r.id_a, r.id_b) for r in pairs} == {(100000, 100001)}

    sh_pairs = DD.simhash_pairs(df, max_bucket_size=1000).collect()
    assert {(r.id_a, r.id_b) for r in sh_pairs} == {(100000, 100001)}

    # observability: the dropped buckets are visible with their sizes
    from rag_project_with_embeddings_and_vector_database_spark.operators.dedup import (
        _P,
        bucket_stats,
        minhash_bands,
        minhash_signatures,
    )

    sig = minhash_signatures(df, num_perm=16, seed=42)
    banded = sig.select(
        "doc_id", F.explode(minhash_bands("sig", 4, 4)).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_hash")
    stats = bucket_stats(banded, ["band", "band_hash"], 1000)
    dropped = stats.filter("dropped").collect()
    assert dropped and all(r.n_members == 3000 for r in dropped)


def test_ngram_jaccard_pairs_requires_candidates_at_scale(spark):
    import pytest

    big = spark.range(3000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc text "), F.col("id")).alias("text")
    )
    with pytest.raises(ValueError, match="candidates"):
        DD.ngram_jaccard_pairs(big)

    # candidate-pairs path: linear scoring joins, no theta join
    cand = spark.createDataFrame([(0, 1), (0, 3)], ["id_a", "id_b"])
    scored = {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(_docs(spark), candidates=cand).collect()
    }
    assert scored[(0, 1)] == 1.0 and scored[(0, 3)] == 0.0


def test_simhash_fingerprints_keeps_tokenless_docs(spark):
    df = spark.createDataFrame([(1, "real words here"), (2, "   ")], ["doc_id", "text"])
    out = {r.doc_id: r.simhash for r in DD.simhash_fingerprints(df).collect()}
    assert set(out) == {1, 2}
    assert out[2] == 0
    # column form agrees
    col = {
        r.doc_id: r.sh
        for r in df.select("doc_id", DD.simhash("text", 32).alias("sh")).collect()
    }
    assert col == out

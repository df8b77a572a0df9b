"""embed_incremental pins (operators/embedding.py): hit/miss routing by
content hash, value identity between cached and fresh paths, cold
start, and cache-duplicate tolerance."""

from __future__ import annotations

from pyspark.sql import functions as SF

from rag_project_with_embeddings_and_vector_database_spark.operators.embedding import (
    embed,
    embed_incremental,
)

MODEL = "all-MiniLM-L6-v2"


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_cold_start_embeds_everything(spark):
    d = _corpus(spark, [(1, "alpha beta"), (2, "gamma")])
    out = embed_incremental(d, None, MODEL, text_col="content").collect()
    assert len(out) == 2 and all(not r["reused"] for r in out)
    assert all(len(r["embedding"]) == 384 for r in out)


def test_hits_and_misses_route_by_content_hash(spark):
    old = _corpus(spark, [(1, "alpha beta"), (2, "gamma delta")])
    cache = embed_incremental(old, None, MODEL, text_col="content").select(
        "content_hash", "embedding"
    )
    new = _corpus(
        spark,
        [
            (10, "alpha beta"),      # same text, different id -> hit
            (2, "gamma delta"),      # identical row -> hit
            (3, "epsilon zeta"),     # new text -> miss
        ],
    )
    out = {r["doc_id"]: r for r in embed_incremental(new, cache, MODEL, text_col="content").collect()}
    assert out[10]["reused"] and out[2]["reused"] and not out[3]["reused"]
    # cached vector == fresh-embed vector for the same text
    fresh = {
        r["doc_id"]: r["embedding"]
        for r in embed(new, MODEL, text_col="content", backend="hash").collect()
    }
    for did in (10, 2, 3):
        assert out[did]["embedding"] == fresh[did]


def test_duplicate_cache_entries_are_tolerated(spark):
    old = _corpus(spark, [(1, "same text"), (2, "same text")])
    cache = embed_incremental(old, None, MODEL, text_col="content").select(
        "content_hash", "embedding"
    )
    assert cache.count() == 2  # two rows, one distinct hash
    new = _corpus(spark, [(9, "same text")])
    out = embed_incremental(new, cache, MODEL, text_col="content").collect()
    assert len(out) == 1 and out[0]["reused"]


def test_miss_cost_is_proportional_to_new_content(spark):
    """The inference path must see ONLY the misses — pinned by counting
    rows on each side of the split rather than trusting the flag."""
    old = _corpus(spark, [(i, f"text number {i}") for i in range(20)])
    cache = embed_incremental(old, None, MODEL, text_col="content").select(
        "content_hash", "embedding"
    )
    new = _corpus(spark, [(i, f"text number {i}") for i in range(25)])
    out = embed_incremental(new, cache, MODEL, text_col="content")
    counts = {r["reused"]: r["n"] for r in out.groupBy("reused").agg(SF.count("*").alias("n")).collect()}
    assert counts == {True: 20, False: 5}


def test_conflicting_cache_rows_resolve_deterministically(spark):
    """A corrupted / mixed-model store holding two DIFFERENT vectors for
    one hash must serve a stable answer — the array-ordering min — not a
    partitioning-dependent arbitrary row (ADVICE r7)."""
    new = _corpus(spark, [(9, "same text")])
    h = new.select(SF.md5("content").alias("h")).first()["h"]
    lo = [0.1] * 4
    hi = [0.9] * 4
    for order in ([(h, hi), (h, lo)], [(h, lo), (h, hi)]):
        cache = spark.createDataFrame(
            order, "content_hash string, embedding array<double>"
        ).repartition(4)
        out = embed_incremental(new, cache, MODEL, text_col="content").collect()
        assert len(out) == 1 and out[0]["reused"]
        assert [round(x, 6) for x in out[0]["embedding"]] == lo

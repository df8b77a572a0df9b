"""Extension surface: users add a chunking strategy by registering a
plain Python function (the Spark analog of the reference's subclass
registry, /root/reference/README.md:180-192 + chunking.py:504-512)."""

from __future__ import annotations

import pytest

from rag_project_with_embeddings_and_vector_database_spark.operators import chunking as CH


@pytest.fixture
def custom_strategy():
    def chunk_lines(text, cfg):
        return [CH._Chunk(ln, {"line_len": len(ln)}) for ln in text.split("\n") if ln.strip()]

    CH.STRATEGY_FUNCS["lines"] = chunk_lines
    yield "lines"
    del CH.STRATEGY_FUNCS["lines"]


def test_registered_strategy_runs_through_spark(spark, custom_strategy):
    docs = spark.createDataFrame([("d.md", "one\ntwo\n\nthree")], ["path", "content"])
    out = CH.chunk_documents(docs, (custom_strategy,)).collect()
    assert [r.content for r in out] == ["one", "two", "three"]
    assert [r.chunk_id for r in out] == [f"d.md_lines_{i}" for i in range(3)]
    assert out[0].metadata == {"line_len": "3"}


def test_registered_strategy_joins_fanout(spark, custom_strategy):
    docs = spark.createDataFrame([("d.md", "a\nb")], ["path", "content"])
    strategies = ("recursive", custom_strategy)
    out = CH.chunk_documents(docs, strategies).collect()
    assert {r.strategy for r in out} == {"recursive", "lines"}


def test_image_features_decoder_injection(spark):
    """VERDICT r13 item 7: the multimodal decode seam. Injecting a
    non-sha256 decoder through image_features(decoder=...) must keep
    every contract pin — schema, one row per image, 96-float features,
    determinism across runs — while producing features that DIFFER
    from the sha256 stub, proving the pins live on the mapInPandas
    contract, not the stub arithmetic."""
    from pyspark.sql import functions as F

    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        multimodal as MM,
    )

    # defined INSIDE the test so cloudpickle ships it by value (a test
    # module is not importable on executors); a deliberately NON-sha256
    # fake codec — 96 floats from a byte-value histogram of the payload
    def _histogram_decoder(payload, w, h):
        bins = [0.0] * 96
        for b in payload:
            bins[b % 96] += 1.0
        n = max(len(payload), 1)
        return [v / n for v in bins]

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    media = MM.to_media(docs, "doc_id", "text", "image", "image/fake")
    injected = MM.image_features(media, decoder=_histogram_decoder)
    stub = MM.image_features(media)
    assert [f.name for f in injected.schema.fields] == [
        "media_id", "width", "height", "features",
    ]
    rows = {r.media_id: r for r in injected.collect()}
    assert len(rows) == media.count()  # one row per image, any decoder
    assert all(len(r.features) == 96 for r in rows.values())
    assert all(r.width == 32 and r.height == 32 for r in rows.values())
    # deterministic: a second run is bit-identical
    again = {r.media_id: r.features for r in
             MM.image_features(media, decoder=_histogram_decoder).collect()}
    assert all(rows[k].features == again[k] for k in rows)
    # and genuinely different arithmetic from the sha256 stub
    stub_rows = {r.media_id: r.features for r in stub.collect()}
    assert any(rows[k].features != stub_rows[k] for k in rows)

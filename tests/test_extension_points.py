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

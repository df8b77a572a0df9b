"""Stateless streaming decontamination gate (operators/bloom.py
bloom_flag_docs — r12): the per-document EXISTS probe is a pure row
predicate, so the identical expression must produce identical verdicts
over a batch frame and a real Structured Streaming drain, with no
state store and no watermark."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    bloom as BL,
)
from rag_project_with_embeddings_and_vector_database_spark.operators.dedup import (
    shingles,
)
from rag_project_with_embeddings_and_vector_database_spark.functions.text import (
    md5_long,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def packed(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 10)
    grams = bench.select(F.explode(shingles("text", 5)).alias("_g")).select(
        md5_long(F.col("_g")).alias("gh")
    )
    return BL.bloom_pack(BL.bloom_positions(grams, "gh")).localCheckpoint()


def test_flag_docs_matches_decontaminate_verdict(spark, packed):
    """The stateless EXISTS verdict must equal bloom_decontaminate's
    contaminated column (same filter, same grams) on every doc."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10).select("doc_id", "text")
    full = {
        r.doc_id: r.contaminated
        for r in BL.bloom_decontaminate(corpus, bench).collect()
    }
    flagged = {
        r.doc_id: r.contaminated
        for r in BL.bloom_flag_docs(corpus, packed).select(
            "doc_id", "contaminated"
        ).collect()
    }
    assert full == flagged
    assert any(full.values()), "fixture must contain contamination"


def test_streaming_drain_parity_no_state(spark, packed, tmp_path):
    """A real availableNow drain through the gate must emit the same
    verdicts as batch — and the gate must run in APPEND mode with no
    watermark (stateless proof)."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") >= 10)
        .select("doc_id", "text")
    )
    src = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    gated = BL.bloom_flag_docs(stream, packed).select("doc_id", "contaminated")
    qname = f"bloomgate_{uuid.uuid4().hex[:10]}"
    q = (
        gated.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r.doc_id: r.contaminated for r in spark.table(qname).collect()
    }
    batch = {
        r.doc_id: r.contaminated
        for r in BL.bloom_flag_docs(docs, packed)
        .select("doc_id", "contaminated")
        .collect()
    }
    assert streamed == batch
    assert len(streamed) == docs.count()

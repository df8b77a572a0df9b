"""Store-level BM25 index maintenance pins (operators/ranking.py
write_text_index / append_text_index / write_index_frames /
query_text_index — VERDICT r10 item 3): the r11 shape materializes the
term-bucketed postings store straight off the build lineage (no
checkpoint) and makes day-2 upserts APPEND-ONLY at the store, so the
round-trip identities proven at the frame level (tests/test_round6.py)
must also hold through the parquet layout."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    ranking as RK,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"term{i % 7} shared word{i} extra tail" + (" dup dup" if i % 3 == 0 else ""))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _frames_sorted(p, d, s):
    return (
        sorted(map(tuple, p.select("term", "doc_id", "tf", "dl").collect())),
        sorted(map(tuple, d.collect())),
        sorted(map(tuple, s.collect())),
    )


def test_store_append_equals_full_rebuild_store(spark, docs, tmp_path):
    """write(old) + append(delta) must read back IDENTICAL frames to
    write(full) — postings multiset, dfreq, and exact-integer stats —
    and the appended store must keep the bucket layout consistent
    with the shared writer/prober expression."""
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")
    RK.write_text_index(docs, full_dir)
    RK.write_text_index(docs.filter(F.col("doc_id") >= 10), inc_dir)
    RK.append_text_index(inc_dir, docs.filter(F.col("doc_id") < 10))
    got = _frames_sorted(*RK.read_text_index(spark, inc_dir))
    want = _frames_sorted(*RK.read_text_index(spark, full_dir))
    assert got == want
    # bucket-layout consistency: every stored row sits in the dir the
    # prober would derive for its term
    stored = spark.read.parquet(f"{inc_dir}/postings")
    bad = stored.filter(
        F.col("term_bucket") != RK.term_bucket(F.col("term"))
    ).count()
    assert bad == 0


def test_store_query_matches_frame_query(spark, docs, tmp_path):
    """query_text_index (pruned partition read) must return exactly
    bm25_query_indexed over the unpruned frames."""
    d = str(tmp_path / "idx")
    RK.write_text_index(docs, d)
    qdf = spark.createDataFrame(
        [(0, "term1 shared"), (1, "word3 tail")], "query_id long, query string"
    )
    via_store = RK.query_text_index(spark, d, qdf, k=5)
    p, df_, s = RK.read_text_index(spark, d)
    via_frames = RK.bm25_query_indexed(p, df_, s, qdf, k=5)
    assert sorted(map(tuple, via_store.collect())) == sorted(
        map(tuple, via_frames.collect())
    )


def test_delete_through_store_frames(spark, docs, tmp_path):
    """text_index_delete fed from read_text_index (column-pruned store
    reads) and persisted via write_index_frames must equal a rebuild
    store over the survivors."""
    d0, d1, d2 = (str(tmp_path / x) for x in ("full", "maintained", "rebuild"))
    RK.write_text_index(docs, d0)
    gone = docs.filter(F.col("doc_id") < 10).select("doc_id")
    RK.write_index_frames(
        *RK.text_index_delete(*RK.read_text_index(spark, d0), gone), d1
    )
    RK.write_text_index(docs.filter(F.col("doc_id") >= 10), d2)
    got = _frames_sorted(*RK.read_text_index(spark, d1))
    want = _frames_sorted(*RK.read_text_index(spark, d2))
    assert got == want

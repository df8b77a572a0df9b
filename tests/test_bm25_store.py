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
    # prober would derive for its term — under the modulus the store
    # RECORDS (r14 auto-sizing), which the append must have adopted
    mod = RK._postings_modulus(spark, inc_dir)
    assert mod == RK._postings_modulus(spark, full_dir)
    stored = spark.read.parquet(f"{inc_dir}/postings")
    bad = stored.filter(
        F.col("term_bucket") != RK.term_bucket(F.col("term"), mod)
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


def test_tombstone_delete_equals_rebuild_and_survives_compaction(spark, docs, tmp_path):
    """Logical delete (tombstone_delete): probe results must equal a
    rebuild over the survivors WITHOUT any postings rewrite (the
    physical rows stay; only the tombstone set and the KB sidecar
    change), a REPEATED delete of the same ids must not
    double-subtract the sidecar, and compacting into a new generation
    must leave probe results identical with the deleted rows
    physically gone."""
    from pyspark.sql import functions as F

    live, rebuilt, gen2 = (str(tmp_path / x) for x in ("live", "rebuilt", "gen2"))
    RK.write_text_index(docs, live)
    gone = docs.filter(F.col("doc_id") < 10).select("doc_id")
    RK.tombstone_delete(spark, live, gone)
    RK.write_text_index(docs.filter(F.col("doc_id") >= 10), rebuilt)
    qdf = spark.createDataFrame(
        [(0, "term1 shared"), (1, "word3 tail")], "query_id long, query string"
    )

    def probe(path):
        return sorted(map(tuple, RK.query_text_index(spark, path, qdf, k=5).collect()))

    want = probe(rebuilt)
    assert probe(live) == want
    # physical rows still present (no rewrite happened)
    assert (
        spark.read.parquet(f"{live}/postings").filter(F.col("doc_id") < 10).count() > 0
    )
    # idempotence: deleting the same ids again must not corrupt the sidecar
    RK.tombstone_delete(spark, live, gone)
    assert probe(live) == want
    d_live = sorted(map(tuple, RK.read_text_index(spark, rebuilt)[1].collect()))
    d_side = sorted(map(tuple, RK._split_sidecar(
        spark.read.parquet(f"{live}/sidecar"))[0].collect()))
    assert d_side == d_live
    # compaction: new generation, identical probes, rows physically gone
    RK.compact_text_index(spark, live, gen2)
    assert probe(gen2) == want
    assert (
        spark.read.parquet(f"{gen2}/postings").filter(F.col("doc_id") < 10).count() == 0
    )


def test_tombstone_delete_crash_repair(spark, docs, tmp_path):
    """r11 ADVICE (ranking.py tombstone_delete): a failure BETWEEN the
    tombstone append and the sidecar overwrite must self-repair on
    retry. Simulate the torn state by appending tombstone ids directly
    (probes honor them; the sidecar still counts the deleted docs),
    then retry the same delete: because the sidecar is recomputed from
    the FULL tombstone set — not by subtracting this call's
    already-anti-joined-away delta — the retry must converge to the
    rebuild-exact sidecar."""
    live, rebuilt = (str(tmp_path / x) for x in ("live", "rebuilt"))
    RK.write_text_index(docs, live)
    gone = docs.filter(F.col("doc_id") < 10).select("doc_id")
    # torn write: tombstones land, sidecar overwrite never happens
    gone.write.mode("append").parquet(f"{live}/tombstones")
    stale = sorted(map(tuple, spark.read.parquet(f"{live}/sidecar").collect()), key=repr)
    # retry the SAME delete (its delta anti-joins to empty)
    RK.tombstone_delete(spark, live, gone)
    repaired = sorted(map(tuple, spark.read.parquet(f"{live}/sidecar").collect()), key=repr)
    assert repaired != stale
    RK.write_text_index(docs.filter(F.col("doc_id") >= 10), rebuilt)
    want = sorted(map(tuple, spark.read.parquet(f"{rebuilt}/sidecar").collect()), key=repr)
    assert repaired == want


def test_append_crash_repair_via_sidecar_recompute(spark, docs, tmp_path):
    """r12 crash contract for append_text_index: simulate a failure
    between the delta-postings commit and the sidecar swap (postings
    hold old+delta, sidecar still counts only old), then call
    repair_text_index_sidecar — the store must converge to exactly the
    full-rebuild frames, and probes must match the rebuilt store."""
    inc, full = (str(tmp_path / x) for x in ("inc", "full"))
    old = docs.filter(F.col("doc_id") >= 10)
    delta = docs.filter(F.col("doc_id") < 10)
    RK.write_text_index(old, inc)
    # torn append: ONLY the delta postings commit (replicating
    # append_text_index's postings write verbatim), no sidecar swap
    p, _, _ = RK.build_text_index(delta, "text", "doc_id")
    (
        p.withColumn(
            "term_bucket",
            RK.term_bucket(F.col("term"), RK._postings_modulus(spark, inc)),
        )
        .repartition("term_bucket")
        .write.mode("append")
        .partitionBy("term_bucket")
        .parquet(f"{inc}/postings")
    )
    RK.repair_text_index_sidecar(spark, inc)
    RK.write_text_index(docs, full)
    got = _frames_sorted(*RK.read_text_index(spark, inc))
    want = _frames_sorted(*RK.read_text_index(spark, full))
    assert got == want
    qdf = spark.createDataFrame(
        [(0, "term1 shared"), (1, "word3 tail")], "query_id long, query string"
    )
    assert sorted(map(tuple, RK.query_text_index(spark, inc, qdf, k=5).collect())) == \
        sorted(map(tuple, RK.query_text_index(spark, full, qdf, k=5).collect()))

"""Round-6 additions: the dedup gate must hold ACROSS micro-batches
and across runs (ADVICE r5 medium — the accumulated signature store),
the stored-int8 IVF index must actually store bytes, and
upsert_points' prune-cap fallback must merge identically."""

from __future__ import annotations

import os

from pyspark.sql import functions as SF


def test_dedup_gate_holds_across_micro_batches(spark, sf_dir, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch of the same run
    (max_files_per_trigger=1 splits the backlog) is gated against the
    EARLIER batch's survivor via the accumulated signature store —
    without accumulation both copies would pass, since each batch would
    only see the static corpus index."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup_index as DI,
    )
    from rag_project_with_embeddings_and_vector_database_spark.streaming.ingest import (
        dedup_gated_ingest,
    )

    corpus = H._t(spark, sf_dir, "documents").select("doc_id", "text")
    index = DI.build_dedup_index(corpus)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    fresh = "entirely novel cross batch gating corpus content " * 6
    f1 = in_dir / "a_first.md"
    f2 = in_dir / "b_neardup.md"
    f1.write_text(fresh)
    f2.write_text(fresh + " trailing revision")
    # distinct mtimes so the file source drains them oldest-first in
    # two separate single-file batches (the assertion below is
    # order-independent anyway)
    now = f1.stat().st_mtime
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))

    vt_path = str(tmp_path / "vectors")
    q = dedup_gated_ingest(
        spark, str(in_dir), vt_path, str(tmp_path / "ckpt"),
        dedup_index=index, max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    srcs = {
        r.source_file.rsplit("/", 1)[-1]
        for r in spark.read.parquet(vt_path).select("source_file").collect()
    }
    assert len(srcs) == 1 and srcs <= {"a_first.md", "b_neardup.md"}, srcs

    # ...and across RUNS: a third near-copy arriving after a restart
    # (same checkpoint continues; only the new file is processed) is
    # gated against the signature store persisted by the first run
    f3 = in_dir / "c_neardup_later_run.md"
    f3.write_text(fresh + " second revision")
    q2 = dedup_gated_ingest(
        spark, str(in_dir), vt_path, str(tmp_path / "ckpt"),
        dedup_index=index, max_files_per_trigger=1,
    )
    q2.awaitTermination(300)
    srcs2 = {
        r.source_file.rsplit("/", 1)[-1]
        for r in spark.read.parquet(vt_path).select("source_file").collect()
    }
    assert srcs2 == srcs, srcs2


def test_ivf_stored_q8_is_tinyint(spark, sf_dir, tmp_path):
    """build_ivf_index(store_int8=True) materializes q8 as
    array<tinyint> (1 byte/element) — the stored form the 4x
    storage/bandwidth claim rests on (ADVICE r5) — and the byte-cast
    index still answers bit-identically through a parquet round-trip."""
    from pyspark.sql.types import ArrayType, ByteType

    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    e = H._t(spark, sf_dir, "embeddings")
    assigned, cdf = R.build_ivf_index(
        e, num_centroids=16, corpus_id="vec_id", seed=42, store_int8=True
    )
    assert assigned.schema["q8"].dataType == ArrayType(ByteType())
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(str(tmp_path / "a"))
    stored_type = spark.read.parquet(str(tmp_path / "a")).schema["q8"].dataType
    assert stored_type == ArrayType(ByteType())


def test_upsert_points_beyond_prune_cap(spark, tmp_path):
    """Past _MAX_PRUNE_COLLECTIONS distinct collections in one delta,
    upsert_points skips the pruning predicate and falls back to a
    full-table merge — the fallback must produce exactly the same
    table as the pruned path (correctness never depends on the cap)."""
    from rag_project_with_embeddings_and_vector_database_spark.operators.retrieval import (
        VectorTable,
    )

    def mk_table(path):
        base = spark.createDataFrame(
            [(s, m, i, f"old_{s}_{m}_{i}") for s in ("s1", "s2", "s3")
             for m in ("m1", "m2") for i in range(3)],
            "strategy string, model string, vec_id int, payload string",
        )
        vt = VectorTable(spark, path)
        vt.upsert(base)
        return vt

    delta = spark.createDataFrame(
        # 4 distinct collections: replace one point in each of three,
        # insert a brand-new point in a fresh collection
        [("s1", "m1", 0, "new"), ("s2", "m2", 1, "new"),
         ("s3", "m1", 2, "new"), ("s9", "m9", 7, "new")],
        "strategy string, model string, vec_id int, payload string",
    )

    vt_pruned = mk_table(str(tmp_path / "pruned"))
    vt_pruned.upsert_points(delta, key_col="vec_id")

    vt_capped = mk_table(str(tmp_path / "capped"))
    vt_capped._MAX_PRUNE_COLLECTIONS = 2  # 4 collections > cap -> full merge
    vt_capped.upsert_points(delta, key_col="vec_id")

    cols = ["strategy", "model", "vec_id", "payload"]
    a = sorted(tuple(r) for r in vt_pruned.read().select(*cols).collect())
    b = sorted(tuple(r) for r in vt_capped.read().select(*cols).collect())
    assert a == b
    assert ("s9", "m9", 7, "new") in a and ("s1", "m1", 0, "new") in a
    assert ("s1", "m1", 0, "old_s1_m1_0") not in a
    assert len(a) == 18 + 1  # 18 base rows, 3 replaced in place, 1 inserted


def test_pdf_tounicode_cmap_codecs():
    """The ToUnicode CMap parser handles bfchar pairs, bfrange with an
    incrementing base, bfrange with an explicit dst array, and
    multi-unit (ligature) destinations; CID decoding maps 2-byte codes
    and drops unmapped ones."""
    from rag_project_with_embeddings_and_vector_database_spark.sources.documents import (
        _pdf_cids_decode,
        _pdf_parse_tounicode,
    )

    cmap = _pdf_parse_tounicode(
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0003> <0020> <0010> <00660066> endbfchar\n"
        b"1 beginbfrange <0041> <0043> <0061> endbfrange\n"
        b"1 beginbfrange <0050> <0051> [<0058> <0059>] endbfrange\n"
    )
    assert cmap[0x0003] == " "
    assert cmap[0x0010] == "ff"  # multi-unit dst (ligature)
    assert cmap[0x0041] == "a" and cmap[0x0042] == "b" and cmap[0x0043] == "c"
    assert cmap[0x0050] == "X" and cmap[0x0051] == "Y"
    assert _pdf_cids_decode(b"\x00\x41\x00\x03\x00\x42\x99\x99", cmap) == "a b"


def test_pdf_per_font_hex_decoding():
    """Tf operators switch the active decoder mid-stream: hex shows
    decode latin-1 under a simple font, through the CMap under a
    composite font with ToUnicode, and are SKIPPED under a composite
    font without one — all in a single content stream."""
    from rag_project_with_embeddings_and_vector_database_spark.sources.documents import (
        _pdf_stream_texts,
    )

    fonts = {
        b"F1": "simple",
        b"C1": {0x0048: "H", 0x0069: "i"},  # toy CMap
        b"C2": None,  # Type0 without ToUnicode: undecodable
    }
    stream = (
        b"<< /Length 99 >>\nstream\n"
        b"BT /F1 10 Tf <4869> Tj /C1 10 Tf <00480069> Tj "
        b"/C2 10 Tf <00480069> Tj ET\n"
        b"endstream"
    )
    texts, cur = _pdf_stream_texts(stream, decode_hex=False, fonts=fonts)
    assert texts == ["Hi", "Hi"]  # C2's show skipped, not garbled
    assert cur is None  # font state carries out for the next segment
    # state threads across segments of the same page
    texts2, _ = _pdf_stream_texts(
        b"<< >>\nstream\nBT <00480069> Tj ET\nendstream",
        decode_hex=False,
        fonts=fonts,
        cur={0x0048: "H", 0x0069: "i"},
    )
    assert texts2 == ["Hi"]


def test_embedding_delta_matches_one_shot_over_union(spark, sf_dir):
    """The embedding incremental holds the same contract as the minhash
    and SimHash ones: embedding_delta against the stored corpus table
    equals the one-shot embedding_neardup_pairs over corpus-union-delta
    filtered to delta-touching pairs — while the corpus is never paired
    against itself (one broadcast-delta scan)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup as DD,
        dedup_index as DI,
    )

    e = H._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    delta = (
        e.filter(SF.col("vec_id") % 50 == 0)
        .select((SF.col("vec_id") + 1000000).alias("vec_id"), "embedding")
        .unionByName(
            e.filter(SF.col("vec_id") % 100 == 0).select(
                (SF.col("vec_id") + 2000000).alias("vec_id"), "embedding"
            )
        )
    )
    full = DD.embedding_neardup_pairs(
        e.unionByName(delta), threshold=0.9, normalized=True, gate="off"
    )
    expected = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in full.filter(
            (SF.col("id_a") >= 1000000) | (SF.col("id_b") >= 1000000)
        ).collect()
    )
    got = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in DI.embedding_delta(e, delta, threshold=0.9, normalized=True).collect()
    )
    assert got == expected
    assert any(a < 1000000 <= b for a, b, _ in got)   # new-vs-corpus pairs
    assert any(a >= 1000000 and b >= 2000000 for a, b, _ in got)  # new-vs-new pairs


def test_embedding_delta_gate_raises_on_unbounded_delta(spark):
    """The broadcast-delta gate: past max_delta_docs the call raises
    instead of silently planning an O(n^2) broadcast join."""
    import pytest as _pytest

    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup_index as DI,
    )

    big = spark.range(50).select(
        SF.col("id").alias("vec_id"),
        SF.array(SF.lit(1.0), SF.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="max_delta_docs"):
        DI.embedding_delta(big, big, max_delta_docs=10)


def test_text_index_upsert_equals_full_rebuild(spark, sf_dir):
    """Merging a new-doc batch into a stored BM25 index must produce
    EXACTLY the index a full rebuild over corpus-union-batch produces:
    postings and dfreq row-identical, stats bit-identical (avgdl is
    recombined from exact integer token totals, not from rounded
    averages)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        ranking as RK,
    )

    docs = H._t(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(SF.col("doc_id") >= 50)
    new = docs.filter(SF.col("doc_id") < 50)
    mp, md, ms = RK.text_index_upsert(*RK.build_text_index(old), new)
    fp, fd, fs = RK.build_text_index(docs)
    assert sorted(map(tuple, mp.collect())) == sorted(map(tuple, fp.collect()))
    assert sorted(map(tuple, md.collect())) == sorted(map(tuple, fd.collect()))
    m_row, f_row = ms.collect()[0], fs.collect()[0]
    assert (m_row.n_docs, m_row.sum_dl) == (f_row.n_docs, f_row.sum_dl)
    assert m_row.avgdl == f_row.avgdl  # bit-identical, not approximately


def test_ivf_index_append_matches_stored_assignments(spark, sf_dir):
    """Assigning vectors to STORED centroids (ivf_index_append) must
    reproduce KMeansModel.transform's assignment rule: appending the
    corpus's own vectors yields the stored bucket for every id."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    e = H._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, cdf = R.build_ivf_index(e, num_centroids=16, corpus_id="vec_id", seed=42)
    stored = {r.vec_id: r.bucket for r in assigned.collect()}
    appended = {
        r.vec_id: r.bucket
        for r in R.ivf_index_append(cdf, e, corpus_id="vec_id").collect()
    }
    assert appended == stored
    # int8 sidecar mirrors build_ivf_index's stored form
    with_q8 = R.ivf_index_append(cdf, e.limit(5), corpus_id="vec_id", store_int8=True)
    assert "q8" in with_q8.columns and "amax" in with_q8.columns


def test_compact_signature_store_roundtrip(spark, sf_dir, tmp_path):
    """Compaction collapses replay-appended duplicate rows, rewrites
    the store partitioned for probe pruning, and changes NOTHING about
    probe results (readers already dedup at read time)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup_index as DI,
    )

    corpus = H._t(spark, sf_dir, "documents").filter("doc_id < 40").select("doc_id", "text")
    idx = DI.build_dedup_index(corpus)
    path = str(tmp_path / "sigstore")
    idx.write.mode("append").parquet(path)
    idx.write.mode("append").parquet(path)  # simulated replay append
    raw_count = spark.read.parquet(path).count()
    delta = corpus.filter("doc_id < 5").select(
        (SF.col("doc_id") + 1000).alias("doc_id"),
        SF.concat(SF.col("text"), SF.lit(" rev")).alias("text"),
    )
    before = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in DI.dedup_delta(
            spark.read.parquet(path).dropDuplicates(["doc_id", "band"]), delta
        ).collect()
    )
    n = DI.compact_signature_store(spark, path)
    assert n == raw_count // 2  # duplicates collapsed
    # pruned layout: band + bounded sig_bucket partition directories
    band0 = tmp_path / "sigstore" / "band=0"
    assert band0.exists() and any(p.name.startswith("sig_bucket=") for p in band0.iterdir())
    after = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in DI.dedup_delta(
            spark.read.parquet(path).drop("sig_bucket"), delta
        ).collect()
    )
    assert after == before and before


def test_compact_signature_store_new_generation(spark, sf_dir, tmp_path):
    """dest_path writes a NEW table generation (the compact_text_index
    pointer-swap crash shape): the source store's bytes are untouched,
    the new generation is the compacted pruned layout with its own
    metadata sidecar, and probes against it match probes against the
    deduped source exactly."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup_index as DI,
    )

    corpus = H._t(spark, sf_dir, "documents").filter("doc_id < 40").select("doc_id", "text")
    idx = DI.build_dedup_index(corpus)
    src = str(tmp_path / "gen0")
    idx.write.mode("append").parquet(src)
    idx.write.mode("append").parquet(src)  # simulated replay append
    src_files = sorted(
        p.name for p in (tmp_path / "gen0").iterdir() if p.suffix == ".parquet"
    )
    dest = str(tmp_path / "gen1")
    n = DI.compact_signature_store(spark, src, dest_path=dest)
    # source generation untouched (same files, duplicates still there)
    assert sorted(
        p.name for p in (tmp_path / "gen0").iterdir() if p.suffix == ".parquet"
    ) == src_files
    assert spark.read.parquet(src).count() == 2 * n
    # new generation: pruned layout + adopted metadata sidecar
    band0 = tmp_path / "gen1" / "band=0"
    assert band0.exists() and any(p.name.startswith("sig_bucket=") for p in band0.iterdir())
    # r14: the modulus is auto-sized to the compacted row count (the
    # small-files discipline) and recorded for probes to adopt
    assert DI.read_store_meta(spark, dest)["bucket_modulus"] == DI.auto_modulus(n)
    delta = corpus.filter("doc_id < 5").select(
        (SF.col("doc_id") + 1000).alias("doc_id"),
        SF.concat(SF.col("text"), SF.lit(" rev")).alias("text"),
    )
    src_pairs = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in DI.dedup_delta(
            spark.read.parquet(src).dropDuplicates(["doc_id", "band"]), delta
        ).collect()
    )
    gen1_pairs = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in DI.dedup_delta(
            spark.read.parquet(dest).drop("sig_bucket"), delta
        ).collect()
    )
    assert gen1_pairs == src_pairs and src_pairs


def test_multimodal_udf_values_pinned_to_recompute(spark):
    """The multimodal mapInPandas stubs are VALUE-pinned, not just
    shape-checked: frame ids and fake-decode features are recomputed
    directly from the payload bytes in the test and must match the
    distributed output element-for-element — the same cross-engine
    discipline the hash embedder gets from embed_values."""
    import hashlib

    import numpy as np

    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        multimodal as MM,
    )

    df = spark.createDataFrame(
        [("v1", "video-bytes"), ("v2", "other-payload")], ["id", "payload"]
    )
    frames = MM.sample_frames(
        MM.to_media(df, "id", "payload", "video", "video/fake"),
        every_n=5, max_frames=3,
    ).collect()
    expected = {
        (mid, i * 5): hashlib.sha256(
            payload.encode() + i.to_bytes(4, "big")
        ).hexdigest()[:16]
        for mid, payload in [("v1", "video-bytes"), ("v2", "other-payload")]
        for i in range(3)
    }
    assert {(f.media_id, f.frame_no): f.frame_sha for f in frames} == expected

    feats = MM.image_features(
        MM.to_media(df, "id", "payload", "image", "image/fake")
    ).collect()
    by_id = {r.media_id: r.features for r in feats}
    for mid, payload in [("v1", "video-bytes"), ("v2", "other-payload")]:
        h = hashlib.sha256(payload.encode()).digest()
        seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        want = (np.tile(seed, 3)[: 32 * 3] / 255.0).tolist()
        got = by_id[mid]
        assert len(got) == 96
        assert all(abs(a - b) < 1e-7 for a, b in zip(got, want))


def test_ivf_append_then_query_matches_full_assignment(spark, sf_dir, tmp_path):
    """E2E for index growth: build the IVF index over HALF the corpus,
    append the other half via ivf_index_append (frozen centroids,
    through a parquet append into the bucket-partitioned layout), and
    query the merged index — results must be identical to querying an
    index where ALL vectors were assigned to those same centroids,
    because append-assignment is exactly the transform rule."""
    from pyspark.sql import functions as F

    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    e = H._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    half = e.filter(F.col("vec_id") % 2 == 0)
    rest = e.filter(F.col("vec_id") % 2 == 1)
    assigned, cdf = R.build_ivf_index(half, num_centroids=8, corpus_id="vec_id", seed=42)
    path = str(tmp_path / "ivf")
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/assigned")
    cdf.write.mode("overwrite").parquet(f"{path}/centroids")
    # daily growth: assign new vectors to the stored centroids, append
    R.ivf_index_append(
        spark.read.parquet(f"{path}/centroids"), rest, corpus_id="vec_id"
    ).write.mode("append").partitionBy("bucket").parquet(f"{path}/assigned")

    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    got = R.knn_ivf_indexed(
        spark.read.parquet(f"{path}/assigned"),
        spark.read.parquet(f"{path}/centroids"),
        q, 10, nprobe=6, corpus_id="vec_id",
    )
    # reference: every vector assigned to the same frozen centroids in
    # one shot (ivf_index_append over the full corpus — already pinned
    # to the KMeans transform rule by its own test)
    ref_assigned = R.ivf_index_append(cdf, e, corpus_id="vec_id")
    want = R.knn_ivf_indexed(ref_assigned, cdf, q, 10, nprobe=6, corpus_id="vec_id")
    a = sorted((r.query_id, r.vec_id, r.score, r.rank) for r in got.collect())
    b = sorted((r.query_id, r.vec_id, r.score, r.rank) for r in want.collect())
    assert a == b and len(a) == 50


def test_text_index_delete_equals_rebuild_over_remaining(spark, sf_dir):
    """Deleting documents from a stored BM25 index must produce exactly
    the index a rebuild over the remaining corpus produces — postings
    and dfreq row-identical (terms dropping to df=0 vanish), stats
    bit-identical from exact integer subtraction. Delete + upsert
    composes to document UPDATE."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        ranking as RK,
    )

    docs = H._t(spark, sf_dir, "documents").select("doc_id", "text")
    full = RK.build_text_index(docs)
    gone = docs.filter(SF.col("doc_id") < 50).select("doc_id")
    dp, dd, ds = RK.text_index_delete(*full, gone)
    rp, rd, rs = RK.build_text_index(docs.filter(SF.col("doc_id") >= 50))
    assert sorted(map(tuple, dp.collect())) == sorted(map(tuple, rp.collect()))
    assert sorted(map(tuple, dd.collect())) == sorted(map(tuple, rd.collect()))
    d_row, r_row = ds.collect()[0], rs.collect()[0]
    assert (d_row.n_docs, d_row.sum_dl) == (r_row.n_docs, r_row.sum_dl)
    assert d_row.avgdl == r_row.avgdl
    # update = delete + upsert round-trips to the original full index
    up, ud, us = RK.text_index_upsert(dp, dd, ds, docs.filter(SF.col("doc_id") < 50))
    fp, fd, fs = full
    assert sorted(map(tuple, up.collect())) == sorted(map(tuple, fp.collect()))
    assert sorted(map(tuple, ud.collect())) == sorted(map(tuple, fd.collect()))
    u_row, f_row = us.collect()[0], fs.collect()[0]
    assert (u_row.n_docs, u_row.sum_dl, u_row.avgdl) == (f_row.n_docs, f_row.sum_dl, f_row.avgdl)
    # deleting everything matches the empty-corpus build shape
    ep, ed, es = RK.text_index_delete(*full, docs.select("doc_id"))
    assert ep.count() == 0 and ed.count() == 0
    e_row = es.collect()[0]
    assert e_row.n_docs == 0.0 and e_row.sum_dl is None and e_row.avgdl is None


def test_late_r6_registrations_self_validate(spark, sf_dir):
    """The three late-r6 maintenance registrations hold their contracts
    as driver queries: ann_ivf_append's recall flags are all true
    (frozen half-corpus centroids still answer for the full corpus at
    the tuned nprobe), dedup_store_compact's self-gates pass (it raises
    otherwise; the returned row re-states them), and
    bm25_indexed_delete matches the one-pass bm25_topk over only the
    remaining corpus — the pytest twin of its rebuild-over-remaining
    oracle."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        ranking as RK,
    )

    rows = H.SPARK_QUERIES["ann_ivf_append"](spark, sf_dir).collect()
    assert rows and all(r.recall_floor_met for r in rows), rows

    # r14: returns the post-compaction probe pairs themselves (the
    # oracled output); the before==after pair-set identity and the
    # n_raw == 2*n_compacted size halving are in-query RAISEs.
    pairs = H.SPARK_QUERIES["dedup_store_compact"](spark, sf_dir).collect()
    assert pairs and all(p.id_a < p.id_b and 0.0 < p.est_jaccard <= 1.0 for p in pairs)

    got = sorted(
        map(tuple, H.SPARK_QUERIES["bm25_indexed_delete"](spark, sf_dir).collect())
    )
    remaining = (
        H._t(spark, sf_dir, "documents").filter(SF.col("doc_id") >= 50)
    )
    want = sorted(
        map(
            tuple,
            RK.bm25_topk(
                remaining, H._bm25_qdf(spark), k=10, k1=H._BM25_K1, b=H._BM25_B
            ).collect(),
        )
    )
    assert got == want and got


def test_duplicate_spans_and_strip(spark, sf_dir):
    """Substring-level dedup on a hand-built corpus: a boilerplate run
    pasted into two otherwise-distinct docs is found as one merged
    span in each (overlapping k-grams coalesce), a doc shorter than k
    never errors or matches, and stripping removes exactly the marked
    tokens — after the strip, NO k-gram is shared across documents and
    untouched docs round-trip verbatim."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup as DD,
    )

    boiler = "all rights reserved contact us for terms of service today"  # 10 toks
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {boiler} delta epsilon"),
            (2, f"{boiler} zeta eta theta iota kappa xi"),
            (3, "completely unrelated text about spark partitions and shuffles"),
            (4, "tiny doc"),  # shorter than k
        ],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_id): (r.span_start, r.span_end, r.n_tokens)
        for r in DD.duplicate_spans(docs, k=8).collect()
    }
    # the 10-token boilerplate yields three overlapping 8-gram hits
    # that must merge into ONE maximal span per doc at its position
    assert spans == {1: (3, 12, 10), 2: (0, 9, 10)}

    stripped = DD.strip_duplicate_spans(docs, DD.duplicate_spans(docs, k=8))
    out = {r.doc_id: r.text for r in stripped.collect()}
    assert out[1] == "alpha beta gamma delta epsilon"
    assert out[2] == "zeta eta theta iota kappa xi"
    assert out[3] == "completely unrelated text about spark partitions and shuffles"
    assert out[4] == "tiny doc"
    assert DD.duplicate_spans(stripped, k=8).count() == 0


def test_pq_family_contracts(spark, sf_dir):
    """Product quantization: codebooks are the full m x k grid, encode
    emits one bounded tinyint per subspace as a deterministic
    scan-local projection (re-encoding is bit-identical), and the
    registered ann_pq query meets the recall floor on every row."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    e = H._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = R.build_pq_codebooks(e, num_subspaces=16, num_codes=16)
    grid = {(r.subspace, r.code) for r in cb.collect()}
    assert grid == {(s, c) for s in range(16) for c in range(16)}
    assert all(len(r.centroid) == 4 for r in cb.collect())

    enc = R.pq_encode(e, cb)
    assert dict(enc.dtypes)["pq_codes"] == "array<tinyint>"
    first = {r.vec_id: list(r.pq_codes) for r in enc.collect()}
    again = {r.vec_id: list(r.pq_codes) for r in R.pq_encode(e, cb).collect()}
    assert first == again and len(first) == e.count()
    assert all(
        len(cs) == 16 and all(0 <= c < 16 for c in cs) for cs in first.values()
    )

    rows = H.SPARK_QUERIES["ann_pq"](spark, sf_dir).collect()
    assert rows and all(r.recall_floor_met for r in rows), rows


def test_mixture_sample_contracts(spark, sf_dir):
    """Domain mixing: exact method hits the clamped per-domain targets
    precisely; undersupplied domains yield their whole supply with no
    silent redistribution; unweighted domains drop; the scan-local
    threshold variant's counts land within binomial wobble of target
    and its membership is a deterministic function of the permanent
    hash (identical across invocations)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        mixing as MX,
    )

    d = H._t(spark, sf_dir, "documents").select("lang", "doc_id")
    supply = {r.lang: r.n for r in d.groupBy("lang").agg(SF.count("*").alias("n")).collect()}

    # oversupplied + undersupplied + absent domains in one weights map:
    # zh gets a target far above its supply -> clamps to supply
    weights = {"en": 0.2, "zh": 0.8}
    total = 400
    out = MX.mixture_sample(d, "lang", weights, total)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(SF.count("*").alias("n")).collect()}
    assert got == {"en": 80, "zh": min(320, supply["zh"])}
    assert supply["zh"] < 320  # the clamp actually engaged on this corpus

    th = MX.mixture_sample(d, "lang", weights, total, method="threshold")
    c1 = sorted((r.lang, r.doc_id) for r in th.collect())
    c2 = sorted(
        (r.lang, r.doc_id)
        for r in MX.mixture_sample(d, "lang", weights, total, method="threshold").collect()
    )
    assert c1 == c2  # permanent-hash membership, not rand()
    n_en = sum(1 for lang, _ in c1 if lang == "en")
    assert abs(n_en - 80) <= 25  # binomial wobble around the target
    assert {lang for lang, _ in c1} <= {"en", "zh"}


def test_vector_arrival_ingest_grows_stored_ivf_index(spark, sf_dir, tmp_path):
    """Streaming IVF growth: build the index offline over half the
    corpus, stream the other half in two micro-batches
    (maxFilesPerTrigger=1), and the grown stored index must answer
    queries identically to a one-shot assignment of ALL vectors to the
    same frozen centroids — the streaming path changes delivery, never
    results."""
    from pyspark.sql import functions as F

    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )
    from rag_project_with_embeddings_and_vector_database_spark.streaming.ingest import (
        vector_arrival_ingest,
    )

    e = H._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    half = e.filter(F.col("vec_id") % 2 == 0)
    rest = e.filter(F.col("vec_id") % 2 == 1)
    assigned, cdf = R.build_ivf_index(half, num_centroids=8, corpus_id="vec_id", seed=42)
    idx = str(tmp_path / "ivf")
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(f"{idx}/assigned")
    cdf.write.mode("overwrite").parquet(f"{idx}/centroids")

    # arrivals land as two files -> two micro-batches
    arr = str(tmp_path / "arrivals")
    rest.filter(F.col("vec_id") % 4 == 1).coalesce(1).write.mode("append").parquet(arr)
    rest.filter(F.col("vec_id") % 4 == 3).coalesce(1).write.mode("append").parquet(arr)
    q = vector_arrival_ingest(
        spark, arr, idx, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination()

    # the documented read path: read_ivf_index owns the replay-dedup
    # contract (dropDuplicates on the id) so readers can't forget it
    from rag_project_with_embeddings_and_vector_database_spark.streaming.ingest import (
        read_ivf_index,
    )

    grown, stored_cdf = read_ivf_index(spark, idx, id_col="vec_id")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = R.knn_ivf_indexed(
        grown, stored_cdf, queries, 10,
        nprobe=6, corpus_id="vec_id",
    )
    want = R.knn_ivf_indexed(
        R.ivf_index_append(cdf, e, corpus_id="vec_id"), cdf, queries, 10,
        nprobe=6, corpus_id="vec_id",
    )
    a = sorted((r.query_id, r.vec_id, r.score, r.rank) for r in got.collect())
    b = sorted((r.query_id, r.vec_id, r.score, r.rank) for r in want.collect())
    assert a == b and len(a) == 50

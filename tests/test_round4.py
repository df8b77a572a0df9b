"""Round-4 additions: scoped pair-generator caches, gate escape hatch,
typed packing schema, ANN recall floor flags, the composed dedup_full
pipeline, quantized retrieval, and the vendored-PDF parse path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import dedup as DD


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_pair_generator_cache_is_scoped(spark):
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some text body number "), F.col("id")).alias("text"),
    )
    DD.release_caches()
    base = _n_persisted(spark)
    DD.minhash_lsh_pairs(docs).count()
    DD.minhash_lsh_pairs(docs.filter("doc_id < 20")).count()
    DD.minhash_lsh_pairs(docs.filter("doc_id < 10")).count()
    # repeated calls swap, never accumulate: at most ONE cached frame
    assert _n_persisted(spark) <= base + 1
    DD.simhash_pairs(docs).count()
    assert _n_persisted(spark) <= base + 2  # one per generator
    DD.release_caches()
    assert _n_persisted(spark) <= base


def test_gate_off_skips_eager_probe(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text "), F.col("id")).alias("text")
    )
    # eager gate raises at CONSTRUCTION time above max_docs...
    with pytest.raises(ValueError, match="max_docs"):
        DD.ngram_jaccard_pairs(docs, max_docs=10)
    # ...gate='off' builds the plan without any Spark action; the caller
    # owns the bound (here we execute it on a small side to prove the
    # plan itself is sound)
    out = DD.ngram_jaccard_pairs(docs.filter("doc_id < 5"), max_docs=10, gate="off")
    assert out.count() == 10
    vecs = spark.range(50).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0), F.lit(0.0)).alias("embedding")
    )
    with pytest.raises(ValueError, match="max_probe_docs"):
        DD.embedding_neardup_pairs(vecs, max_probe_docs=10)
    out = DD.embedding_neardup_pairs(
        vecs, max_probe_docs=10, gate="off", normalized=True, threshold=0.5
    )
    assert out.count() > 0
    with pytest.raises(ValueError, match="gate must be"):
        DD.ngram_jaccard_pairs(docs, gate="lazy")


def test_sequence_pack_string_ids(spark):
    from rag_project_with_embeddings_and_vector_database_spark.operators.packing import (
        sequence_pack,
    )

    docs = spark.range(60).select(
        F.concat(F.lit("doc-"), F.format_string("%03d", F.col("id"))).alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 20 + 1).cast("int"))).alias(
            "text"
        ),
    )
    out = sequence_pack(docs, budget_tokens=30, n_buckets=4).collect()
    assert len(out) == 60
    assert all(isinstance(r.doc_id, str) for r in out)  # id type preserved, not miscast
    from collections import defaultdict

    seq_tokens, seq_sizes = defaultdict(int), defaultdict(int)
    for r in out:
        seq_tokens[(r.bucket, r.seq_id)] += r.doc_tokens
        seq_sizes[(r.bucket, r.seq_id)] += 1
    for k, tot in seq_tokens.items():
        assert tot <= 30 or seq_sizes[k] == 1


def test_ann_recall_floor_flags_true(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    for name in ("ann_lsh", "ann_ivf", "ann_ivf_quantized"):
        rows = H.SPARK_QUERIES[name](spark, sf_dir).collect()
        assert rows, name
        assert all(r.recall_floor_met for r in rows), (name, rows)


def test_dedup_full_collapses_planted_duplicates(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    rows = {r.doc_id: r for r in H.SPARK_QUERIES["dedup_full"](spark, sf_dir).collect()}
    base_ids = [i for i in rows if i < 1000]
    copies = [i for i in rows if 1000 <= i < 2000]
    mutants = [i for i in rows if i >= 2000]
    assert len(base_ids) == len(copies) == len(mutants) == 30
    # base docs may themselves be near-dups of each other (the corpus is
    # synthetic), so the invariant is: every planted COPY (true Jaccard
    # ~0.9) lands in the SAME component as its base (never its own),
    # hence is dropped, and every component label is a base id.
    for pid in copies:
        assert rows[pid].component == rows[pid - 1000].component, rows[pid]
        assert not rows[pid].kept
    assert all(rows[b].component < 1000 for b in base_ids)
    kept_base = [b for b in base_ids if rows[b].kept]
    assert kept_base and all(rows[b].component == b for b in kept_base)
    # the planted partial-overlap MUTANTS (true Jaccard < 0.5 for all
    # but boundary-length docs) band-collide but must be killed by the
    # exact-Jaccard verification stage — without it nearly every mutant
    # would collapse into its base component (they share a band and
    # pass the 0.25 estimate floor)
    kept_mut = [m for m in mutants if rows[m].kept]
    assert len(kept_mut) >= int(0.8 * len(mutants)), (
        f"verification failed to protect mutants: only {len(kept_mut)}/"
        f"{len(mutants)} kept"
    )


def test_quantized_retrieval_matches_exact_topk(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    rows = H.SPARK_QUERIES["topk_retrieval_quantized"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(len(v) for v in by_q.values()) == {10}
    # int8 coarse top-50 + rescore should recover essentially the whole
    # exact top-10 at this scale
    frac_exact = sum(r.in_exact_topk for r in rows) / len(rows)
    assert frac_exact >= 0.9, frac_exact


def test_pdf_minimal_parser_envelope():
    from rag_project_with_embeddings_and_vector_database_spark.harness import (
        _FIXTURE_PDF_TEXT,
        _fixture_pdf_bytes,
    )
    from rag_project_with_embeddings_and_vector_database_spark.sources.documents import (
        _pdf_text_minimal,
    )

    assert _pdf_text_minimal(_fixture_pdf_bytes()) == _FIXTURE_PDF_TEXT
    # multi-page and non-PDF inputs refuse rather than partially extract
    with pytest.raises(NotImplementedError, match="one page"):
        _pdf_text_minimal(
            b"%PDF-1.4\n1 0 obj << /Type /Page >> endobj 2 0 obj << /Type /Page >> endobj"
        )
    with pytest.raises(NotImplementedError, match="header"):
        _pdf_text_minimal(b"not a pdf")
    # FlateDecode streams inflate via stdlib zlib
    import zlib

    stream = b"BT (compressed \\(ok\\)) Tj ET"
    comp = zlib.compress(stream)
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Type /Page >> endobj\n"
        b"2 0 obj << /Length " + str(len(comp)).encode() + b" /Filter /FlateDecode >>\n"
        b"stream\n" + comp + b"\nendstream endobj\n"
    )
    assert _pdf_text_minimal(pdf) == "--- Page 1 ---\ncompressed (ok)"


def test_scan_docs_parses_all_vendored_binaries(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    rows = H.SPARK_QUERIES["scan_docs"](spark, sf_dir).collect()
    exts = sorted(r.ext for r in rows)
    assert exts == ["docx", "md", "md", "md", "pdf", "pptx", "xlsx"]
    expected = {
        "pdf": H._FIXTURE_PDF_TEXT,
        "docx": H._FIXTURE_DOCX_TEXT,
        "xlsx": H._FIXTURE_XLSX_TEXT,
        "pptx": H._FIXTURE_PPTX_TEXT,
    }
    for ext, text in expected.items():
        row = next(r for r in rows if r.ext == ext)
        assert row.content == text and row.error is None, (ext, row)


def test_office_minimal_parsers_roundtrip_and_envelope():
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.sources.documents import (
        _docx_text_minimal,
        _pptx_text_minimal,
        _xlsx_text_minimal,
    )

    assert _docx_text_minimal(H._fixture_docx_bytes()) == H._FIXTURE_DOCX_TEXT
    assert _xlsx_text_minimal(H._fixture_xlsx_bytes()) == H._FIXTURE_XLSX_TEXT
    assert _pptx_text_minimal(H._fixture_pptx_bytes()) == H._FIXTURE_PPTX_TEXT
    # deterministic bytes (pinned zip timestamps) — fixture fingerprints
    # and oracle size literals cannot drift
    assert H._fixture_docx_bytes() == H._fixture_docx_bytes()
    # non-zip and missing-part payloads refuse instead of garbage
    for fn in (_docx_text_minimal, _xlsx_text_minimal, _pptx_text_minimal):
        with pytest.raises(NotImplementedError, match="OPC zip"):
            fn(b"junk bytes, not a zip")
    with pytest.raises(NotImplementedError, match="missing part"):
        _docx_text_minimal(H._fixture_xlsx_bytes())  # xlsx fed to docx parser


def test_quality_filter_verdict_composition(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    rows = H.SPARK_QUERIES["quality_filter"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs  # exactly one verdict per doc
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped  # thresholds produce a real mix
    # the verdict is exactly the conjunction of its components
    for r in rows:
        expect = (
            r.quality >= 0.5
            and r.lang_pred != "und"
            and r.dup_line_frac <= 0.3
            and r.top_2gram_frac <= 0.2
            and not r.has_pii
        )
        assert r.keep == expect, r


def test_corpus_prep_composes_quality_then_dedup(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    prep = {r.doc_id: r for r in H.SPARK_QUERIES["corpus_prep"](spark, sf_dir).collect()}
    qf = {r.doc_id: r.keep for r in H.SPARK_QUERIES["quality_filter"](spark, sf_dir).collect()}
    assert set(prep) == set(qf)  # one verdict per doc
    for doc_id, r in prep.items():
        assert r.kept_quality == qf[doc_id]
        if not r.kept_quality:
            # quality-dropped docs never reach dedup: no component
            assert r.component is None and not r.kept
        else:
            assert r.component is not None and r.component <= doc_id
            assert r.kept == (r.component == doc_id)
    # dedup dropped at least nothing or more; never more kept than quality-kept
    assert sum(r.kept for r in prep.values()) <= sum(qf.values())


def test_bm25_ranking_sane(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    rows = H.SPARK_QUERIES["bm25_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for hits in by_q.values():
        hits.sort(key=lambda r: r.rank)
        scores = [r.score for r in hits]
        assert scores == sorted(scores, reverse=True)  # rank follows score
        assert all(s > 0 for s in scores)


def test_streaming_parity_emits_ok(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    # r14: the query now RETURNS the drained window rows (its oracled
    # output) instead of a summary row; stream-vs-batch parity is an
    # in-query RAISE, so reaching the assert already proves it held.
    rows = H.SPARK_QUERIES["stream_windowed_counts"](spark, sf_dir).collect()
    assert rows and all(r.n > 0 for r in rows)
    assert all(
        (r.window_end - r.window_start).total_seconds() == 3600 for r in rows
    )


def test_stream_dedup_parity_emits_ok(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    # r14: returns the deduped (event_id, ts) rows themselves; the
    # stream==batch-distinct parity is an in-query RAISE.
    rows = H.SPARK_QUERIES["stream_dedup"](spark, sf_dir).collect()
    assert rows
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))  # keyed dedup: one row per key


def test_upsert_points_merges_by_key_within_collection(spark, tmp_path):
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    vt = R.VectorTable(spark, str(tmp_path / "vt"))
    base = spark.createDataFrame(
        [("s", m, i, "v1") for m in ("mA", "mB") for i in range(10)],
        "strategy string, model string, vec_id long, tag string",
    )
    vt.upsert(base)
    # delta touches ONLY collection (s, mA): replaces ids 5..9, adds 10..12
    delta = spark.createDataFrame(
        [("s", "mA", i, "v2") for i in range(5, 13)],
        "strategy string, model string, vec_id long, tag string",
    )
    vt.upsert_points(delta, key_col="vec_id")
    rows = {(r.model, r.vec_id): r.tag for r in vt.read().collect()}
    # untouched collection intact
    assert all(rows[("mB", i)] == "v1" for i in range(10))
    assert sum(1 for m, _ in rows if m == "mB") == 10
    # merged collection: 0..4 keep v1, 5..12 carry v2, no duplicates
    assert sum(1 for m, _ in rows if m == "mA") == 13
    assert all(rows[("mA", i)] == "v1" for i in range(5))
    assert all(rows[("mA", i)] == "v2" for i in range(5, 13))


def test_bm25_indexed_split_matches_one_pass(spark, sf_dir, tmp_path):
    """The index-then-query split (build_text_index + bm25_query_indexed)
    must reproduce the one-pass bm25_topk bit-for-bit, INCLUDING a
    parquet round-trip of the index tables (the 100 TB shape: the index
    is written once, queried many times)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        ranking as RK,
    )

    docs = H._par(H._t(spark, sf_dir, "documents"))
    postings, dfreq, stats = RK.build_text_index(docs)
    for name, df in (("postings", postings), ("dfreq", dfreq), ("stats", stats)):
        df.write.mode("overwrite").parquet(str(tmp_path / name))
    stored = {n: spark.read.parquet(str(tmp_path / n)) for n in ("postings", "dfreq", "stats")}
    got = RK.bm25_query_indexed(
        stored["postings"], stored["dfreq"], stored["stats"],
        H._bm25_qdf(spark), k=10, k1=H._BM25_K1, b=H._BM25_B,
    )
    want = H.SPARK_QUERIES["bm25_topk"](spark, sf_dir)
    key = lambda r: (r.query_id, r.rank)
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_ivf_indexed_split_matches_composition(spark, sf_dir, tmp_path):
    """knn_ivf == build_ivf_index + knn_ivf_indexed, and the stored form
    of the index (parquet round-trip) answers identically to the
    in-memory form — the refresh-offline / query-online contract."""
    from pyspark.sql import functions as F

    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    e = H._t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    assigned, cdf = R.build_ivf_index(e, num_centroids=8, corpus_id="vec_id", seed=42)
    assigned.write.mode("overwrite").parquet(str(tmp_path / "assigned"))
    cdf.write.mode("overwrite").parquet(str(tmp_path / "centroids"))
    stored_assigned = spark.read.parquet(str(tmp_path / "assigned"))
    stored_cdf = spark.read.parquet(str(tmp_path / "centroids"))
    key = lambda r: (r.query_id, r.rank)
    mem = sorted(
        R.knn_ivf_indexed(assigned, cdf, q, 10, nprobe=3, corpus_id="vec_id").collect(), key=key
    )
    stored = sorted(
        R.knn_ivf_indexed(stored_assigned, stored_cdf, q, 10, nprobe=3, corpus_id="vec_id").collect(),
        key=key,
    )
    assert mem == stored and len(mem) == 50


def test_pdf_paged_extraction_on_reference_corpus():
    """The multi-page stdlib PDF walker extracts REAL text (page
    markers + literal-string shows) from the reference checkout's own
    financial PDFs, and declines (-> documented stub) on the
    image-only scans rather than emitting garbage."""
    import glob

    import pytest as _pytest

    from rag_project_with_embeddings_and_vector_database_spark.sources.documents import (
        _pdf_text_paged,
    )

    files = sorted(glob.glob("/root/reference/projects/**/*.pdf", recursive=True))
    if not files:
        _pytest.skip("reference corpus not present")
    parsed = {}
    declined = 0
    for f in files:
        try:
            parsed[f] = _pdf_text_paged(open(f, "rb").read())
        except NotImplementedError:
            declined += 1
    assert len(parsed) >= 11  # every text-layer PDF in this checkout
    # (the declined remainder are image-only scans with no text operators)
    assert declined + len(parsed) == len(files)
    sample = next(iter(parsed.values()))
    assert sample.startswith("--- Page 1 ---")
    # multi-page marker structure follows the reference's join format
    multi = [t for t in parsed.values() if "--- Page 2 ---" in t]
    assert multi, "expected at least one multi-page extraction"


def test_bm25_matches_pure_python_recompute(spark):
    """Engine-independent BM25 check: a 4-doc corpus scored by a direct
    Python implementation of the Robertson +1-smoothed formula must
    match operators/ranking.bm25_topk exactly (after the same 6-decimal
    rounding). Guards the formula itself, independent of the DuckDB
    oracle (which shares SQL-level structure with the Spark plan)."""
    import math

    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        ranking as RK,
    )

    corpus = {
        1: "spark shuffles data across the cluster",
        2: "spark caches hot data in memory memory memory",
        3: "duckdb runs vectorized queries on one node",
        4: "the cluster runs spark and duckdb side by side",
    }
    query = "spark cluster memory"
    k1, b = 1.2, 0.75
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    expected = {}
    for i, words in toks.items():
        s = 0.0
        for term in set(query.split()):
            tf = words.count(term)
            if tf == 0:
                continue
            df = sum(1 for w in toks.values() if term in w)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(words) / avgdl))
        if s:
            expected[i] = round(s, 6)

    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    qdf = spark.createDataFrame([(0, query)], "query_id long, query string")
    got = {r.doc_id: r.score for r in RK.bm25_topk(docs, qdf, k=10, k1=k1, b=b).collect()}
    assert got == expected
    # rank order: deterministic desc-score with doc_id tie-break
    ranks = [r.doc_id for r in sorted(
        RK.bm25_topk(docs, qdf, k=10, k1=k1, b=b).collect(), key=lambda r: r.rank)]
    assert ranks == [i for i, _ in sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))]


def test_st_backend_code_path_with_injected_library(spark):
    """Exercise the REAL sentence-transformers backend branch of
    embed() — per-partition model construction, vectorized batch
    encode with normalize_embeddings, float32 conversion — by shipping
    a deterministic mock sentence_transformers module to the executors
    with addPyFile. Only the vendor's weights remain untested (the
    library cannot be installed here; README 'Environment
    constraints')."""
    import math
    import os

    from pyspark.sql import functions as F

    from rag_project_with_embeddings_and_vector_database_spark.operators.embedding import (
        embed,
    )

    fake = os.path.join(
        os.path.dirname(__file__), "fake_modules", "sentence_transformers.py"
    )
    spark.sparkContext.addPyFile(fake)
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id")).alias("content"),
    )
    out = embed(docs, "all-MiniLM-L6-v2", backend="sentence-transformers").collect()
    assert len(out) == 40
    for r in out:
        norm = math.sqrt(sum(x * x for x in r.embedding))
        assert abs(norm - 1.0) < 1e-5
        assert len(r.embedding) == 8
    # deterministic across runs, and model identity reaches the encoder
    again = embed(docs, "all-MiniLM-L6-v2", backend="sentence-transformers").collect()
    assert [r.embedding for r in again] == [r.embedding for r in out]
    other = embed(docs, "e5-base-v2", backend="sentence-transformers").collect()
    assert [r.embedding for r in other] != [r.embedding for r in out]

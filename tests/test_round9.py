"""Round-9 pins: the one-shot pair generators share the adaptive
occupancy guard (windowed form on their shuffle-join paths), the probe
helpers' partition discovery is batched (O(bands) driver RPCs) with
modulus validation across ALL band directories, the bounded-delta
contract fails fast, and the SemDeDup incremental twin is
value-identical to the one-shot replay over corpus-union-delta."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    dedup as DD,
)
from rag_project_with_embeddings_and_vector_database_spark.operators import (
    dedup_index as DI,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def delta(corpus):
    return corpus.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" probe rev")).alias("text"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_oneshot_generators_use_windowed_guard(spark, corpus):
    """VERDICT r8 item 2: the one-shot self-join paths now run the
    windowed occupancy guard — whose exchange IS the self-join's
    exchange — instead of the two-exchange groupBy + anti-join form.
    max_bucket_size=5 engages the guard for real on this corpus."""
    import re

    small = corpus.filter(F.col("doc_id") < 60)
    for pairs in (
        DD.minhash_lsh_pairs(small, max_bucket_size=5),
        DD.simhash_pairs(small, max_bucket_size=5),
    ):
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"\bWindow\b", plan), "windowed guard missing"
        assert "LeftAnti" not in plan, "old anti-join guard still planned"
    DD.release_caches()


def test_windowed_guard_keeps_same_rows_as_anti_join_form(spark, corpus):
    """Migration safety: both guard forms keep the identical row set
    while genuinely engaged (max_bucket_size=1 drops every shared
    bucket — this corpus has planted near-dups, so some exist)."""
    banded = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    win = DD._occupancy_guard(banded, ["band", "band_hash"], 1)
    bc = DD._occupancy_guard(banded, ["band", "band_hash"], 1, broadcast_oversized=True)
    full = banded.count()
    kept = win.count()
    assert kept < full, "guard must engage for the pin to mean anything"
    assert _rows(win.select("doc_id", "band")) == _rows(bc.select("doc_id", "band"))


def test_batched_discovery_matches_per_key_exists(spark, corpus, delta, tmp_path):
    """VERDICT r8 item 5: discovery parity — the batched listStatus
    intersection opens exactly the directories the old per-key
    fs.exists loop opened, so the probe result is unchanged and only
    matched partitions are read."""
    store = os.path.join(str(tmp_path), "dedupidx")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(64))).write.mode(
        "overwrite"
    ).partitionBy("band", "sig_bucket").parquet(store)

    banded = DI.build_dedup_index(delta, num_perm=16, num_bands=4, seed=42)
    keys = sorted(
        {
            (r.band, r.sb)
            for r in banded.select(
                "band", F.pmod("band_hash", F.lit(64)).alias("sb")
            ).distinct().collect()
        }
    )
    # reference discovery: the r8 per-key existence loop
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(store).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    want_dirs = sorted(
        f"{store}/band={b}/sig_bucket={sb}"
        for b, sb in keys
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{store}/band={b}/sig_bucket={sb}"))
    )
    pruned = DI._read_matched_partitions(
        spark, store,
        [(("band", b), ("sig_bucket", sb)) for b, sb in keys],
        empty_like=banded.select("doc_id", "sig", "band", "band_hash"),
        bucket_modulus=64,
    )
    got_dirs = sorted(
        {f.rsplit("/", 1)[0].removeprefix("file://") for f in pruned.inputFiles()}
    )
    assert got_dirs == want_dirs
    assert 0 < len(want_dirs) < 4 * 64, "pruning must be real on this fixture"


def test_modulus_validated_across_all_band_dirs(spark, corpus, delta, tmp_path):
    """ADVICE r8: a store written with a larger modulus must raise even
    when the FIRST band directory happens to hold only bucket values
    below the probe's modulus. band=0 keeps only sig_bucket<64 rows;
    band=1 keeps a sig_bucket>=64 row — r8's first-dir sampling passed
    this store, the r9 all-dirs scan must reject it."""
    store = os.path.join(str(tmp_path), "skewmod")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42).withColumn(
        "sig_bucket", F.pmod("band_hash", F.lit(128))
    )
    low0 = idx.filter((F.col("band") == 0) & (F.col("sig_bucket") < 64))
    hi1 = idx.filter((F.col("band") == 1) & (F.col("sig_bucket") >= 64))
    assert low0.count() > 0 and hi1.count() > 0, "fixture must cover both shapes"
    low0.unionByName(hi1).write.mode("overwrite").partitionBy(
        "band", "sig_bucket"
    ).parquet(store)
    with pytest.raises(ValueError, match="modulus"):
        DI.probe_dedup_index(
            spark, store, delta, num_perm=16, num_bands=4, seed=42
        ).collect()


def test_auto_modulus_sizing_and_probe_adoption(spark, corpus, delta, tmp_path):
    """r14: the bucket modulus is sized to the store (small-files
    discipline — guide §6) and saturates to the shared pmod-64
    convention at scale; a store written with the auto modulus is
    probed correctly because the probe adopts the recorded value."""
    assert DI.auto_modulus(0) == 1
    assert DI.auto_modulus(500) == 1          # sf0.001/0.01 corpora
    assert DI.auto_modulus(5000) == 2         # sf0.1 corpus
    assert DI.auto_modulus(2000 * 64) == 64   # saturation
    assert DI.auto_modulus(10**9) == 64       # 100 TB-scale store
    store = os.path.join(str(tmp_path), "automod")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    mod = DI.auto_modulus(corpus.count())
    DI.write_signature_store(
        idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(mod))),
        store, ("band", "sig_bucket"), bucket_modulus=mod,
    )
    assert DI.read_store_meta(spark, store)["bucket_modulus"] == mod
    got = DI.probe_dedup_index(
        spark, store, delta, num_perm=16, num_bands=4, seed=42
    )
    want = DI.dedup_delta(idx, delta, num_perm=16, num_bands=4, seed=42)
    assert _rows(got) == _rows(want)
    assert _rows(got), "fixture must produce pairs"


def test_store_meta_written_and_adopted(spark, corpus, delta, tmp_path):
    """ADVICE r8 ('better' option): stores written by
    write_signature_store carry _store_meta.json, and the probe ADOPTS
    the recorded modulus — a store bucketed with modulus 32 probed
    with the default num_buckets=64 (a mismatch listings alone cannot
    prove: every bucket value < 64 looks plausible) still returns the
    exact dedup_delta result instead of silently missing duplicates."""
    store = os.path.join(str(tmp_path), "meta32")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    DI.write_signature_store(
        idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(32))),
        store, ("band", "sig_bucket"), bucket_modulus=32,
    )
    meta = DI.read_store_meta(spark, store)
    assert meta == {"partition_cols": ["band", "sig_bucket"], "bucket_modulus": 32}
    got = DI.probe_dedup_index(
        spark, store, delta, num_perm=16, num_bands=4, seed=42  # default 64
    )
    want = DI.dedup_delta(idx, delta, num_perm=16, num_bands=4, seed=42)
    assert _rows(got) == _rows(want)
    assert _rows(got), "fixture must produce pairs"


def test_store_meta_mismatch_raises(spark, corpus, delta, tmp_path):
    """Metadata recording different partition columns than the probe
    expects is a provable layout error — raise, never empty-probe."""
    store = os.path.join(str(tmp_path), "metabad")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    DI.write_signature_store(
        idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(64))),
        store, ("band", "sig_bucket"), bucket_modulus=64,
    )
    with pytest.raises(ValueError, match="partition_cols"):
        DI.probe_simhash_index(spark, store, delta)  # expects block_id/blk_bucket


def test_append_mode_holds_store_layout(spark, corpus, tmp_path):
    """ADVICE r14 (medium): ``mode='append'`` must HOLD the stored
    layout, not rewrite it — a matching append leaves the sidecar
    untouched, and an appender bringing a different modulus RAISES
    instead of creating a mixed-modulus store whose sidecar lies to
    every probe (old rows bucketed under the previous modulus would be
    read from the wrong directories and duplicates silently missed)."""
    store = os.path.join(str(tmp_path), "appmode")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    DI.write_signature_store(
        idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(4))),
        store, ("band", "sig_bucket"), bucket_modulus=4,
    )
    DI.write_signature_store(
        idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(4))),
        store, ("band", "sig_bucket"), bucket_modulus=4, mode="append",
    )
    assert DI.read_store_meta(spark, store)["bucket_modulus"] == 4
    with pytest.raises(ValueError, match="append"):
        DI.write_signature_store(
            idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(8))),
            store, ("band", "sig_bucket"), bucket_modulus=8, mode="append",
        )
    assert DI.read_store_meta(spark, store)["bucket_modulus"] == 4


def test_probe_overlap_index_matches_oneshot(spark, corpus, tmp_path):
    """The stored-index corpus-overlap twin returns the identical
    per-B-doc verdicts as the one-shot A-probe-B join, while reading
    only B's matched store partitions (store written with metadata)."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        overlap as OV,
    )

    a = corpus.filter(F.col("doc_id") < 40)
    b = corpus.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 70)).unionByName(
        corpus.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 2000).alias("doc_id"),
            F.concat(F.lit("copy "), F.col("text")).alias("text"),
        )
    )
    store = os.path.join(str(tmp_path), "overlapidx")
    DI.write_signature_store(
        DI.build_dedup_index(a, num_perm=16, num_bands=4, seed=42).withColumn(
            "sig_bucket", F.pmod("band_hash", F.lit(64))
        ),
        store, ("band", "sig_bucket"), bucket_modulus=64,
    )
    got = OV.probe_overlap_index(spark, store, b, threshold=0.5)
    want = OV.corpus_overlap(a, b, threshold=0.5)
    assert _rows(got) == _rows(want)
    n_matched = got.filter(F.col("matched")).count()
    assert n_matched >= 10, "planted near-copies must match"
    DD.release_caches()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_semantic_dedup_delta_equals_oneshot_replay(spark, embeddings):
    """VERDICT r8 item 3: the SemDeDup incremental twin — delta
    assigned to FROZEN centroids, store pruned to the delta's
    clusters — is value-identical to the one-shot pair generator over
    corpus-union-delta under the union assignment, filtered to
    delta-touching pairs; and the per-delta verdicts equal the full
    verdict frame restricted to delta ids. Exact copies (cos=1.0)
    plant guaranteed pairs."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as RT,
    )
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        semantic as SD,
    )

    corpus = embeddings
    delta = corpus.filter(F.col("vec_id") < 15).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    assigned, cents = RT.build_ivf_index(corpus, num_centroids=8, corpus_id="vec_id")
    assigned = assigned.localCheckpoint()

    got_pairs = SD.semantic_dedup_delta_pairs(
        assigned, cents, delta, threshold=0.95, corpus_id="vec_id"
    )
    da = RT.ivf_index_append(cents, delta, corpus_id="vec_id")
    union_assign = assigned.select("vec_id", "embedding", "bucket").unionByName(
        da.select("vec_id", "embedding", "bucket")
    )
    want_pairs = SD.semantic_dedup_pairs(
        corpus.unionByName(delta), threshold=0.95, corpus_id="vec_id",
        assignment=union_assign,
    ).filter((F.col("id_a") >= 10_000_000) | (F.col("id_b") >= 10_000_000))
    got, want = _rows(got_pairs), _rows(want_pairs)
    assert got == want
    assert len(got) >= 15, "each planted copy must pair with its original"

    got_v = SD.semantic_dedup_delta(
        assigned, cents, delta, threshold=0.95, corpus_id="vec_id"
    )
    want_v = SD.semantic_dedup(
        corpus.unionByName(delta), threshold=0.95, corpus_id="vec_id",
        assignment=union_assign,
    ).filter(F.col("vec_id") >= 10_000_000)
    assert _rows(got_v) == _rows(want_v)
    assert got_v.filter(F.col("keep")).count() == 0, "exact copies must drop"

    # r14 cost knobs: a shared materialized delta assignment plus the
    # precomputed pair frame must yield IDENTICAL pairs and verdicts
    # (one assignment pass, one probe join — the harness entry's shape)
    da_m = da.localCheckpoint()
    p2 = SD.semantic_dedup_delta_pairs(
        assigned, None, delta, threshold=0.95, corpus_id="vec_id",
        delta_assignment=da_m,
    )
    v2 = SD.semantic_dedup_delta(
        assigned, None, delta, threshold=0.95, corpus_id="vec_id",
        delta_assignment=da_m, pairs=p2,
    )
    assert _rows(p2) == got
    assert _rows(v2) == _rows(got_v)


def test_semantic_dedup_delta_prunes_to_matched_clusters(spark, embeddings):
    """Scale pin: the probe reads only the delta's clusters from a
    bucket-partitioned assignment store — the scan's partition count
    equals the matched-cluster count, not the store's."""
    import tempfile

    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as RT,
    )
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        semantic as SD,
    )

    corpus = embeddings
    delta = corpus.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    assigned, cents = RT.build_ivf_index(corpus, num_centroids=8, corpus_id="vec_id")
    with tempfile.TemporaryDirectory() as tmp:
        store_path = os.path.join(tmp, "semstore")
        assigned.repartition("bucket").write.partitionBy("bucket").parquet(store_path)
        store = spark.read.parquet(store_path)
        pairs = SD.semantic_dedup_delta_pairs(
            store, cents, delta, threshold=0.95, corpus_id="vec_id"
        )
        assert pairs.count() >= 1
        # inputFiles() reports the relation's full listing regardless of
        # pushdown (SCALING.md r8 trap) — assert on the optimized plan's
        # partition filter instead: the single-cluster delta must reach
        # the store scan as `bucket IN/= <one literal>`
        import re

        plan = pairs._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m, f"no PartitionFilters on the store scan:\n{plan[:2000]}"
        pf = m.group(1)
        literals = re.findall(r"(?:IN \(([^)]*)\)|bucket#\d+ = (\d+))", pf)
        vals = {v for tup in literals for v in tup if v}
        flat = {x.strip() for v in vals for x in v.split(",")}
        assert len(flat) == 1, f"expected one matched bucket literal, got {pf!r}"


def test_semantic_dedup_centroid_keep_policy(spark, embeddings):
    """keep_policy='centroid' implements the paper's keeper (lowest
    centroid similarity wins, id tie-break). Pin: replay the greedy
    dominance exactly in numpy over the collected assignment and
    compare verdicts; and verify the policy genuinely diverges from
    min_id on this corpus (otherwise the pin proves nothing)."""
    import numpy as np

    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as RT,
    )
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        semantic as SD,
    )

    import numpy as _np

    # plant a BRACKETING near-dup pair of vec_id 0 under larger ids:
    # y± = normalize(v0 ± eps*u) for a fixed unit direction u. For any
    # centroid c, cos(c, y+) and cos(c, y-) straddle cos(c, v0) unless
    # u happens to be exactly orthogonal to c — so one planted copy has
    # STRICTLY LOWER centroid similarity than the original: min_id
    # keeps v0 (smallest id), the paper's centroid rule keeps that
    # copy instead. Guaranteed divergence, fully replayed below.
    base = embeddings.filter(F.col("vec_id") == 0).collect()[0]
    v0 = _np.array(base["embedding"], dtype=_np.float64)
    u = _np.zeros_like(v0)
    u[int(_np.argmin(_np.abs(v0)))] = 1.0
    planted_rows = []
    for off, sign in ((1, 1.0), (2, -1.0)):
        y = v0 + sign * 0.05 * u
        y = y / _np.linalg.norm(y)
        planted_rows.append((10_000_000 + off, [float(x) for x in y]))
    planted = spark.createDataFrame(
        planted_rows, "vec_id bigint, embedding array<double>"
    )
    corpus = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)
    got = SD.semantic_dedup(
        corpus, threshold=0.8, num_clusters=4, corpus_id="vec_id",
        keep_policy="centroid",
    )
    rows = {r["vec_id"]: (r["bucket"], r["keep"]) for r in got.collect()}

    assigned, cents = RT.build_ivf_index(
        corpus, num_centroids=4, corpus_id="vec_id", seed=42
    )
    data = assigned.collect()
    cmap = {r["bucket"]: np.array(r["centroid"]) for r in cents.collect()}
    by_bucket: dict = {}
    for r in data:
        by_bucket.setdefault(r["bucket"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )

    def cos(x, y):
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

    want = {}
    for bkt, members in by_bucket.items():
        keyed = sorted(
            (round(cos(v, cmap[bkt]), 6), vid, v) for vid, v in members
        )
        for i, (csi, vid, v) in enumerate(keyed):
            dropped = any(
                round(cos(v, keyed[j][2]), 6) >= 0.8 for j in range(i)
            )
            want[vid] = (bkt, not dropped)
    assert rows == want
    min_id = {
        r["vec_id"]: r["keep"]
        for r in SD.semantic_dedup(
            corpus, threshold=0.8, num_clusters=4, corpus_id="vec_id"
        ).collect()
    }
    assert any(min_id[k] != rows[k][1] for k in min_id), (
        "policies must diverge on this fixture for the pin to bite"
    )


def test_probe_helpers_reject_unbounded_delta(spark, corpus, delta, tmp_path):
    """ADVICE r8: the bounded daily-batch contract fails fast — a delta
    past max_delta_docs raises during the probe call (the check rides
    the bucket-discovery aggregation: per-key counts sum to
    |delta| x bands, so no extra job), before any store read or
    broadcast."""
    store = os.path.join(str(tmp_path), "capidx")
    DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42).withColumn(
        "sig_bucket", F.pmod("band_hash", F.lit(64))
    ).write.mode("overwrite").partitionBy("band", "sig_bucket").parquet(store)
    with pytest.raises(ValueError, match="max_delta_docs"):
        DI.probe_dedup_index(
            spark, store, delta, num_perm=16, num_bands=4, seed=42, max_delta_docs=5
        )
    # at the cap boundary the probe still runs
    got = DI.probe_dedup_index(
        spark, store, delta, num_perm=16, num_bands=4, seed=42, max_delta_docs=10
    )
    assert got.count() > 0


def test_html_to_text_semantics(spark):
    """functions/html.py: boilerplate elements drop WITH content, tags
    become spaces, entities decode once (&amp; last — double-encoded
    text must NOT double-decode), malformed HTML degrades gracefully
    (unclosed boilerplate tag keeps its content instead of eating the
    rest of the document), whitespace collapses."""
    from rag_project_with_embeddings_and_vector_database_spark.functions import (
        html as HF,
    )

    cases = [
        (
            '<html><head><script>var x = "</p>";</script><style>a{}</style>'
            "</head><body><nav>Home | About</nav><h1>Title</h1>"
            "<p>Hello   <b>world</b></p><footer>foot</footer></body></html>",
            "Title Hello world",
        ),
        # entity decoding, single pass: &amp;amp; -> &amp;
        ("<p>&quot;AT&amp;T&quot; 1 &lt; 2 &amp;amp; x&#39;</p>", '"AT&T" 1 < 2 &amp; x\''),
        # unclosed script: lazy match finds no close -> tag stripped,
        # content survives (graceful, never eats the document)
        ("<p>before</p><script>var x = 1; <p>after</p>", "before var x = 1; after"),
        # comments out, including multiline
        ("a<!-- hidden\n lines -->b", "a b"),
        ("", ""),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)], "i int, h string")
    got = {r["i"]: r["t"] for r in df.select("i", HF.html_to_text("h").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_strip_frequent_segments_semantics(spark):
    """operators/boilerplate.py: C4-style line dedup — segments in
    >= min_docs distinct docs drop, survivors reassemble in original
    order, an all-boilerplate document returns '' (never disappears),
    and duplicate occurrences WITHIN one doc count once toward the
    census but both drop when the segment is frequent."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        boilerplate as BP,
    )

    rows = [
        (1, "unique one\nCOMMON\nunique two"),
        (2, "COMMON\nother text\nCOMMON"),   # COMMON twice in one doc
        (3, "COMMON"),                        # all boilerplate -> ""
        (4, "solo line"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in BP.strip_frequent_segments(df, min_docs=3).collect()
    }
    assert got == {
        1: "unique one\nunique two",
        2: "other text",
        3: "",
        4: "solo line",
    }
    census = {
        (r["seg"], r["n_docs"])
        for r in BP.frequent_segments(df, min_docs=2).collect()
    }
    assert census == {("COMMON", 3)}  # within-doc repeat counts once


def test_gated_ingest_stored_index_path_mode_matches_dataframe_mode(
    spark, corpus, tmp_path
):
    """dedup_gated_ingest accepts the corpus index as a stored-index
    PATH (per-batch partition-pruned probe_dedup_index reads — the
    production form that never re-evaluates the index lineage per
    micro-batch) and must gate IDENTICALLY to the DataFrame form:
    same survivors with a corpus near-dup, a novel doc, and a
    cross-batch near-dup of the novel doc arriving in a later
    single-file micro-batch."""
    from rag_project_with_embeddings_and_vector_database_spark.streaming.ingest import (
        dedup_gated_ingest,
    )

    text = corpus.filter("doc_id = 0").collect()[0].text
    fresh = "entirely novel stored index path mode arrival content " * 6
    survivors = {}
    for mode in ("frame", "path"):
        in_dir = tmp_path / f"in_{mode}"
        in_dir.mkdir()
        for name, body in (
            ("a_corpus_dup.md", text + " rev"),
            ("b_novel.md", fresh),
            ("c_batch_dup.md", fresh + " trailing rev"),
        ):
            p = in_dir / name
            p.write_text(body)
        # distinct mtimes: oldest-first drain -> one file per batch
        now = (in_dir / "c_batch_dup.md").stat().st_mtime
        for i, name in enumerate(sorted(x.name for x in in_dir.iterdir())):
            os.utime(in_dir / name, (now - 120 + i * 60,) * 2)
        if mode == "frame":
            index = DI.build_dedup_index(corpus)
        else:
            index = str(tmp_path / "sigstore")
            DI.write_signature_store(
                DI.build_dedup_index(corpus).withColumn(
                    "sig_bucket", F.pmod("band_hash", F.lit(64))
                ),
                index, ("band", "sig_bucket"), bucket_modulus=64,
            )
        vt = str(tmp_path / f"vectors_{mode}")
        q = dedup_gated_ingest(
            spark, str(in_dir), vt, str(tmp_path / f"ckpt_{mode}"),
            dedup_index=index, max_files_per_trigger=1,
        )
        q.awaitTermination(300)
        survivors[mode] = {
            r.source_file.rsplit("/", 1)[-1]
            for r in spark.read.parquet(vt).select("source_file").distinct().collect()
        }
    assert survivors["path"] == survivors["frame"] == {"b_novel.md"}

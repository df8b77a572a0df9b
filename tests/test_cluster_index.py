"""Day-2 incremental star clustering pins (operators/cluster_index.py
— r12): incremental assignment must be BIT-EQUAL to a from-scratch
star recompute over day1 ∪ delta, across the shapes that stress the
contraction argument — a delta doc bridging two day-1 clusters (the
remap/merge path), a delta id smaller than its day-1 cluster label
(the relabel path), delta-only new clusters, and an unconnected
delta."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    cluster as CL,
    cluster_index as CI,
)


def _assign(df):
    return {r.doc_id: (r.component, r.keep) for r in df.collect()}


def _check_parity(spark, day1, delta, tmp_path, tag):
    path = str(tmp_path / f"idx_{tag}")
    CI.write_star_index(day1, path)
    inc = _assign(CI.star_assign_incremental(spark, delta, path))
    full = _assign(CL.minhash_dedup_star(day1.unionByName(delta)))
    assert inc == full, {
        k: (inc.get(k), full.get(k)) for k in inc if inc.get(k) != full.get(k)
    }
    return inc


def test_bridge_merges_two_day1_clusters(spark, tmp_path):
    """Two textually distinct day-1 clusters; the delta doc contains
    BOTH texts, so its shingles share buckets with each — day 2 must
    merge the two day-1 components through the remap path, exactly as
    the full recompute does."""
    # deterministic bridge fixture, found by replaying the md5/LCG
    # hash family offline: the concatenation band-collides with BOTH
    # source texts under seed 42 while a and b never collide directly
    # (matching a band requires the union's four perm-minima to all
    # come from one side — rare by design, so it is searched for, not
    # assumed)
    a = "w15 w83 w174 w132 w135 w142 w123 w198 w27 w143"
    b = "w14 w63 w48 w70 w10 w197 w25 w129 w115 w143"
    day1 = spark.createDataFrame(
        [(10, a), (11, a), (20, b), (21, b)], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(30, a + " " + b)], "doc_id long, text string"
    )
    inc = _check_parity(spark, day1, delta, tmp_path, "bridge")
    comps = {c for c, _ in inc.values()}
    assert comps == {10}, comps  # one merged cluster labeled by min id


def test_small_delta_id_relabels_day1_cluster(spark, tmp_path):
    """A delta doc with an id SMALLER than its day-1 cluster's label
    must relabel the whole cluster (min-label identity) — the remap
    path in the other direction."""
    t = "identical mirrored boilerplate body with plenty of stable tokens for shingling"
    day1 = spark.createDataFrame(
        [(100, t), (101, t)], "doc_id long, text string"
    )
    delta = spark.createDataFrame([(5, t)], "doc_id long, text string")
    inc = _check_parity(spark, day1, delta, tmp_path, "relabel")
    assert inc[100] == (5, False) and inc[101] == (5, False) and inc[5] == (5, True)


def test_delta_only_cluster_and_singletons(spark, tmp_path):
    """Delta docs forming a brand-new cluster in buckets day 1 never
    occupied, plus unconnected delta singletons, plus an untouched
    day-1 cluster."""
    day1 = spark.createDataFrame(
        [
            (1, "day one cluster text about resistors capacitors and oscillators in circuits"),
            (2, "day one cluster text about resistors capacitors and oscillators in circuits"),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (50, "new arrival topic with entirely fresh vocabulary about orchards and beekeeping"),
            (51, "new arrival topic with entirely fresh vocabulary about orchards and beekeeping"),
            (60, " ".join(f"solo60tok{t}" for t in range(12))),
        ],
        "doc_id long, text string",
    )
    inc = _check_parity(spark, day1, delta, tmp_path, "newcluster")
    assert inc[1] == (1, True) and inc[2] == (1, False)
    assert inc[50] == (50, True) and inc[51] == (50, False)
    assert inc[60] == (60, True)


def test_parity_on_testdata_quarter_split(spark, tmp_path):
    """The fixture-corpus version of the contract: a 25% delta over
    the sf0.001 documents table, incremental == full bit-for-bit."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    day1 = docs.filter(F.col("doc_id") % 4 != 0)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    _check_parity(spark, day1, delta, tmp_path, "sf")


def test_day3_chain_through_updated_store(spark, tmp_path):
    """update_star_index folds day 2 into the store; a day-3
    incremental against the UPDATED store must equal the full
    three-day recompute — the multi-day chaining contract (each day
    costs O(store + delta), never a corpus reprocess)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    day1 = docs.filter(F.col("doc_id") % 3 == 0)
    day2 = docs.filter(F.col("doc_id") % 3 == 1)
    day3 = docs.filter(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "chain_idx")
    CI.write_star_index(day1, path)
    CI.update_star_index(spark, day2, path, in_place=True)
    inc = _assign(CI.star_assign_incremental(spark, day3, path))
    full = _assign(CL.minhash_dedup_star(docs))
    assert inc == full


def test_dedup_keep_set_is_fixed_point(spark):
    """Idempotence of the dedup verdict: re-clustering the KEPT docs
    must yield all singletons — any two kept roots sharing a bucket
    would have been one component in the first pass (the star-family
    analogue of the f∘f == f normalizer sweeps)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    first = CL.minhash_dedup_star(docs)
    kept_ids = first.filter("keep").select("doc_id")
    kept_docs = docs.join(kept_ids, "doc_id")
    second = CL.minhash_dedup_star(kept_docs)
    non_singleton = second.filter("doc_id != component").count()
    assert non_singleton == 0
    assert second.count() == kept_ids.count()


def test_update_star_index_dest_path_generation(spark, tmp_path):
    """ADVICE r12: ``dest_path`` writes BOTH tables into a NEW
    generation directory — the source store is byte-untouched, so a
    crash mid-update costs only the incomplete new dir and a RETRY
    re-reads the original store (the id-disjoint delta contract
    survives retries, unlike the in-place fold where a retry would
    re-submit already-folded delta ids). The new generation must be
    indistinguishable from a from-scratch day1∪day2 store: a day-3
    probe against it equals the full three-day recompute."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    day1 = docs.filter(F.col("doc_id") % 3 == 0)
    day2 = docs.filter(F.col("doc_id") % 3 == 1)
    day3 = docs.filter(F.col("doc_id") % 3 == 2)
    src = str(tmp_path / "gen1")
    CI.write_star_index(day1, src)
    before_comp = sorted(
        map(tuple, spark.read.parquet(f"{src}/components").collect())
    )
    before_buck = sorted(
        map(tuple, spark.read.parquet(f"{src}/buckets").collect())
    )
    gen2 = str(tmp_path / "gen2")
    CI.update_star_index(spark, day2, src, dest_path=gen2)
    # source generation untouched
    assert before_comp == sorted(
        map(tuple, spark.read.parquet(f"{src}/components").collect())
    )
    assert before_buck == sorted(
        map(tuple, spark.read.parquet(f"{src}/buckets").collect())
    )
    # retry idempotence: a second run against the SAME source lands an
    # identical generation
    gen2r = str(tmp_path / "gen2_retry")
    CI.update_star_index(spark, day2, src, dest_path=gen2r)
    assert sorted(
        map(tuple, spark.read.parquet(f"{gen2}/components").collect())
    ) == sorted(map(tuple, spark.read.parquet(f"{gen2r}/components").collect()))
    # day-3 probe of the new generation == full recompute
    inc = _assign(CI.star_assign_incremental(spark, day3, gen2))
    full = _assign(CL.minhash_dedup_star(docs))
    assert inc == full


def test_bucket_store_layout_partitioned_with_meta(spark, tmp_path):
    """VERDICT r12 item 4: the bucket store adopts the band-partitioned
    signature-store layout — ``partitionBy(band, sig_bucket)``
    directories plus the self-describing ``_store_meta.json`` sidecar
    the pruned probe validates and adopts."""
    import json
    import os

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "layout_idx")
    CI.write_star_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    dirs = os.listdir(f"{path}/buckets")
    assert any(d.startswith("band=") for d in dirs)
    sub = os.listdir(
        f"{path}/buckets/" + next(d for d in dirs if d.startswith("band="))
    )
    assert any(d.startswith("sig_bucket=") for d in sub)
    with open(f"{path}/buckets/{CI.STORE_META_FILE}") as fh:
        meta = json.load(fh)
    assert meta["partition_cols"] == ["band", "sig_bucket"]
    # auto-modulus (r14): tiny store -> few sig_bucket splits, and the
    # sidecar records whatever the writer chose (probes adopt it)
    n_buckets = spark.read.parquet(f"{path}/buckets").count()
    assert meta["bucket_modulus"] == CI._auto_modulus(n_buckets)
    assert 1 <= meta["bucket_modulus"] <= CI.DEFAULT_NUM_BUCKETS
    # explicit modulus still pins the full fan-out
    path64 = str(tmp_path / "layout_idx64")
    CI.write_star_index(
        docs.filter(F.col("doc_id") % 2 == 0), path64, bucket_modulus=64
    )
    with open(f"{path64}/buckets/{CI.STORE_META_FILE}") as fh:
        meta64 = json.load(fh)
    assert meta64["bucket_modulus"] == CI.DEFAULT_NUM_BUCKETS


def test_update_star_index_default_requires_explicit_choice(spark, tmp_path):
    """VERDICT r13 item 8: the crash-prone in-place fold is no longer
    reachable by default — calling update_star_index with neither
    dest_path nor in_place=True raises, so a caller who never read the
    crash-contract paragraph gets a loud error instead of a store that
    a mid-update crash can tear (and whose retry duplicates delta
    assignment rows)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "default_idx")
    CI.write_star_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    with pytest.raises(ValueError, match="dest_path"):
        CI.update_star_index(
            spark, docs.filter(F.col("doc_id") % 2 == 1), path
        )


def test_legacy_flat_bucket_store_falls_back_to_full_scan(spark, tmp_path):
    """ADVICE r13: a bucket table written BEFORE the band-partitioned
    layout (flat parquet, no band= dirs, no _store_meta.json) must
    stay probeable — the day-2 assignment against a hand-built legacy
    store equals the full recompute (the fallback reads the whole
    store unpruned instead of raising 'layout mismatch')."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "legacy_idx")
    # write day-1 state in the PRE-r13 shape: components as today, but
    # buckets as FLAT parquet (no partitionBy, no sidecar)
    comp = CL.minhash_dedup_star(day1)
    comp.select("doc_id", "component").write.parquet(f"{path}/components")
    banded = CI._banded(day1, "text", "doc_id", 3, 16, 4, 42)
    (
        banded.groupBy("band", "band_hash")
        .agg(F.min("doc_id").alias("root"))
        .write.parquet(f"{path}/buckets")
    )
    inc = _assign(CI.star_assign_incremental(spark, delta, path))
    full = _assign(CL.minhash_dedup_star(day1.unionByName(delta)))
    assert inc == full

"""Round-8 pins: the steady-state probe helpers (one-pass delta probe
over a stored, bucket-partitioned signature index) are value-identical
to the full-index dedup_delta/simhash_delta contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    dedup_index as DI,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def delta(corpus):
    """Disjoint-id delta: 10 near-copies of existing docs (suffix edit)
    plus their originals' text guarantees planted near-dup pairs."""
    return corpus.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" probe rev")).alias("text"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_probe_dedup_index_matches_full_index_probe(spark, corpus, delta, tmp_path):
    store = os.path.join(str(tmp_path), "dedupidx")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(64))).write.mode(
        "overwrite"
    ).partitionBy("band", "sig_bucket").parquet(store)

    via_store = DI.probe_dedup_index(
        spark, store, delta, num_perm=16, num_bands=4, seed=42
    )
    via_full = DI.dedup_delta(idx, delta, num_perm=16, num_bands=4, seed=42)
    got, want = _rows(via_store), _rows(via_full)
    assert got == want
    assert got, "fixture must produce at least one near-dup pair"


def test_probe_simhash_index_matches_full_index_probe(spark, corpus, delta, tmp_path):
    store = os.path.join(str(tmp_path), "simhashidx")
    idx = DI.build_simhash_index(corpus, bits=32, num_blocks=4)
    idx.withColumn("blk_bucket", F.pmod("block_key", F.lit(64))).write.mode(
        "overwrite"
    ).partitionBy("block_id", "blk_bucket").parquet(store)

    via_store = DI.probe_simhash_index(
        spark, store, delta, bits=32, num_blocks=4, max_hamming=3
    )
    via_full = DI.simhash_delta(idx, delta, bits=32, num_blocks=4, max_hamming=3)
    got, want = _rows(via_store), _rows(via_full)
    assert got == want
    assert got, "fixture must produce at least one near-dup pair"


def test_read_matched_partitions_prunes_and_survives_missing_keys(
    spark, corpus, tmp_path
):
    """The matched-partition reader must touch ONLY the named
    directories (the pruning that makes the probe O(delta) at 100 TB),
    tolerate keys whose directory does not exist, and fall back to an
    empty frame when nothing matches."""
    store = os.path.join(str(tmp_path), "dedupidx")
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(64))).write.mode(
        "overwrite"
    ).partitionBy("band", "sig_bucket").parquet(store)
    existing = sorted(
        {
            (r.band, r.sb)
            for r in idx.select(
                "band", F.pmod("band_hash", F.lit(64)).alias("sb")
            )
            .distinct()
            .collect()
        }
    )
    assert len(existing) > 3
    pick = existing[:2]
    keys = [(("band", b), ("sig_bucket", sb)) for b, sb in pick]
    # a key with no directory must be skipped, not crash the read
    keys.append((("band", 0), ("sig_bucket", 10_000)))
    got = DI._read_matched_partitions(spark, store, keys, empty_like=idx)
    files = got.inputFiles()
    assert files, "matched read must see files"
    want_prefixes = tuple(f"{store}/band={b}/sig_bucket={sb}" for b, sb in pick)
    for f in files:
        assert f.replace("file://", "").startswith(want_prefixes)
    # value identity with a plain filtered read
    import functools
    import operator

    cond = functools.reduce(
        operator.or_,
        [(F.col("band") == b) & (F.col("sig_bucket") == sb) for b, sb in pick],
    )
    want = spark.read.parquet(store).filter(cond)
    assert got.count() == want.count() > 0
    # nothing matches -> empty frame with the index columns
    none = DI._read_matched_partitions(
        spark, store, [(("band", 0), ("sig_bucket", 10_000))], empty_like=idx
    )
    assert none.count() == 0 and set(none.columns) == set(idx.columns)


def test_redact_pii_planted_values_and_idempotence(spark):
    from rag_project_with_embeddings_and_vector_database_spark.functions import (
        pii as PII,
    )

    d = spark.createDataFrame(
        [
            (1, "mail a.user+tag@example.co.uk or call 555-123-4567 now"),
            (2, "server at 10.0.255.1 responded"),
            (3, "no pii here, just 3.14 and v1.2.3 and a@b"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["red"]
        for r in d.select("doc_id", PII.redact_pii("text").alias("red")).collect()
    }
    assert got[1] == "mail <EMAIL> or call <PHONE> now"
    assert got[2] == "server at <IPV4> responded"
    # version strings / decimals / non-TLD at-signs must survive
    assert got[3] == "no pii here, just 3.14 and v1.2.3 and a@b"
    twice = {
        r["doc_id"]: r["red2"]
        for r in d.select(
            "doc_id", PII.redact_pii(PII.redact_pii("text")).alias("red2")
        ).collect()
    }
    assert twice == got


def test_semantic_dedup_k1_equals_exact_all_pairs(spark):
    """SemDeDup with ONE cluster must reproduce the exact all-pairs
    generator (embedding_neardup_pairs) — the equivalence that anchors
    the cluster-bucketed scale path to the proven exact contract."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup as DD,
        semantic as SD,
    )

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    ).select("vec_id", "embedding")
    # plant exact copies so the pair set is non-empty
    e = base.unionByName(
        base.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
        )
    )
    got = sorted(
        tuple(r)
        for r in SD.semantic_dedup_pairs(
            e, threshold=0.9, num_clusters=1, corpus_id="vec_id"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in DD.embedding_neardup_pairs(
            e, id_col="vec_id", threshold=0.9
        ).collect()
    )
    assert got == want
    assert want, "planted copies must produce near-dup pairs at 0.9"


def test_semantic_dedup_verdicts_drop_exactly_dominated_ids(spark):
    """keep=false iff the id appears as id_b in the within-cluster pair
    set; planted exact duplicates are dropped, every corpus row gets a
    verdict, and survivors filter cleanly."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        semantic as SD,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    ).select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(planted)
    verdicts = SD.semantic_dedup(
        corpus, threshold=0.95, num_clusters=4, corpus_id="vec_id"
    )
    rows = {r["vec_id"]: r["keep"] for r in verdicts.collect()}
    assert len(rows) == corpus.count()
    # every planted exact copy shares a cluster with its original
    # (identical vector -> identical assignment) and has the larger id
    for vid in range(10_000, 10_005):
        assert rows[vid] is False
        assert rows[vid - 10_000] in (True, False)  # original got a verdict
    pairs = SD.semantic_dedup_pairs(
        corpus, threshold=0.95, num_clusters=4, corpus_id="vec_id"
    )
    dropped = {r["id_b"] for r in pairs.collect()}
    assert {v for v, k in rows.items() if not k} == dropped


def test_probe_dedup_index_empty_delta_returns_no_pairs(spark, corpus, tmp_path):
    """A delta with zero rows must probe cleanly (no keys -> empty
    matched read -> empty pair set), not crash on the empty path."""
    store = os.path.join(str(tmp_path), "dedupidx")
    DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42).withColumn(
        "sig_bucket", F.pmod("band_hash", F.lit(64))
    ).write.mode("overwrite").partitionBy("band", "sig_bucket").parquet(store)
    empty = corpus.filter(F.lit(False)).select(
        "doc_id", "text"
    )
    out = DI.probe_dedup_index(spark, store, empty, num_perm=16, num_bands=4, seed=42)
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "est_jaccard"}


def test_probe_rejects_mismatched_store_layouts(spark, corpus, delta, tmp_path):
    """A store written under different partition column names, or
    bucketed with a larger modulus than the probe assumes, must RAISE
    instead of silently skipping every key and letting duplicates
    through (r8 code-review finding)."""
    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    # wrong bucket column name
    wrong_col = os.path.join(str(tmp_path), "wrongcol")
    idx.withColumn("bkt", F.pmod("band_hash", F.lit(64))).write.mode(
        "overwrite"
    ).partitionBy("band", "bkt").parquet(wrong_col)
    with pytest.raises(ValueError, match="layout mismatch"):
        DI.probe_dedup_index(
            spark, wrong_col, delta, num_perm=16, num_bands=4, seed=42
        ).collect()
    # store bucketed with modulus 128, probed with the default 64
    big_mod = os.path.join(str(tmp_path), "bigmod")
    idx.withColumn("sig_bucket", F.pmod("band_hash", F.lit(128))).write.mode(
        "overwrite"
    ).partitionBy("band", "sig_bucket").parquet(big_mod)
    with pytest.raises(ValueError, match="modulus"):
        DI.probe_dedup_index(
            spark, big_mod, delta, num_perm=16, num_bands=4, seed=42
        ).collect()


def test_broadcast_guard_matches_windowed_and_drops_the_window(spark, corpus, delta):
    """broadcast_delta=True now swaps the occupancy guard's windowed
    count (whose exchange is the broadcast plan's ONLY full-row
    shuffle) for a groupBy-count + broadcast LEFT ANTI drop: same kept
    set, zero Window operators. max_bucket_size=5 is low enough that
    the guard genuinely drops buckets on this corpus, so the equality
    proves the two guard forms agree while engaged, not just on
    pass-through."""
    import re

    idx = DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42)
    win = DI.dedup_delta(idx, delta, broadcast_delta=False, max_bucket_size=5)
    bc = DI.dedup_delta(idx, delta, broadcast_delta=True, max_bucket_size=5)
    assert _rows(bc) == _rows(win)
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bWindow\b", plan)
    assert "LeftAnti" in plan

    sidx = DI.build_simhash_index(corpus)
    swin = DI.simhash_delta(sidx, delta, broadcast_delta=False, max_bucket_size=5)
    sbc = DI.simhash_delta(sidx, delta, broadcast_delta=True, max_bucket_size=5)
    assert _rows(sbc) == _rows(swin)
    splan = sbc._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bWindow\b", splan)
    assert "LeftAnti" in splan

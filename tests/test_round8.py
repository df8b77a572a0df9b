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


def test_probe_dedup_index_prunes_partitions(spark, corpus, delta, tmp_path):
    """The store read must carry the (band, sig_bucket) partition
    filters — the pruning that makes the probe O(delta) at 100 TB."""
    store = os.path.join(str(tmp_path), "dedupidx")
    DI.build_dedup_index(corpus, num_perm=16, num_bands=4, seed=42).withColumn(
        "sig_bucket", F.pmod("band_hash", F.lit(64))
    ).write.mode("overwrite").partitionBy("band", "sig_bucket").parquet(store)
    out = DI.probe_dedup_index(spark, store, delta, num_perm=16, num_bands=4, seed=42)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the filter actually references the partition columns
    assert "band" in plan and "sig_bucket" in plan

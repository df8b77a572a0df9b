"""Round-5 additions: upsert_points hardening (empty delta, NULL
partition values, struct-based pruning), the registered stored-index
query twins, the streaming upsert-ingest query, and the append-mode
windowed-counts twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    retrieval as R,
)


def test_upsert_points_empty_delta_is_noop(spark, tmp_path):
    """ADVICE r4: an empty foreachBatch micro-batch must not kill the
    stream — upsert_points on an empty delta is a no-op, both against
    an existing table and a missing one."""
    vt = R.VectorTable(spark, str(tmp_path / "vt"))
    base = spark.createDataFrame(
        [("s", "m", i, "v1") for i in range(5)],
        "strategy string, model string, vec_id long, tag string",
    )
    vt.upsert(base)
    empty = base.filter(F.lit(False))
    vt.upsert_points(empty, key_col="vec_id")  # must not raise
    assert vt.read().count() == 5
    # and on a table that does not exist yet
    vt2 = R.VectorTable(spark, str(tmp_path / "vt_missing"))
    vt2.upsert_points(empty, key_col="vec_id")  # must not raise, no write
    with pytest.raises(Exception):
        vt2.read().collect()


def test_upsert_points_null_partition_value(spark, tmp_path):
    """ADVICE r4: a collection keyed by a NULL partition value must
    prune AND replace correctly (null-safe equality), not silently
    duplicate its points."""
    vt = R.VectorTable(spark, str(tmp_path / "vt"))
    base = spark.createDataFrame(
        [("s", None, i, "v1") for i in range(4)]
        + [("s", "mB", i, "v1") for i in range(4)],
        "strategy string, model string, vec_id long, tag string",
    )
    vt.upsert(base)
    delta = spark.createDataFrame(
        [("s", None, i, "v2") for i in range(2, 6)],
        "strategy string, model string, vec_id long, tag string",
    )
    vt.upsert_points(delta, key_col="vec_id")
    got = vt.read().collect()
    # parquet partitionBy writes NULL partition values as the default
    # __HIVE_DEFAULT_PARTITION__ dir and reads them back as NULL
    null_rows = {r.vec_id: r.tag for r in got if r.model is None}
    other = {r.vec_id: r.tag for r in got if r.model == "mB"}
    assert null_rows == {0: "v1", 1: "v1", 2: "v2", 3: "v2", 4: "v2", 5: "v2"}
    assert other == {i: "v1" for i in range(4)}


def test_stream_upsert_replay_idempotent_emits_ok(spark, sf_dir):
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    r = H.SPARK_QUERIES["stream_upsert"](spark, sf_dir).collect()[0]
    assert r.ok and r.n_first == r.n_replay == r.n_matched
    assert r.n_first > 0


def test_stream_windowed_append_bounded_state_emits_ok(spark, sf_dir):
    """Append mode emits each window exactly once when the watermark
    passes it — n_stream equals the CLOSED subset of batch windows,
    strictly fewer than the complete-mode total (open windows at the
    head of the stream stay in state, bounded by the horizon)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    r = H.SPARK_QUERIES["stream_windowed_append"](spark, sf_dir).collect()[0]
    assert r.ok and r.n_stream == r.n_closed == r.n_matched == r.n_avg_close
    assert r.n_stream > 0


def test_ann_ivf_indexed_recall_floor_flags_true(spark, sf_dir):
    """The stored-index IVF query path must clear the same recall floor
    as the one-shot form — a silent recall collapse through the parquet
    round-trip of the index flips these flags and fails here."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    rows = H.SPARK_QUERIES["ann_ivf_indexed"](spark, sf_dir).collect()
    assert rows
    assert all(r.recall_floor_met for r in rows), rows


def test_upsert_points_prune_cap_falls_back_to_full_merge(spark, tmp_path, monkeypatch):
    """Past _MAX_PRUNE_COLLECTIONS distinct collections the pruning
    predicate is skipped but the merge stays correct."""
    monkeypatch.setattr(R.VectorTable, "_MAX_PRUNE_COLLECTIONS", 1)
    vt = R.VectorTable(spark, str(tmp_path / "vt"))
    base = spark.createDataFrame(
        [("s", m, i, "v1") for m in ("mA", "mB") for i in range(3)],
        "strategy string, model string, vec_id long, tag string",
    )
    vt.upsert(base)
    delta = spark.createDataFrame(
        [("s", "mA", 2, "v2"), ("s", "mB", 2, "v2")],
        "strategy string, model string, vec_id long, tag string",
    )
    vt.upsert_points(delta, key_col="vec_id")
    rows = {(r.model, r.vec_id): r.tag for r in vt.read().collect()}
    assert len(rows) == 6
    assert rows[("mA", 2)] == "v2" and rows[("mB", 2)] == "v2"
    assert rows[("mA", 0)] == "v1" and rows[("mB", 1)] == "v1"

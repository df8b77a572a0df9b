"""Bounded-state streaming dedup pins (streaming/ttl.py,
dropDuplicatesWithinWatermark): within-horizon collapse, the
beyond-horizon re-emit that distinguishes TTL state from exact global
dedup, and checkpoint recovery of the dedup state. Registration queued
for the r11 window."""

from __future__ import annotations

import time
from datetime import datetime

from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.streaming.ttl import (
    dedup_stream_within_watermark,
)

SCHEMA = "k string, ts timestamp, payload long"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, qname, ckpt, horizon="30 minutes", one_file_per_batch=False):
    reader = spark.readStream.schema(SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    out = dedup_stream_within_watermark(
        reader.parquet(src), ["k"], ts_col="ts", horizon=horizon
    )
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _t(minute):
    return datetime(2026, 1, 1, 12, minute % 60, 0)


def test_within_horizon_duplicates_collapse(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(spark, src, [
        ("a", _t(0), 1), ("a", _t(5), 2), ("a", _t(10), 3),
        ("b", _t(0), 4),
    ])
    qname = f"ttl1_{int(time.time())}"
    _drain(spark, src, qname, str(tmp_path / "ck"))
    got = sorted((r.k, r.payload) for r in spark.table(qname).collect())
    # first arrival per key inside one micro-batch; 'a' collapses
    assert [k for k, _ in got] == ["a", "b"]


def test_beyond_horizon_duplicate_reemits(spark, tmp_path):
    """The TTL semantic: once the watermark passes key_ts + horizon the
    key's state is evicted, so a much-later duplicate EMITS AGAIN —
    exact global dedup would swallow it. Eviction runs at micro-batch
    boundaries against the watermark computed from the PREVIOUS batch,
    so the duplicate must arrive one full batch after the watermark
    passes a's eviction bound: file 1 plants a's record plus a late
    sibling that advances the watermark, file 2 is a spacer batch
    during which a's state is evicted, file 3 carries the far-future
    duplicate (maxFilesPerTrigger=1 keeps the files in separate
    micro-batches)."""
    src = str(tmp_path / "src")
    _write(spark, src, [("a", _t(0), 1), ("mover", datetime(2026, 1, 1, 14, 0), 2)])
    time.sleep(1.1)  # distinct file mtimes keep the batch order stable
    _write(spark, src, [("spacer", datetime(2026, 1, 1, 14, 1), 7)])
    time.sleep(1.1)
    _write(spark, src, [("a", datetime(2026, 1, 1, 15, 0), 3)])
    qname = f"ttl2_{int(time.time())}"
    _drain(spark, src, qname, str(tmp_path / "ck"), one_file_per_batch=True)
    a_payloads = sorted(
        r.payload for r in spark.table(qname).collect() if r.k == "a"
    )
    assert a_payloads == [1, 3], "evicted key must re-emit past the horizon"


def test_checkpoint_recovery_preserves_state(spark, tmp_path):
    """Across a stop/start on the same checkpoint, the dedup state
    reloads: a within-horizon duplicate arriving in the SECOND run is
    still dropped (a fresh state would re-emit it). File sink — the
    memory sink cannot recover from a checkpoint."""
    src, sink, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    _write(spark, src, [("a", _t(0), 1), ("b", _t(10), 2)])

    def run():
        out = dedup_stream_within_watermark(
            spark.readStream.schema(SCHEMA).parquet(src), ["k"],
            ts_col="ts", horizon="30 minutes",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    assert spark.read.parquet(sink).count() == 2
    # duplicate of 'a' 5 minutes later: above the watermark
    # (t10 - 30m) and inside a's horizon -> recovered state drops it
    _write(spark, src, [("a", _t(5), 9)])
    run()
    rows = sorted((r.k, r.payload) for r in spark.read.parquet(sink).collect())
    assert rows == [("a", 1), ("b", 2)]


def test_state_is_bounded_by_horizon_not_history(spark, tmp_path):
    """Plan-level pin: the physical plan must carry the
    dropDuplicatesWithinWatermark operator (state eviction contract),
    not the unbounded StreamingDeduplicate."""
    stream = spark.readStream.schema(SCHEMA).parquet(str(tmp_path))
    out = dedup_stream_within_watermark(stream, ["k"])
    # analyzed plan: the TTL node is DeduplicateWithinWatermark
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan

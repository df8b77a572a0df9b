"""Structured Streaming extensions (SURVEY.md §1.3: the reference is
batch-only; incremental ingest is our §7 milestone-5 extension).

Two stream shapes:
  * incremental_ingest — file-source stream of new text documents ->
    chunk -> embed -> ``foreachBatch`` upsert into the vector table.
    The only streaming state is the file-source checkpoint; the upsert
    itself is idempotent per batch (dynamic partition overwrite keyed by
    batch partitions would dedupe replays; append is the default here).
  * windowed_event_counts — watermarked tumbling-window aggregation over
    an event stream (the streaming twin of the batch ``events_hourly``
    harness query, which the driver oracle-checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import EngineConfig
from ..operators import chunking as CH
from ..operators.embedding import embed


def incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    vector_table_path: str,
    checkpoint_dir: str,
    model: str = "all-MiniLM-L6-v2",
    strategies: tuple[str, ...] = ("recursive",),
    cfg: EngineConfig | None = None,
    backend: str = "hash",
) -> StreamingQuery:
    """Watch ``input_dir`` for new text/markdown files; chunk + embed
    each micro-batch and append to the vector table parquet.

    The transformation graph is the SAME code the batch path uses —
    chunker UDFs and the embed stage are batch/stream agnostic, which is
    the point of keeping them as DataFrame -> DataFrame functions."""
    stream = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.{md,txt}")
        .load(input_dir)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("content"),
        )
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunks = CH.chunk_documents(batch_df, strategies, text_col="content", source_col="path", cfg=cfg)
        vectors = embed(chunks, model, text_col="content", backend=backend).withColumn(
            "model", F.lit(model)
        )
        vectors.write.mode("append").partitionBy("strategy", "model").parquet(vector_table_path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of the same key arriving
    within the watermark horizon (``dropDuplicatesWithinWatermark``) —
    state is bounded by the watermark instead of growing forever, which
    is the only viable exact-dedup contract on an unbounded stream. The
    batch twin is operators/dedup.exact_dedup."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type over a stream
    with columns (ts: timestamp, event_type, value). Late rows beyond the
    watermark are dropped; state is bounded by watermark horizon."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "avg_value",
        )
    )

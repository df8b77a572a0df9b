"""Streaming sketch rollup pins (streaming/sketches.py — r11,
registration queued for the r12 window): a real availableNow drain of
the watermarked windowed Theta+KLL aggregation, then batch-merged to
totals, must answer exactly like batch sketches over the same rows —
and exactly like the TRUE answers in the Theta sparse regime."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    quantiles as Q,
    setsketches as TS,
)
from rag_project_with_embeddings_and_vector_database_spark.streaming import (
    sketches as SS,
)

SCHEMA = "g long, u long, v double, ts timestamp"


def _rows(spark):
    # 2 groups x 600 rows over 3 event-time windows; u distinct-space
    # 150 per group (sparse regime), v = a skewed metric
    return spark.range(1200).selectExpr(
        "id % 2 AS g",
        "(id % 300) + (id % 2) * 1000 AS u",
        "CAST(id % 97 AS DOUBLE) AS v",
        "timestamp_micros(CAST(1700000000000000 + (id % 3) * 600000000 "
        "+ id * 1000 AS BIGINT)) AS ts",
    )


@pytest.fixture(scope="module")
def drained(spark):
    tmp = tempfile.mkdtemp(prefix="spark_rag_sksm_")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"
    _rows(spark).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = SS.windowed_sketches(
        stream, "ts", "u", "v", ["g"], window="10 minutes",
        watermark="1 minute",
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sketch_table")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sketch_table")
    yield out.localCheckpoint()
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_emits_one_sketch_row_per_window_group(drained):
    assert drained.count() == 6  # 3 windows x 2 groups
    assert drained.filter(F.col("n_rows") <= 0).count() == 0


def test_merged_stream_sketches_match_batch_and_truth(spark, drained):
    """The headline contract: streaming-emitted blobs, merged offline
    per group, give the SAME distinct estimates as batch sketches over
    the same rows — and the exact truth in the sparse regime; KLL
    medians sit within the rank bound of the true medians."""
    per_group = SS.merge_sketch_table(drained, ["g"])
    got_d = {
        r.g: r.distinct_est
        for r in TS.theta_estimates(per_group, ["g"]).collect()
    }
    batch = _rows(spark)
    truth = {
        r.g: r.d
        for r in batch.groupBy("g")
        .agg(F.countDistinct("u").alias("d"))
        .collect()
    }
    assert got_d == truth  # sparse regime: exact
    # KLL: merged streaming quantiles within the audit bound
    qt = Q.kll_quantile_table(per_group, [0.5], ["g"])
    audit = Q.kll_rank_check(batch, "v", qt, ["g"]).collect()
    assert len(audit) == 2 and all(r.within_bound for r in audit)


def test_sketch_table_merges_across_windows_and_groups(spark, drained):
    """Rolling the whole table to ONE row answers the global questions
    without re-reading the stream: exact global distinct (sparse),
    total row count preserved."""
    total = SS.merge_sketch_table(drained.withColumn("all", F.lit(1)), ["all"])
    row = total.first()
    assert row.n_rows == 1200
    est = TS.theta_estimates(total, ["all"]).first().distinct_est
    # even ids keep even residues (150 values), odd ids keep odd
    # residues shifted by 1000 (150 values) -> 300 global distincts
    assert est == 300


def test_windowed_cms_drain_merges_to_exact_batch_counters(spark):
    """Streaming CMS parity is EXACT, not estimate-vs-estimate: a full
    availableNow drain of the windowed counter aggregation, rolled up
    per group with cms_rollup (counter addition), must equal the batch
    cms_build counter table bit-for-bit — and point queries through
    the merged counters must never undercount."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        freqsketch as CM,
    )
    from rag_project_with_embeddings_and_vector_database_spark.streaming.sketches import (
        windowed_cms,
    )

    tmp = tempfile.mkdtemp(prefix="spark_rag_scms_")
    try:
        rows = _rows(spark).selectExpr("g", "CAST(u AS STRING) AS v", "ts")
        rows.write.parquet(f"{tmp}/src")
        stream = spark.readStream.schema("g long, v string, ts timestamp").parquet(
            f"{tmp}/src"
        )
        agg = windowed_cms(
            stream, "ts", "v", ["g"], window="10 minutes", watermark="1 minute",
            depth=4, width=256,
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("cms_stream")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        drained = spark.sql("SELECT g, depth, bucket, cnt FROM cms_stream")
        merged = CM.cms_rollup(drained, ["g"])
        batch = CM.cms_build(rows, "v", ["g"], depth=4, width=256)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, batch.collect())
        )
        audit = CM.cms_error_audit(
            rows, merged, "v", ["g"], depth=4, width=256
        ).collect()
        assert all(r.never_undercounts for r in audit)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

"""Salted join equivalence + streaming dedup tests."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import joins as J
from rag_project_with_embeddings_and_vector_database_spark.streaming.ingest import (
    streaming_dedup,
)


def test_salted_join_equals_plain_join(spark):
    # one pathologically hot key (80% of left rows)
    left = spark.createDataFrame(
        [(1 if i % 5 else 2, i) for i in range(500)], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unmatched")], ["k", "rv"])
    plain = {tuple(r) for r in left.join(right, "k").select("k", "lv", "rv").collect()}
    salted = {tuple(r) for r in J.salted_join(left, right, "k", salt=4).select("k", "lv", "rv").collect()}
    assert salted == plain and len(plain) == 500


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (9, "b")], ["k", "lv"])
    right = spark.createDataFrame([(1, "x")], ["k", "rv"])
    rows = {(r.k, r.lv, r.rv) for r in J.salted_join(left, right, "k", salt=3, how="left").collect()}
    assert rows == {(1, "a", "x"), (9, "b", None)}


def test_salted_join_rejects_outer_right(spark):
    import pytest

    left = spark.createDataFrame([(1, "a")], ["k", "lv"])
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "rv"])
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            J.salted_join(left, right, "k", salt=3, how=how)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "dd_src"
    src.mkdir()
    rows = [
        {"k": "a", "ts": "2024-01-01 00:00:00"},
        {"k": "a", "ts": "2024-01-01 00:10:00"},  # duplicate within watermark
        {"k": "b", "ts": "2024-01-01 00:20:00"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("k string, ts string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = streaming_dedup(stream, ["k"], watermark="1 hour")
    name = f"dd_{int(time.time())}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(r.k for r in spark.sql(f"SELECT * FROM {name}").collect())
    assert got == ["a", "b"]

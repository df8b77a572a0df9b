"""Unit tests for the native text/vector expression library."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.functions import text as TX
from rag_project_with_embeddings_and_vector_database_spark.functions import vectors as V
from rag_project_with_embeddings_and_vector_database_spark.operators.chunking import (
    split_sentences,
    token_count,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_token_count_matches_reference_heuristic(spark):
    # reference: len(text.split()) + len(text)//4 (utils.py:30-35)
    cases = ["hello world", "  a  b  ", "", "one", "x " * 100]
    df = spark.createDataFrame([(c,) for c in cases], ["t"])
    got = [r.n for r in df.select(TX.token_count("t").alias("n")).collect()]
    want = [len(c.split()) + len(c) // 4 for c in cases]
    assert got == want
    # python-side twin used inside chunkers agrees
    assert [token_count(c) for c in cases] == want


def test_sentences_portable_split(spark):
    text = "First sentence. Second one! Third? tail without end"
    got = _one(spark, TX.sentences(F.lit(text)))
    assert got == ["First sentence.", "Second one!", "Third?", "tail without end"]
    # python twin (reference regex with lookbehind) equals the portable form here
    assert split_sentences(text) == got


def test_preprocess_collapses_whitespace(spark):
    assert _one(spark, TX.preprocess(F.lit("  a\t b\n\nc  "))) == "a b c"


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is here",), ("der hund und die katze ist nicht da",), ("xyzzy qwerty",)],
        ["t"],
    )
    got = [r.l for r in df.select(TX.lang_id("t").alias("l")).collect()]
    assert got == ["en", "de", "und"]


def test_quality_score_bounds(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = d.select(TX.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], ["a", "b"])
    row = df.select(
        V.dot("a", "b").alias("d"),
        V.norm("a").alias("n"),
        V.cosine("a", "b").alias("c"),
    ).collect()[0]
    assert row.d == 4.0
    assert row.n == 3.0
    assert abs(row.c - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], ["a"])
    out = df.select(V.norm(V.l2_normalize("a")).alias("n")).collect()
    assert abs(out[0].n - 1.0) < 1e-12
    assert out[1].n == 0.0  # zero vector passes through


def test_md5_long_is_deterministic_and_positive(spark):
    a = _one(spark, TX.md5_long(F.lit("hello")))
    b = _one(spark, TX.md5_long(F.lit("hello")))
    c = _one(spark, TX.md5_long(F.lit("hellp")))
    assert a == b and a != c and 0 <= a < (1 << 60)

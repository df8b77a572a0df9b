"""Gopher A1.2 repetition-filter pins (operators/repetition.py):
hand-computed signal arithmetic, position-union (no double count) for
duplicated n-grams, NULL handling, threshold vetoes, and the
scan-local shape of the line/paragraph censuses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    repetition as RP,
)


def _one(spark, text, **overrides):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return RP.repetition_rules(df, **overrides).collect()[0]


def test_line_census_arithmetic(spark):
    # 4 lines, "dup line" (8 chars) twice -> 1 duplicate of 4 lines;
    # dup chars = 8 of 8+8+6+6 = 28
    r = _one(spark, "dup line\ndup line\nuniq a\nuniq b")
    assert r.dup_line_frac == 0.25
    assert r.dup_line_char_frac == pytest.approx(8 / 28, abs=1e-6)


def test_paragraph_census_counts_blank_line_blocks(spark):
    r = _one(spark, "para one\n\npara one\n\npara two")
    assert r.dup_para_frac == pytest.approx(1 / 3, abs=1e-6)
    assert r.dup_para_char_frac == pytest.approx(8 / 24, abs=1e-6)
    # the same text has NO duplicate lines ("para one" appears twice...
    # as lines too — 2 of 3 lines distinct)
    assert r.dup_line_frac == pytest.approx(1 / 3, abs=1e-6)


def test_top_ngram_char_fraction(spark):
    # "ab cd ab cd ab" -> top 2-gram "ab cd" occurs 2x (overlapping
    # "cd ab" also 2x; tie broken by smallest gram "ab cd"), gram chars
    # = 4, total token chars = 10
    r = _one(spark, "ab cd ab cd ab")
    assert r.top_2gram_char_frac == pytest.approx(2 * 4 / 10, abs=1e-6)


def test_dup_ngram_coverage_unions_positions(spark):
    # "a b c d e a b c d e" : every 5-gram window that repeats covers
    # ALL 10 positions exactly once -> coverage 1.0, not >1 from
    # overlapping occurrences
    r = _one(spark, "a b c d e a b c d e")
    assert r.dup_5gram_char_frac == 1.0
    # 6..10-grams: "a b c d e a" appears once only -> no dup coverage
    assert r.dup_6gram_char_frac == 0.0


def test_short_docs_have_zero_ngram_signals(spark):
    r = _one(spark, "one two")
    assert r.dup_5gram_char_frac == 0.0
    assert r.top_4gram_char_frac == 0.0
    # the only 2-gram occurs once: frac = gram chars / total chars
    assert r.top_2gram_char_frac == pytest.approx(6 / 6, abs=1e-6)


def test_null_text_scores_zero_and_passes(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = RP.repetition_rules(df).collect()[0]
    assert r.dup_line_frac == 0.0 and r.dup_10gram_char_frac == 0.0
    # no repetition evidence -> passes the REPETITION rules; emptiness
    # itself is gopher_rules' (A1.1) job, which vetoes NULL text
    assert r.passes is True


@pytest.mark.parametrize(
    "text,reason",
    [
        ("x\n" + "same line here\n" * 9 + "y", "duplicate lines"),
        ("lorem ipsum " * 30, "top 2-gram domination"),
        ("alpha beta gamma delta epsilon zeta eta " * 2 + "tail", "dup 7-gram"),
    ],
)
def test_repetitive_documents_fail(spark, text, reason):
    assert not _one(spark, text).passes, reason


def test_clean_document_passes(spark):
    words = " ".join(f"w{i}" for i in range(120))
    assert _one(spark, words).passes


def test_unknown_override_raises(spark):
    with pytest.raises(ValueError, match="unknown repetition_rules"):
        _one(spark, "x", max_zap_frac=1.0)


def test_census_is_scan_local(spark):
    """The line/paragraph censuses must stay inside the scan's
    projection — no exchange before the spine columns exist."""
    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    sig = RP.repetition_signals(df)
    spine_only = sig.select("doc_id", "dup_line_frac", "dup_para_char_frac")
    plan = spine_only._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("Join")[0].split("Window")[0]


def test_max_lines_caps_the_dup_census(spark):
    """The documented straggler guard (VERDICT r10 nit): max_lines
    bounds what the line/paragraph censuses scan. Under the cap the
    signals are identical to the unbounded default; over it the census
    measures the prefix (here: the duplicate line sits past the cap,
    so the capped dup_line_frac drops to 0)."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        repetition as RP,
    )

    text = "\n".join([f"line {i}" for i in range(10)] + ["line 3"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    base = RP.repetition_signals(df).collect()[0]
    same = RP.repetition_signals(df, max_lines=100).collect()[0]
    assert base.dup_line_frac == same.dup_line_frac > 0
    capped = RP.repetition_signals(df, max_lines=10).collect()[0]
    assert capped.dup_line_frac == 0.0

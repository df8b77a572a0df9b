"""Gopher rule-filter pins (operators/gopher.py, Rae et al. 2021
appendix A1.1): hand-computed signals on crafted documents, each rule's
veto isolated, threshold override validation, and the zero-shuffle plan
shape (the filter must stay scan-local at 100 TB)."""

from __future__ import annotations

import pytest

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    gopher as GP,
)

# A document that passes EVERY canonical rule: >=50 words, mean word
# length in [3,10], no symbols/bullets/ellipses, alphabetic, and >=2
# required stopwords ('the', 'and').
GOOD = "the quick brown fox jumps over lazy dogs and " * 6  # 54 words


def _one(spark, text, **overrides):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return GP.gopher_rules(df, **overrides).collect()[0]


def test_good_document_passes_all_rules(spark):
    r = _one(spark, GOOD)
    assert r.passes
    assert r.n_words == 54
    assert r.stopword_hits == 2  # 'the', 'and'
    assert r.alpha_word_frac == 1.0
    assert r.symbol_word_ratio == 0.0


def test_signal_arithmetic_exact(spark):
    text = "- alpha beta\ngamma delta...\n# hash line\n"
    r = _one(spark, text)
    # whitespace tokens: -, alpha, beta, gamma, delta..., #, hash, line
    assert r.n_words == 8
    # token chars: 1+5+4+5+8+1+4+4 = 32
    assert r.mean_word_len == 4.0
    # one '#' + one '...' over 8 words
    assert r.symbol_word_ratio == 0.25
    # 3 non-empty lines; 1 starts with '- '
    assert r.bullet_line_frac == pytest.approx(0.333333)
    # 1 ends with '...'
    assert r.ellipsis_line_frac == pytest.approx(0.333333)
    # words with [A-Za-z]: all but '-' and '#'
    assert r.alpha_word_frac == 0.75
    assert r.stopword_hits == 0
    assert not r.passes


@pytest.mark.parametrize(
    "text,override,reason",
    [
        ("word " * 10, {}, "too few words"),
        (GOOD.replace("the", "###"), {}, "symbol ratio + stopwords"),
        ("ab " * 60, {}, "mean word length below 3"),
        ("12 34 " * 30, {}, "alpha word fraction below 0.8"),
        ("\n".join(["- " + GOOD] * 20), {"max_bullet_line_frac": 0.5}, "bullets"),
        ("\n".join([GOOD + "..."] * 20), {}, "ellipsis lines"),
    ],
)
def test_each_rule_vetoes(spark, text, override, reason):
    assert not _one(spark, text, **override).passes, reason


def test_override_loosens(spark):
    short = "the and " * 10  # 20 words: fails canonical min_words=50
    assert not _one(spark, short).passes
    assert _one(spark, short, min_words=10).passes


def test_unknown_override_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown gopher_rules"):
        GP.gopher_rules(df, min_wordz=1)


def test_plan_is_scan_local(spark, sf_dir):
    """The whole rules projection must compile to a single scan-local
    stage: no Exchange, no Python UDF (BatchEvalPython/ArrowEvalPython)
    anywhere in the physical plan."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        GP.gopher_rules(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_gopher_sql_builder_matches_operator_bit_for_bit(spark, sf_dir):
    """The harness's _gopher_sql() DuckDB twin (the ready-made oracle
    for the r10 standalone registration) must reproduce every signal
    and the verdict bit-for-bit at CANONICAL thresholds — the capstone
    only exercises the min_stopword_hits=1 override, so this pin keeps
    the default-threshold path honest."""
    import duckdb

    from rag_project_with_embeddings_and_vector_database_spark.harness import (
        _gopher_sql,
    )

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        tuple(r)
        for r in GP.gopher_rules(df).orderBy("doc_id").collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(f"SELECT * FROM ({_gopher_sql()}) ORDER BY doc_id").fetchall()
    assert len(got) == len(want) > 0
    assert got == want


def test_null_text_gets_definite_false_verdict(spark):
    df = spark.createDataFrame([(1, None), (2, GOOD)], "doc_id long, text string")
    rows = {r.doc_id: r for r in GP.gopher_rules(df).collect()}
    assert rows[1].passes is False  # not None
    assert rows[1].n_words == 0
    assert rows[2].passes is True


def test_unicode_ellipsis_counts_as_symbol(spark):
    """ADVICE r9: the paper's symbol set includes the unicode ellipsis
    '…' (already handled by the line-suffix check) — inline '…' must
    raise symbol_word_ratio exactly like '...' does."""
    r = _one(spark, "alpha … beta … gamma … delta")
    # 7 whitespace tokens, 3 unicode-ellipsis symbols
    assert r.n_words == 7
    assert r.symbol_word_ratio == pytest.approx(3 / 7, abs=1e-6)
    mixed = _one(spark, "alpha ... beta … gamma")
    assert mixed.symbol_word_ratio == pytest.approx(2 / 5, abs=1e-6)

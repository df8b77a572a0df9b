"""Gopher-style rule-based quality filtering (Rae et al. 2021,
"Scaling Language Models: Methods, Analysis & Insights from Training
Gopher", appendix A1.1) — the standard hand-rule document filter every
large-scale LLM data pipeline runs BEFORE model-based scoring.

The reference repo has no quality filtering at all (its loader keeps
any non-empty extraction, /root/reference/src/document_loader.py:60-61);
this is north-star surface for the 100 TB corpus-prep pipeline, next to
the C4-style signals in functions/text.py (repetition_stats) and the
CCNet-style LM scorer (operators/lm.py).

Scale shape: ONE narrow projection over the corpus — every signal is a
scalar expression on the document's own text (split arrays folded with
size/filter/length, no explode), so the whole filter is scan-local,
fully codegen'd, zero shuffles, and reads exactly (id, text). At 100 TB
this runs at scan bandwidth; it is the cheapest filter in the pipeline
and therefore runs FIRST (the same filter-before-dedup discipline as
corpus_prep).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens

# Gopher's required-stopword list (the paper keeps a document only if it
# contains >= 2 of these as standalone lowercase words).
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Canonical thresholds from the paper (appendix A1.1). Exposed so
# callers can tighten/loosen per-corpus; the harness oracle pins the
# defaults.
DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    max_bullet_line_frac=0.9,
    max_ellipsis_line_frac=0.3,
    min_alpha_word_frac=0.8,
    min_stopword_hits=2,
)

_BULLET_PREFIXES = ("•", "- ", "* ")
_ELLIPSIS_SUFFIXES = ("...", "…")


def _count_occurrences(c: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal substring, as the
    engine-portable replace-and-measure expression (no regex — '#' and
    '...' need no escaping headaches in either engine)."""
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("bigint")


def gopher_signals(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher quality signals, one scan-local projection:

      n_words            whitespace token count
      mean_word_len      total token chars / n_words
      symbol_word_ratio  (#'#' + #'...' + #'…') / n_words — the paper's
                         symbol set includes the unicode ellipsis, same
                         as the ellipsis_line_frac suffix check
      bullet_line_frac   fraction of non-empty trimmed lines starting
                         with a bullet marker (•, "- ", "* ")
      ellipsis_line_frac fraction of non-empty trimmed lines ending in
                         an ellipsis ("..." or …)
      alpha_word_frac    fraction of words containing [A-Za-z]
      stopword_hits      how many of REQUIRED_STOPWORDS appear as words

    Fractions are rounded to 6 decimals so the frame hash-compares
    across engines (harness convention). NULL text (failed upstream
    parses are routine at corpus scale) is treated as empty — the doc
    gets zero signals and a definite False verdict, never a NULL that
    silently falls out of both keep and drop filters."""
    c = F.coalesce(F.col(content_col), F.lit(""))
    toks = whitespace_tokens(c)
    n_words = F.size(toks).cast("bigint")
    words_den = F.greatest(n_words, F.lit(1))
    # total token chars == length of all tokens concatenated
    tok_chars = F.length(F.concat_ws("", toks))
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines).cast("bigint")
    lines_den = F.greatest(n_lines, F.lit(1))

    def _any_prefix(line: Column) -> Column:
        out = F.lit(False)
        for p in _BULLET_PREFIXES:
            out = out | line.startswith(p)
        return out

    def _any_suffix(line: Column) -> Column:
        out = F.lit(False)
        for s in _ELLIPSIS_SUFFIXES:
            out = out | line.endswith(s)
        return out

    lower_toks = F.transform(toks, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(lower_toks, s),
        )
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(tok_chars / words_den, 6).alias("mean_word_len"),
        F.round(
            (
                _count_occurrences(c, "#")
                + _count_occurrences(c, "...")
                + _count_occurrences(c, "…")
            )
            / words_den,
            6,
        ).alias("symbol_word_ratio"),
        F.round(F.size(F.filter(lines, _any_prefix)) / lines_den, 6).alias(
            "bullet_line_frac"
        ),
        F.round(F.size(F.filter(lines, _any_suffix)) / lines_den, 6).alias(
            "ellipsis_line_frac"
        ),
        F.round(
            F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))) / words_den,
            6,
        ).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )


def gopher_rules(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    **overrides,
) -> DataFrame:
    """Signals + the paper's keep/drop verdict (`passes` boolean). The
    verdict is a pure conjunction over the signal columns, so it stays
    in the same codegen stage as the signal projection."""
    t = {**DEFAULTS, **overrides}
    unknown = set(t) - set(DEFAULTS)
    if unknown:
        raise ValueError(f"unknown gopher_rules thresholds: {sorted(unknown)}")
    s = gopher_signals(df, content_col, id_col)
    passes = (
        F.col("n_words").between(t["min_words"], t["max_words"])
        & F.col("mean_word_len").between(
            t["min_mean_word_len"], t["max_mean_word_len"]
        )
        & (F.col("symbol_word_ratio") <= t["max_symbol_word_ratio"])
        & (F.col("bullet_line_frac") <= t["max_bullet_line_frac"])
        & (F.col("ellipsis_line_frac") <= t["max_ellipsis_line_frac"])
        & (F.col("alpha_word_frac") >= t["min_alpha_word_frac"])
        & (F.col("stopword_hits") >= t["min_stopword_hits"])
    )
    return s.withColumn("passes", passes)

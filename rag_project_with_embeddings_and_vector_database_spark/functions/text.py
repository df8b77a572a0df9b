"""Text scalar functions as native (JVM-side, codegen'd) Column expressions.

Everything here compiles to Catalyst expressions — no Python UDFs — so it
stays inside WholeStageCodegen and scales linearly with executors.

Reference semantics reproduced:
  - token_count:     /root/reference/src/utils.py:30-35  (words + chars//4)
  - sentence split:  /root/reference/src/chunking.py:102-106
  - preprocess:      /root/reference/src/embeddings.py:121-130
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Reference primitives
# ---------------------------------------------------------------------------


def token_count(col: Column | str) -> Column:
    """Token-count heuristic: ``len(text.split()) + len(text)//4``.

    Python's ``str.split()`` drops empty tokens; we filter explicitly so
    the expression is portable across engines.

    Known divergence (documented, like the sentence-regex caveat): the
    Java/RE2 ``\\s`` class here is ASCII-only, while the pandas-UDF
    chunkers use Python ``str.split()`` which also splits on Unicode
    whitespace (\\u00a0, \\u2028, ...). On documents containing
    non-ASCII whitespace the SQL-side token count can differ from the
    chunker fold's count; both sides of the oracle compare (Spark and
    DuckDB) use the ASCII class, so correctness checks are unaffected.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.size(F.filter(F.split(c, r"\s+"), lambda x: x != F.lit("")))
    return (words + F.floor(F.length(c) / 4)).cast("bigint")


# Portable sentence-segmentation regex: RE2-safe (no lookbehind), matches a
# run of non-terminators followed by any run of terminators. Equivalent to
# the reference's `re.split(r'(?<=[.!?])\s+', text)` on well-formed prose.
SENTENCE_PATTERN = r"[^.!?]+[.!?]*"


def sentences(col: Column | str) -> Column:
    """Array of trimmed, non-empty sentences."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.regexp_extract_all(c, F.lit(SENTENCE_PATTERN), 0)
    # NB: explicit one-arg lambda — passing F.trim directly would make
    # transform() feed the array index into trim's optional second arg.
    trimmed = F.transform(parts, lambda x: F.trim(x))
    return F.filter(trimmed, lambda x: x != F.lit(""))


def preprocess(col: Column | str) -> Column:
    """Strip + collapse internal whitespace (embeddings.py:121-130)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# ---------------------------------------------------------------------------
# Text analysis extensions (north-star operators, BASELINE.json)
# ---------------------------------------------------------------------------

# BPE-ish word/number/symbol tokenizer — RE2-safe so the DuckDB oracle can
# evaluate the identical pattern.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic — the point is the
# operator shape (scan-side scoring, argmax across languages), not model
# quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein", "mit"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men"),
}


def regex_tokens(col: Column | str) -> Column:
    """BPE-ish tokenization via one regex scan (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0)


def whitespace_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def lang_scores(col: Column | str) -> Column:
    """Map of language -> marker-hit count over whitespace tokens."""
    toks = F.transform(whitespace_tokens(col), F.lower)
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.filter(toks, lambda t: t.isin([F.lit(m) for m in markers])))
            .cast("bigint")
            .alias("score"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    return F.array(*entries)


def lang_id(col: Column | str) -> Column:
    """Argmax language by marker score; ties broken alphabetically;
    all-zero scores -> 'und' (undetermined)."""
    scores = lang_scores(col)
    # sort by (-score, lang) and take the head
    best = F.array_sort(
        scores,
        lambda a, b: F.when(a["score"] > b["score"], F.lit(-1))
        .when(a["score"] < b["score"], F.lit(1))
        .otherwise(
            F.when(a["lang"] < b["lang"], F.lit(-1)).when(a["lang"] > b["lang"], F.lit(1)).otherwise(F.lit(0))
        ),
    )[0]
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "with", "for", "on", "as")


def quality_features(col: Column | str) -> list[Column]:
    """Aliased feature columns for document quality scoring."""
    c = F.col(col) if isinstance(col, str) else col
    toks = whitespace_tokens(c)
    n_tok = F.size(toks).cast("bigint")
    n_chars = F.length(c).cast("bigint")
    punct = F.length(F.regexp_replace(c, r"[^.!?,;:]", ""))
    stop_hits = F.size(F.filter(F.transform(toks, F.lower), lambda t: t.isin([F.lit(s) for s in STOPWORDS])))
    return [
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 6).alias("avg_token_len"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
    ]


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs with some
    stopword mass and mild punctuation (heuristics from C4/Gopher-style
    quality filters, expressed as one arithmetic expression)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = whitespace_tokens(c)
    n_tok = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(F.transform(toks, F.lower), lambda t: t.isin([F.lit(s) for s in STOPWORDS]))).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    stop_score = F.least(stop_hits / F.greatest(n_tok, F.lit(1.0)) * 4.0, F.lit(1.0))
    return F.round((len_score * 0.7 + stop_score * 0.3), 6)


def tfidf_top_terms(df, content_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Per-document top-k keywords by smoothed TF-IDF (SURVEY §2.9 text
    analysis): tf = in-doc term count, idf = ln((N+1)/(df+1)) + 1 (the
    sklearn smooth variant), ranked per doc with a term tie-break on the
    ROUNDED score so the ordering is engine-portable.

    Scale shape: explode -> (doc, term) partial/final count agg (one
    shuffle), term-level document-frequency agg (second shuffle, join
    back on term — uniform-ish key, hot-term fan-out bounded by doc
    count), corpus size as a broadcast 1-row frame (kept lazy — no
    driver-side count()), then a per-doc top-k window. All native
    expressions; no Python in the plan."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.transform(whitespace_tokens(content_col), F.lower)).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def repetition_stats(df, content_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals (Gopher/C4-style quality-filter
    features): the fraction of line occurrences belonging to repeated
    lines, the character-weighted version of the same, and the share of
    word-bigram occurrences taken by the single most frequent bigram.

    Definitions (division-safe, exact):
      dup_line_frac      = sum(cnt | cnt>1) / sum(cnt) over per-(doc,
                           trimmed non-empty line) counts cnt
      dup_line_char_frac = same, weighted by cnt * len(line)
      top_2gram_frac     = max bigram count / total bigram count

    Scale shape: two explode -> partial/final count-agg pipelines (one
    shuffle each on (doc, line) / (doc, gram)), per-doc rollups reusing
    the doc partitioning, left-joined back to the id spine so line-less
    docs emit zeros. All native expressions."""
    lines = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.transform(F.split(F.col(content_col), "\n"), lambda x: F.trim(x)),
                lambda x: x != F.lit(""),
            )
        ).alias("line"),
    )
    line_counts = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("cnt"))
    dup = F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))
    per_doc_lines = line_counts.groupBy(id_col).agg(
        F.round(
            F.sum(dup) / F.greatest(F.sum("cnt"), F.lit(1)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum(dup * F.length("line"))
            / F.greatest(F.sum(F.col("cnt") * F.length("line")), F.lit(1)),
            6,
        ).alias("dup_line_char_frac"),
    )
    toks = whitespace_tokens(F.lower(F.col(content_col)))
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.try_element_at(toks, (i + 1).cast("int")),
                        F.try_element_at(toks, (i + 2).cast("int")),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    gram_counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc_grams = gram_counts.groupBy(id_col).agg(
        F.round(F.max("cnt") / F.greatest(F.sum("cnt"), F.lit(1)), 6).alias("top_2gram_frac")
    )
    return (
        df.select(id_col)
        .join(per_doc_lines, id_col, "left")
        .join(per_doc_grams, id_col, "left")
        .select(
            id_col,
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
            F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
        )
    )


def md5_long(col: Column | str, *salt: Column) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5 as BIGINT.

    Portable across engines (DuckDB: ``('0x'||substr(md5(x),1,15))::BIGINT``);
    used as the base hash for MinHash/SimHash/fingerprinting so oracles can
    reproduce signatures exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat_ws("\x1f", c, *salt)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")

"""Corpus-frequency segment dedup — C4-style boilerplate line removal.

C4 (Raffel et al. 2020, §2.2) discards any line that occurs more than
once in the corpus; CCNet and RefinedWeb run the same shape at
paragraph granularity. This is DISTINCT from the pairwise dedup
families (operators/dedup.py): no pairs form at all — a segment's
corpus-wide document frequency is the verdict, so the whole operator
is explode -> one exact count-distinct aggregation -> anti-join ->
order-preserving reassembly. Reference scope note: the reference
pipeline has no corpus-level cleaning; this is north-star extension
surface (SURVEY.md §2.9).

Shuffle shape at 100 TB: the explode is scan-local (n x avg-segments
rows, never materialized to the driver); the document-frequency
aggregation is a two-phase hash agg on the segment text (map-side
partial count-distinct); the frequent set — segments in >= min_docs
documents — is SMALL at production thresholds (that is the point of
boilerplate: few distinct strings, many occurrences), so the anti-join
broadcasts it when the caller asserts that bound; reassembly is one
groupBy(doc) with an array_sort on the carried position — the same
exchange key the explode's parent already had. Skew note: a single
mega-frequent segment ("Subscribe to our newsletter") is ONE row
after partial aggregation per partition — count-distinct on (seg,
doc) pairs shuffles at most one row per segment per partition, so a
boilerplate segment cannot hot-spot a reducer the way a join key
would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(df: DataFrame, content_col: str, id_col: str, split_pattern: str):
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(content_col), split_pattern)).alias(
                "pos", "seg"
            ),
        )
        .withColumn("seg", F.trim("seg"))
        .filter(F.col("seg") != "")
    )


def frequent_segments(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    split_pattern: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """The corpus' boilerplate census: (seg, n_docs) for every trimmed
    non-empty segment occurring in >= ``min_docs`` DISTINCT documents.
    Run it alone for observability (what would be stripped?) or feed
    it to ``strip_frequent_segments``. Exact count-distinct — at
    production scale swap in approx_count_distinct only if the
    threshold is far from the error band."""
    return (
        _segments(df, content_col, id_col, split_pattern)
        .groupBy("seg")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_frequent_segments(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    split_pattern: str = "\n",
    join_delim: str = "\n",
    min_docs: int = 2,
    broadcast_frequent: bool = False,
) -> DataFrame:
    """C4-style cleaning: split each document on ``split_pattern``,
    drop every trimmed segment that occurs in >= ``min_docs`` distinct
    documents, and reassemble the survivors IN ORIGINAL ORDER joined
    by ``join_delim``. Returns (id_col, clean_text) for EVERY input
    document — a document whose segments are all boilerplate (or all
    empty) comes back as the empty string, never disappears.

    ``broadcast_frequent=True`` hints the frequent set broadcast into
    the anti-join — set it when ``min_docs`` is high enough that the
    boilerplate census is bounded (the production case); leave False
    to let AQE decide from the measured size (a low threshold over a
    huge corpus can make the frequent set large)."""
    seg = _segments(df, content_col, id_col, split_pattern)
    freq = (
        seg.groupBy("seg")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("seg")
    )
    if broadcast_frequent:
        freq = F.broadcast(freq)
    kept = seg.join(freq, "seg", "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            join_delim,
        ).alias("clean_text")
    )
    return (
        df.select(id_col)
        .join(clean, id_col, "left")
        .select(id_col, F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )

"""Language-model quality scoring (north-star extension).

CCNet (Wenzek et al. 2020) — the pipeline behind the LLaMA pretraining
corpus — scores every crawled document with a reference language model
and keeps/sorts by perplexity: fluent, well-edited text scores low;
gibberish, boilerplate, and OCR noise score high. The full KenLM is a
5-gram model; the pipeline-shaped core is the same with a unigram
reference model, and a unigram model is exactly one aggregation — so
this stays fully relational and the DuckDB oracle replays every score
bit-for-bit (no model binary, no UDF).

Scale shape: training the reference model is one token-count
aggregation over the (bounded, curated) reference corpus; scoring is
one explode + one equi-join of tokens against the model (broadcast
while the vocab is small; a plain shuffle join on term once it is not
— both sides are already token-keyed) + one per-doc average. No
windows, no driver loops; the model frame is the only thing collected
nowhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens


def _tokens(df: DataFrame, text_col: str) -> F.Column:
    return F.explode(F.transform(whitespace_tokens(text_col), F.lower)).alias("term")


def train_unigram_lm(
    ref: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """Fit the unigram reference model: (term, logp) with additive
    (Lidstone) smoothing — logp = ln((cnt + alpha) / (N + alpha*(V+1))),
    the +1 reserving one smoothed slot for out-of-vocabulary terms so
    scoring never hits ln(0). Log-probs are carried as FIXED-POINT
    micro-units (``logp_micro`` = round(ln * 1e6) as BIGINT): the
    per-doc score is then an INTEGER sum — exact and order-independent
    — where a double ``avg`` flips the 6th decimal between engines
    depending on partial-aggregation order (observed at sf0.001).
    ``logp`` (double) rides along for human use."""
    counts = ref.select(_tokens(ref, text_col)).groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("double").alias("n_tokens"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    micro = F.round(
        F.log(
            (F.col("cnt") + F.lit(alpha))
            / (F.col("n_tokens") + F.lit(alpha) * (F.col("vocab") + F.lit(1.0)))
        )
        * F.lit(1_000_000.0),
        0,
    ).cast("bigint")
    return counts.crossJoin(F.broadcast(totals)).select(
        "term",
        micro.alias("logp_micro"),
        (micro / F.lit(1_000_000.0)).alias("logp"),
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    oov_logp_micro: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a trained unigram model: mean negative
    log-probability per token (the log of perplexity for a unigram
    model). ``oov_logp_micro`` is the smoothed out-of-vocabulary
    log-prob in the model's micro-units (compute it from the same
    N/V/alpha — the harness derives it from one 1-row aggregate). The
    per-doc aggregation sums BIGINT micro-units (exact in any order)
    and divides once, so the 6-decimal score is engine- and
    partitioning-independent. Token-less documents score NULL (no
    tokens to judge — the caller routes them to the length filters
    instead). The model join is term-keyed and broadcastable while the
    vocab is bounded; the score rejoins the doc spine on the id key
    (one doc-keyed SMJ at scale), carrying every non-text column of
    ``docs`` through so callers don't pay a second spine join for
    grouping keys like lang."""
    toks = docs.select(F.col(id_col), _tokens(docs, text_col))
    msum = F.sum(F.coalesce(F.col("logp_micro"), F.lit(int(oov_logp_micro))))
    cnt = F.count(F.lit(1))
    scored = (
        toks.join(F.broadcast(model.select("term", "logp_micro")), "term", "left")
        .groupBy(id_col)
        .agg(
            F.round(-msum / (cnt * F.lit(1_000_000.0)), 6).alias("lm_nll"),
            cnt.cast("bigint").alias("n_tokens"),
        )
    )
    return docs.drop(text_col).join(scored, id_col, "left")


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "lm_nll",
    id_col: str = "doc_id",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by LM score and
    cut into ``n_buckets`` equal-count tiles (bucket 1 = most fluent).
    Deterministic via the (score, id) tie-break; NULL-scored docs sort
    last, matching both engines' NULLS LAST default over ASC. CCNet
    runs this per language shard — pass ``partition_cols=['lang']`` so
    each sort stays inside a shard (the scale shape); the unpartitioned
    window is a single-reducer sort and only fits bounded frames."""
    from pyspark.sql import Window

    w = Window.partitionBy(*(partition_cols or [])).orderBy(
        F.col(score_col).asc_nulls_last(), F.col(id_col).asc()
    )
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w).cast("int"))

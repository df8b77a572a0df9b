"""Sequence packing: assemble documents into fixed-token-budget training
sequences (the batch-construction step between dedup/filtering and
tokenizer sharding in an LLM data pipeline).

Design for 100 TB:
  * The greedy fold never sees document TEXT — token counts are computed
    scan-side as native expressions, so the Arrow payload entering the
    Python fold is (id, tokens) pairs: ~16 bytes/doc, not the corpus.
  * Packing is per-bucket, with buckets assigned by the salted portable
    hash (operators/sampling.hash_bucket): deterministic under
    repartitioning/retries, and each bucket packs independently — one
    exchange on the bucket key, perfect parallelism, no global sequence
    counter. Sequence ids are (bucket, seq_in_bucket), so ids never
    coordinate across executors.
  * The greedy rule is a linear recursion, so the DuckDB oracle can
    verify every assignment exactly via a recursive CTE — unusual for an
    order-dependent fold, possible here because the fold state is one
    (seq, acc) pair.

Greedy rule (docs in (bucket, id) order): a doc starts a new sequence
when adding it would exceed ``budget_tokens`` — unless the sequence is
empty, so an oversized doc occupies a sequence alone.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from .sampling import hash_bucket

def _pack_schema(id_type: str) -> str:
    """Output schema for the per-bucket fold; the doc_id column keeps
    the INPUT id column's type (ADVICE r3: a hard-coded ``long`` would
    miscast string or decimal ids inside applyInPandas)."""
    return f"bucket int, doc_id {id_type}, doc_tokens bigint, seq_id bigint"


# the common case (bigint ids), kept for callers that import the constant
PACK_SCHEMA = _pack_schema("long")


def _pack_fn(budget: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, seq, acc = [], 0, 0
        for toks in pdf["doc_tokens"]:
            t = int(toks)
            if acc > 0 and acc + t > budget:
                seq, acc = seq + 1, t
            else:
                acc += t
            seqs.append(seq)
        pdf["seq_id"] = seqs
        return pdf[["bucket", "doc_id", "doc_tokens", "seq_id"]]

    return fn


def sequence_pack(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int = 512,
    n_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(bucket, doc_id, doc_tokens, seq_id, seq_pos) — every doc exactly
    once; per-(bucket, seq_id) token sums never exceed ``budget_tokens``
    except single oversized docs. ``seq_pos`` is the doc's position
    within its sequence."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    meta = df.select(
        F.col(id_col).alias("doc_id"),
        (hash_bucket(id_col, seed) % n_buckets).cast("int").alias("bucket"),
        # NULL text -> 0 tokens: keeps the fold total (a NULL bigint
        # reaches pandas as NaN and would crash int()) and keeps the
        # exactly-once guarantee — every doc gets a sequence slot.
        F.coalesce(token_count(content_col), F.lit(0)).alias("doc_tokens"),
    )
    schema = _pack_schema(df.schema[id_col].dataType.simpleString())
    packed = meta.groupBy("bucket").applyInPandas(_pack_fn(budget_tokens), schema)
    w = Window.partitionBy("bucket", "seq_id").orderBy("doc_id")
    return packed.withColumn("seq_pos", (F.row_number().over(w) - 1).cast("int"))

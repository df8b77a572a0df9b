"""Embedding inference as Arrow-batched pandas UDFs (SURVEY.md §2.4).

Reference behavior: sentence-transformers ``encode(texts,
normalize_embeddings=True)`` over batches of 32, five models of dim
384-1024 (/root/reference/src/embeddings.py:48-57,132-147; registry
/root/reference/config.py:35-41).

Spark-first design (this is BASELINE.json's ``spark_approach``):
  * ``mapInPandas`` iterator form — the model loads ONCE per executor
    python worker and streams Arrow batches through ``encode``; batch
    size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``,
    replacing the reference's manual batch loop.
  * The default backend is a deterministic hash embedder (feature-hashed
    unigrams, L2-normalized): no model download, fully reproducible, and
    exercises the identical Spark plumbing (schema, batching, normalize).
    The sentence-transformers backend activates automatically when the
    library is importable.
  * Multi-model fan-out (E4) = one embed pass per model over the chunk
    union, output partitioned by (strategy, model) — job-sequenced like
    the reference loop (main.py:213-216) to bound executor memory.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EMBEDDING_MODELS


def _hash_embed_one(text: str, dim: int) -> np.ndarray:
    """Feature-hash unigrams into ``dim`` buckets with +/- signs, then
    L2-normalize — a deterministic, engine-independent stand-in with the
    same contract as a sentence-transformers encode."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        d = hashlib.md5(tok.encode("utf-8")).digest()
        idx = int.from_bytes(d[:4], "big") % dim
        sign = 1.0 if d[4] & 1 else -1.0
        v[idx] += sign
    n = math.sqrt(float(np.dot(v, v)))
    if n > 0:
        v /= n
    return v.astype(np.float32)


_TOKEN_MEMO: dict[str, tuple[int, float]] = {}


def hash_embed_batch(texts: list[str], dim: int) -> np.ndarray:
    """Vectorized batch form of ``_hash_embed_one`` — bit-identical
    values (the accumulated addends are exact +/-1 floats and the
    squared norms are exact integers, so accumulation order cannot
    change a single bit), but one ``np.add.at`` scatter per batch
    instead of a per-token Python loop, plus a per-worker token-digest
    memo (corpora repeat tokens heavily)."""
    n = len(texts)
    if not n:
        return np.zeros((0, dim), np.float32)
    if len(_TOKEN_MEMO) > 2_000_000:  # bound worker memory on huge vocabularies
        _TOKEN_MEMO.clear()
    rows: list[int] = []
    idxs: list[int] = []
    signs: list[float] = []
    for i, t in enumerate(texts):
        for tok in (t or "").lower().split():
            r = _TOKEN_MEMO.get(tok)
            if r is None:
                d = hashlib.md5(tok.encode("utf-8")).digest()
                r = (int.from_bytes(d[:4], "big"), 1.0 if d[4] & 1 else -1.0)
                _TOKEN_MEMO[tok] = r
            rows.append(i)
            idxs.append(r[0] % dim)
            signs.append(r[1])
    m = np.zeros((n, dim), np.float64)
    if rows:
        np.add.at(m, (np.asarray(rows), np.asarray(idxs)), np.asarray(signs))
    norms = np.sqrt((m * m).sum(axis=1))
    nz = norms > 0
    m[nz] /= norms[nz][:, None]
    return m.astype(np.float32)


def _load_st_model(model_name: str):
    """Import-gated real backend; raises a clear error when the library
    is absent (it is not installed in this container)."""
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "sentence-transformers is not installed; use backend='hash' "
            "(deterministic) or install the library for real inference"
        ) from e
    return SentenceTransformer(model_name)


def available_backends() -> list[str]:
    out = ["hash"]
    try:  # pragma: no cover - environment dependent
        import sentence_transformers  # type: ignore  # noqa: F401

        out.append("sentence-transformers")
    except ImportError:
        pass
    return out


def embed(
    df: DataFrame,
    model: str,
    text_col: str = "content",
    out_col: str = "embedding",
    backend: str = "hash",
    batch_size: int = 32,
) -> DataFrame:
    """Append a unit-normalized ``array<float>`` embedding column.

    ``mapInPandas`` iterator form: per-partition setup happens once, then
    every Arrow batch is encoded vectorized — the scalable replacement
    for the reference's batch loop (embeddings.py:132-147)."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    dim = EMBEDDING_MODELS.get(model, 384)
    schema = T.StructType(list(df.schema) + [T.StructField(out_col, T.ArrayType(T.FloatType()))])
    cols = df.columns

    if backend == "hash":

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vecs = hash_embed_batch(pdf[text_col].tolist(), dim)
                pdf = pdf.copy()
                pdf[out_col] = [v for v in vecs]
                yield pdf

    elif backend == "sentence-transformers":  # pragma: no cover - env dependent

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            st = _load_st_model(model)
            for pdf in batches:
                vecs = st.encode(
                    pdf[text_col].tolist(),
                    batch_size=batch_size,
                    normalize_embeddings=True,
                )
                pdf = pdf.copy()
                pdf[out_col] = [np.asarray(v, dtype=np.float32) for v in vecs]
                yield pdf

    else:
        raise ValueError(f"unknown backend {backend!r}; available: {available_backends()}")

    return df.mapInPandas(gen, schema=schema)


def embed_fanout(
    chunks: DataFrame,
    models: list[str] | None = None,
    text_col: str = "content",
    backend: str = "hash",
) -> Callable[[], Iterator[tuple[str, DataFrame]]]:
    """E4 multi-model fan-out as a generator of (model, embedded_df):
    callers sequence one Spark job per model (bounding executor memory,
    like the reference's model loop main.py:213-216)."""
    models = models or list(EMBEDDING_MODELS)

    def jobs() -> Iterator[tuple[str, DataFrame]]:
        for m in models:
            yield m, embed(chunks, m, text_col=text_col, backend=backend).withColumn(
                "model", F.lit(m)
            )

    return jobs


def embed_incremental(
    corpus: DataFrame,
    cache: DataFrame | None,
    model: str,
    text_col: str = "content",
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
    vec_col: str = "embedding",
    backend: str = "hash",
) -> DataFrame:
    """Content-addressed incremental embedding: re-embed ONLY texts
    whose content hash is absent from the stored cache.

    At 100 TB the embedding model is the single most expensive stage of
    the pipeline (GPU-hours, not shuffle-seconds), and day-2 corpora
    are overwhelmingly unchanged — so production pipelines key
    embeddings by a hash of the text and reuse every hit. This is that
    operator:

      * ``content_hash`` = md5 of the raw text (any collision-resistant
        digest works; md5 is used so the harness oracle can replay the
        key cross-engine) computed scan-locally;
      * cache hits resolve by one equi-join on the hash — the ONLY
        shuffle in the plan, and a bucketed/bucket-pruned one when the
        cache table is written partitioned by a hash prefix;
      * the model runs over the anti-join misses only, so inference
        cost is proportional to NEW content, not corpus size.

    ``cache`` holds (hash_col, vec_col) rows — typically
    ``spark.read.parquet(store)`` of a previous run's output; ``None``
    means a cold start (everything embeds). Returns the corpus columns
    plus (hash_col, vec_col, reused) where ``reused`` marks rows served
    from the cache. Same-content rows WITHIN the new corpus still embed
    once per row (the embedder is deterministic, so their vectors are
    identical by construction; deduplicating before embedding is the
    dedup family's job, not this operator's)."""
    hashed = corpus.withColumn(hash_col, F.md5(F.col(text_col)))
    if cache is None:
        return embed(
            hashed, model, text_col=text_col, out_col=vec_col, backend=backend
        ).withColumn("reused", F.lit(False))

    # One row per hash, picked DETERMINISTICALLY (min over the vector's
    # natural array ordering) rather than dropDuplicates' arbitrary
    # first-seen row: a corrupted or mixed-model store with conflicting
    # vectors for one hash then serves a stable (and oracle-checkable)
    # answer instead of a partitioning-dependent one. Well-formed
    # single-model stores have one distinct vector per hash, for which
    # min() is the identity.
    c = cache.groupBy(hash_col).agg(
        F.min(F.col(vec_col)).alias("_cached_vec")
    )
    joined = hashed.join(c, hash_col, "left")
    hits = joined.filter(F.col("_cached_vec").isNotNull()).select(
        *corpus.columns, hash_col,
        F.col("_cached_vec").alias(vec_col),
    ).withColumn("reused", F.lit(True))
    misses = joined.filter(F.col("_cached_vec").isNull()).select(
        *corpus.columns, hash_col
    )
    fresh = embed(
        misses, model, text_col=text_col, out_col=vec_col, backend=backend
    ).withColumn("reused", F.lit(False))
    return hits.unionByName(fresh)

"""Diversified re-ranking of retrieval results (north-star extension).

A plain cosine top-k (operators/retrieval.py, the reference's
``client.search`` shape — /root/reference/src/vector_db.py:93-119)
returns the k nearest neighbors even when they are near-copies of each
other; RAG answer quality and eval-set construction both want the
candidates to COVER the query's neighborhood, not repeat it. The
standard fix is Maximal Marginal Relevance (Carbonell & Goldstein,
SIGIR 1998): greedily pick the candidate maximizing

    mmr(c) = lam * rel(q, c) - (1 - lam) * max_{s in selected} sim(c, s)

Spark-first decomposition — the expensive parts stay native, only the
tiny greedy loop is Python:

  * candidate generation is the existing broadcast-scored windowed
    top-k (one pass over the corpus, k_candidates rows per query);
  * ALL float accumulation (query-candidate relevance and the
    candidate-candidate similarity matrix) happens in native codegen'd
    float64 ``zip_with``/``aggregate`` expressions — bit-reproducible
    against DuckDB's ``list_dot_product``, which is what makes the
    harness's unrolled-SQL oracle hash-exact;
  * the greedy selection runs per query group over the (k_candidates
    + k_candidates^2)-row pair frame via ``applyInPandas`` — bounded
    state per group (k_candidates <= a few hundred by contract), never
    corpus-proportional, so the shape survives any corpus size: cost
    is queries x k^2, independent of the table being searched.

The selection arithmetic is two IEEE-double multiplies and a subtract
over native-computed inputs, identical in CPython and DuckDB, so even
the greedy path replays bit-for-bit (ties broken by ascending id).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vectors as V
from .retrieval import score_pairs, topk


def _greedy_mmr(lam: float, n: int):
    """Per-query greedy MMR over a pair frame of (va, vb, rel, sim).

    Pure-Python comparisons and IEEE-double arithmetic only — every
    float it consumes was computed JVM-side, so the selection order is
    an engine-independent function of the inputs."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        rel = {}
        sim = {}
        for va, vb, r, s in zip(pdf["va"], pdf["vb"], pdf["rel"], pdf["sim"]):
            rel[va] = float(r)
            if va != vb:  # self-pairs only guarantee group membership
                sim[(va, vb)] = float(s)
        remaining = sorted(rel)  # ascending id = deterministic iteration
        selected: list = []
        out_id, out_score, out_rank = [], [], []
        one_minus = 1.0 - lam
        while remaining and len(selected) < n:
            best = None
            best_score = None
            for c in remaining:
                # true max over selected (can be negative for
                # anti-similar candidates); only the empty-selected
                # first pick has no penalty term at all
                ms = None
                for s in selected:
                    v = sim[(c, s)]
                    if ms is None or v > ms:
                        ms = v
                score = lam * rel[c] - one_minus * ms if ms is not None else lam * rel[c]
                # strict > keeps the lowest id on exact ties (remaining
                # is id-ascending) — matching the oracle's ORDER BY
                # mmr DESC, vec_id ASC
                if best_score is None or score > best_score:
                    best, best_score = c, score
            selected.append(best)
            remaining.remove(best)
            out_id.append(best)
            out_score.append(best_score)
            out_rank.append(len(selected))
        return pd.DataFrame(
            {
                "query_id": [qid] * len(out_id),
                "vec_id": out_id,
                "mmr_score": out_score,
                "rank": out_rank,
            }
        )

    return fn


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    n: int,
    k_candidates: int = 50,
    lam: float = 0.7,
    query_id: str = "query_id",
    corpus_id: str = "id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    normalized: bool = True,
) -> DataFrame:
    """MMR-diversified top-n: returns (query_id, corpus_id, mmr_score,
    rank) with at most ``n`` rows per query, selected greedily from the
    exact top-``k_candidates`` relevance candidates.

    The max-sim penalty uses ONLY candidate-candidate similarities
    (never the full corpus), so the post-candidate cost is
    O(|queries| * k_candidates^2) regardless of corpus size."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped(queries.sparkSession)
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if n > k_candidates:
        raise ValueError(f"n={n} exceeds k_candidates={k_candidates}")

    scored = score_pairs(
        queries, corpus, query_vec=query_vec, corpus_vec=corpus_vec,
        normalized=normalized, score_name="rel",
    )
    cand = topk(
        scored, [f"q_{query_id}"], k_candidates, score_col="rel",
        tiebreak_col=corpus_id,
    ).select(
        F.col(f"q_{query_id}").alias("query_id"),
        F.col(corpus_id).alias("vec_id"),
        F.col("rel"),
        F.col(corpus_vec).alias("_vec"),
    )

    # r14: candidate-vector norms attach once per join side instead of
    # per candidate pair (bit-identical; cosine_with_norms)
    a = cand.select(
        "query_id",
        F.col("vec_id").alias("va"),
        F.col("rel"),
        F.col("_vec").alias("_va_vec"),
        V.norm("_vec").alias("_na"),
    )
    b = cand.select(
        F.col("query_id").alias("_qb"),
        F.col("vec_id").alias("vb"),
        F.col("_vec").alias("_vb_vec"),
        V.norm("_vec").alias("_nb"),
    )
    # keep self-pairs (va == vb) so a single-candidate query still has a
    # group row; the greedy fn ignores their sim
    pairs = (
        a.join(b, a["query_id"] == b["_qb"])
        .withColumn(
            "sim",
            V.dot("_va_vec", "_vb_vec")
            if normalized
            else V.cosine_with_norms("_va_vec", "_vb_vec", "_na", "_nb"),
        )
        .select("query_id", "va", "vb", "rel", "sim")
    )

    qid_type = cand.schema["query_id"].dataType
    cid_type = cand.schema["vec_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type),
            T.StructField("vec_id", cid_type),
            T.StructField("mmr_score", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    out = pairs.groupBy("query_id").applyInPandas(_greedy_mmr(lam, n), out_schema)
    return out.select(
        F.col("query_id").alias(query_id),
        F.col("vec_id").alias(corpus_id),
        F.round("mmr_score", 6).alias("mmr_score"),
        F.col("rank"),
    )

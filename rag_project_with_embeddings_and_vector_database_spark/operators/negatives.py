"""Hard-negative mining for embedding-model training data (north-star
extension): for every training query, the highest-scoring corpus items
that are NOT labeled positives — the standard contrastive-training
recipe (DPR, Karpukhin et al. 2020; sentence-transformers'
mine_hard_negatives): random negatives are too easy, and the model only
learns the decision boundary from near-miss negatives.

The reference repo stops at retrieval evaluation; this closes the loop
from its retrieval machinery back to TRAINING-data production — the
output triplet table (query, positive, hard negatives) is what an
embedding fine-tune consumes.

Scale shape: the candidate pool is pluggable. The default is the exact
brute-force top-k (broadcast scored scan + windowed rank — correct at
fixture scale and the oracle's replayable twin); at 100 TB callers pass
``candidates=`` from the STORED ANN index (``knn_ivf_indexed`` — pruned
partition reads, no full scan), and everything downstream is one
anti-join against the positives table plus one per-query window rank —
both keyed on query_id, map-side combinable, never corpus-quadratic.
False negatives (unlabeled positives surfacing as top candidates) are
the known risk of the recipe; the ``min_rank`` margin skips the very
top of the ranking, the standard mitigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .retrieval import knn_bruteforce


def mine_hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    positives: DataFrame,
    k: int = 50,
    n_negatives: int = 5,
    min_rank: int = 1,
    query_id: str = "query_id",
    corpus_id: str = "id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    normalized: bool = False,
    candidates: DataFrame | None = None,
    broadcast_positives: bool = True,
) -> DataFrame:
    """(query_id, corpus_id, score, neg_rank): the ``n_negatives``
    best-scoring candidates per query that are not in ``positives``
    (columns query_id, corpus_id) and sit at candidate rank >
    ``min_rank`` (margin against unlabeled positives; 1 skips only the
    top hit). ``candidates`` substitutes a precomputed
    (query_id, corpus_id, score, rank) frame — the stored-ANN scale
    path; the default mines from the exact brute-force top-k.

    The positives anti-join rides a broadcast while the label table is
    broadcast-sized (typically a handful of labels per query); pass
    ``broadcast_positives=False`` for label tables beyond the
    broadcast/driver-memory budget (ADVICE r10) — both sides are keyed
    on query_id and the join degrades to a shuffle anti-join on a
    uniform key."""
    if candidates is None:
        candidates = knn_bruteforce(
            queries, corpus, k, query_id=query_id, corpus_id=corpus_id,
            query_vec=query_vec, corpus_vec=corpus_vec, normalized=normalized,
        )
    pos = positives.select(
        F.col(query_id), F.col(corpus_id)
    ).distinct()
    if broadcast_positives:
        pos = F.broadcast(pos)
    neg = candidates.filter(F.col("rank") > min_rank).join(
        pos, [query_id, corpus_id], "left_anti"
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(corpus_id)
    )
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= n_negatives)
        .select(query_id, corpus_id, "score", "neg_rank")
    )

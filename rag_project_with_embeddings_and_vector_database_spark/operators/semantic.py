"""SemDeDup-style semantic deduplication (north-star extension).

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540) prune web corpora by
embedding-space similarity: cluster the corpus, then drop near-identical
members WITHIN each cluster — pairwise similarity is only ever computed
inside a cluster, so the quadratic term is bounded by cluster size, not
corpus size. This is the scale path for embedding-cosine dedup: the
exact-recall variant here (operators/dedup.py
``embedding_neardup_pairs`` / ``embedding_delta``) scans all pairs via
a broadcast side and is the small-side/delta tool; SemDeDup is what a
100 TB corpus actually runs, with k chosen so the expected cluster size
keeps sum(b_i^2) tractable (the paper uses k = 11k clusters for LAION).

Composed entirely from proven machinery: the IVF coarse quantizer
(operators/retrieval.py ``build_ivf_index`` — seeded MLlib KMeans,
centroids broadcast, assignment scan-local) plus one within-bucket
self-equi-join on the cluster key. No UDFs, no driver loops.

Keeper rule: deterministic greedy min-id dominance — a document is
DROPPED iff some smaller-id document in its cluster is within the
similarity threshold. One join, one aggregation; chain-transitive
pruning can drop more than one-per-connected-component keeping would
(if A~B and B~C but not A~C, only A survives), which is the standard
greedy trade for a single-pass scale shape — near-dup chains are
themselves redundant. (The paper keeps the member with lowest
similarity to the cluster centroid; any deterministic within-group
choice preserves the method's semantics.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V
from .retrieval import build_ivf_index


def _assign(corpus, num_clusters, corpus_id, vec_col, seed):
    """Cluster assignment frame (corpus columns + bucket). MLlib KMeans
    requires k >= 2; num_clusters=1 is the degenerate one-bucket case
    (the exact all-pairs equivalence anchor) and needs no fit."""
    if num_clusters == 1:
        return corpus.withColumn("bucket", F.lit(0))
    assigned, _ = build_ivf_index(
        corpus, num_centroids=num_clusters, corpus_id=corpus_id,
        vec_col=vec_col, seed=seed,
    )
    return assigned


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_clusters: int = 16,
    corpus_id: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    normalized: bool = False,
) -> DataFrame:
    """Within-cluster near-dup candidate pairs: (id_a, id_b, cos_sim)
    with id_a < id_b, cos_sim rounded to 6 then threshold-filtered —
    the ``embedding_neardup_pairs`` contract restricted to pairs whose
    members share an embedding cluster. With ``num_clusters=1`` this
    degenerates to the exact all-pairs generator (the pytest
    equivalence pin); at scale the cluster key bounds the join: one
    exchange on ``bucket``, quadratic only within a cluster."""
    assigned = _assign(corpus, num_clusters, corpus_id, vec_col, seed)
    return _pairs_from_assigned(assigned, threshold, corpus_id, vec_col, normalized)


def _pairs_from_assigned(
    assigned: DataFrame,
    threshold: float,
    corpus_id: str,
    vec_col: str,
    normalized: bool,
) -> DataFrame:
    side = assigned.select(
        "bucket", F.col(corpus_id).alias("_id"), F.col(vec_col).alias("_v")
    )
    a = side.select(
        "bucket", F.col("_id").alias("_ida"), F.col("_v").alias("v_a")
    )
    b = side.select(
        "bucket", F.col("_id").alias("_idb"), F.col("_v").alias("v_b")
    )
    sim = V.dot("v_a", "v_b") if normalized else V.cosine("v_a", "v_b")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("_ida") < F.col("_idb"))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_clusters: int = 16,
    corpus_id: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    normalized: bool = False,
) -> DataFrame:
    """Per-document SemDeDup verdict: (corpus_id, bucket, keep) for
    EVERY corpus row — ``keep = false`` iff a smaller-id cluster-mate
    sits within ``threshold`` cosine similarity (greedy min-id
    dominance, see module docstring). The survivors
    (``filter(keep)``) are the semantically-deduplicated corpus."""
    assigned = _assign(corpus, num_clusters, corpus_id, vec_col, seed)
    # ONE quantizer fit shared by the pair join and the verdict spine
    pairs = _pairs_from_assigned(assigned, threshold, corpus_id, vec_col, normalized)
    dropped = pairs.select(F.col("id_b").alias(corpus_id)).distinct()
    return (
        assigned.select(corpus_id, "bucket")
        .join(dropped.withColumn("_drop", F.lit(True)), corpus_id, "left")
        .select(
            corpus_id,
            "bucket",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )

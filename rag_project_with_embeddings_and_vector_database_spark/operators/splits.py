"""Split construction for training corpora (north-star extension).

Builds ON the permanent-hash discipline of operators/sampling.py
(imported, not modified) and the dup-graph machinery of
operators/dedup.py: splits here are keyed on *derived* identities
(duplicate clusters) rather than raw row ids, closing the train/test
leaks a per-row hash cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components
from .sampling import hash_split


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: int = 42,
) -> DataFrame:
    """Near-dup-aware train/test split: a document's split is keyed on
    its DUPLICATE-CLUSTER id, not its own id, so two near-duplicates
    can never straddle the split boundary — the leak hash_split alone
    cannot prevent (a benchmark answer crawled twice lands in train AND
    test with probability 2*p*(1-p) under per-doc hashing; under
    per-cluster hashing, never). ``pairs`` is any near-dup pair frame
    (minhash_lsh_pairs / simhash_pairs / ngram_jaccard_pairs output);
    cluster ids come from min-label connected components over it, and
    singleton docs (no dup edge) fall back to their own id, which
    agrees with the component-label convention (component = min
    reachable id, so a cluster's label IS one of its member ids).

    Scale shape: the component frame only contains docs that appear in
    at least one dup pair — a small fraction of a roughly-deduplicated
    corpus — so the label join is one shuffle on id (and broadcastable
    when the dup graph is small); the split itself stays a pure
    per-row expression on the cluster key, stable under reruns,
    repartitioning, and engine swaps. Output adds ``cluster`` and
    ``split``; bit-replayable in SQL (recursive-CTE components + the
    same portable-md5 threshold)."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b).withColumnRenamed(
        "id", id_col
    )
    with_cluster = (
        df.join(comp, id_col, "left")
        .withColumn(
            "cluster", F.coalesce(F.col("component"), F.col(id_col)).cast("bigint")
        )
        .drop("component")
    )
    return hash_split(with_cluster, id_col="cluster", weights=weights, seed=seed)

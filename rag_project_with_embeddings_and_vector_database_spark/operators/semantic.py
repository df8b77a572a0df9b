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

Keeper rule: deterministic greedy dominance — a document is DROPPED
iff some DOMINANT cluster-mate is within the similarity threshold.
One join, one aggregation; chain-transitive pruning can drop more
than one-per-connected-component keeping would (if A~B and B~C but
not A~C, only A survives), which is the standard greedy trade for a
single-pass scale shape — near-dup chains are themselves redundant.
Two dominance orders (``semantic_dedup(keep_policy=...)``):
``min_id`` (default) — smallest id wins; ``centroid`` — the paper's
rule: the member with LOWEST cosine similarity to its cluster
centroid wins (Abbas et al. §2.2 keep "low centroid similarity"
examples — they carry the most marginal information), id as the tie
break. Same join shape either way; the centroid order costs one
broadcast of the KB-scale centroid frame and a scan-local cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V
from .retrieval import build_ivf_index


def _assign(corpus, num_clusters, corpus_id, vec_col, seed, assignment=None):
    """Cluster assignment frame (corpus columns + bucket). MLlib KMeans
    requires k >= 2; num_clusters=1 is the degenerate one-bucket case
    (the exact all-pairs equivalence anchor) and needs no fit.
    ``assignment`` (added r9) bypasses the quantizer entirely with a
    caller-provided frame that already carries (corpus_id, vec_col,
    bucket) — the hook for (a) DETERMINISTIC bucketings whose whole
    verdict algebra is then SQL-expressible and DuckDB-oracle-provable
    (any bucket expression works: the method only needs near-identical
    vectors to land in one bucket as often as the chosen bucketing
    achieves), and (b) replays against a FROZEN stored assignment
    table, which is how the incremental form composes."""
    if assignment is not None:
        missing = {corpus_id, vec_col, "bucket"} - set(assignment.columns)
        if missing:
            raise ValueError(
                f"assignment frame lacks column(s) {sorted(missing)}; "
                f"need ({corpus_id}, {vec_col}, bucket)"
            )
        return assignment
    if num_clusters == 1:
        return corpus.withColumn("bucket", F.lit(0))
    assigned, _ = build_ivf_index(
        corpus, num_centroids=num_clusters, corpus_id=corpus_id,
        vec_col=vec_col, seed=seed,
    )
    return assigned


def _assign_with_centroids(corpus, num_clusters, corpus_id, vec_col, seed, assignment=None):
    """``_assign`` variant that also returns the (bucket, centroid)
    frame when the quantizer ran, else None (assignment-provided and
    num_clusters=1 paths have no fitted centroids)."""
    if assignment is not None or num_clusters == 1:
        return _assign(corpus, num_clusters, corpus_id, vec_col, seed, assignment), None
    return build_ivf_index(
        corpus, num_centroids=num_clusters, corpus_id=corpus_id,
        vec_col=vec_col, seed=seed,
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_clusters: int = 16,
    corpus_id: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    normalized: bool = False,
    assignment: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster near-dup candidate pairs: (id_a, id_b, cos_sim)
    with id_a < id_b, cos_sim rounded to 6 then threshold-filtered —
    the ``embedding_neardup_pairs`` contract restricted to pairs whose
    members share an embedding cluster. With ``num_clusters=1`` this
    degenerates to the exact all-pairs generator (the pytest
    equivalence pin); at scale the cluster key bounds the join: one
    exchange on ``bucket``, quadratic only within a cluster.
    ``assignment`` supplies a precomputed bucket frame (see
    ``_assign``) — with a deterministic bucket expression the full
    pair algebra is DuckDB-provable (the ``semantic_dedup_hash``
    harness oracle)."""
    assigned = _assign(corpus, num_clusters, corpus_id, vec_col, seed, assignment)
    return _pairs_from_assigned(assigned, threshold, corpus_id, vec_col, normalized)


def _pairs_from_assigned(
    assigned: DataFrame,
    threshold: float,
    corpus_id: str,
    vec_col: str,
    normalized: bool,
) -> DataFrame:
    # r14: L2 norms attach ONCE per join-side row — the full cosine
    # formula re-runs both norm aggregate loops for every one of the
    # O(cluster^2) joined pairs (bit-identical; see cosine_with_norms)
    side = assigned.select(
        "bucket", F.col(corpus_id).alias("_id"), F.col(vec_col).alias("_v"),
        V.norm(vec_col).alias("_n"),
    )
    a = side.select(
        "bucket", F.col("_id").alias("_ida"), F.col("_v").alias("v_a"),
        F.col("_n").alias("_na"),
    )
    b = side.select(
        "bucket", F.col("_id").alias("_idb"), F.col("_v").alias("v_b"),
        F.col("_n").alias("_nb"),
    )
    sim = (
        V.dot("v_a", "v_b")
        if normalized
        else V.cosine_with_norms("v_a", "v_b", "_na", "_nb")
    )
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
    assignment: DataFrame | None = None,
    keep_policy: str = "min_id",
) -> DataFrame:
    """Per-document SemDeDup verdict: (corpus_id, bucket, keep) for
    EVERY corpus row — ``keep = false`` iff a DOMINANT cluster-mate
    sits within ``threshold`` cosine similarity (greedy dominance, see
    module docstring). The survivors (``filter(keep)``) are the
    semantically-deduplicated corpus. ``assignment`` supplies a
    precomputed bucket frame (see ``_assign``).

    ``keep_policy``: ``'min_id'`` (default) — the smallest-id mate
    dominates; ``'centroid'`` — the paper's rule: the mate with LOWER
    cosine similarity to the cluster centroid dominates (low-centroid-
    similarity members carry the most marginal information; Abbas et
    al. §2.2), id breaking ties — requires the quantizer path (the
    fitted centroids), so it cannot combine with ``assignment`` or
    ``num_clusters=1``."""
    if keep_policy not in ("min_id", "centroid"):
        raise ValueError(f"keep_policy must be 'min_id' or 'centroid', got {keep_policy!r}")
    assigned, cents = _assign_with_centroids(
        corpus, num_clusters, corpus_id, vec_col, seed, assignment
    )
    if keep_policy == "min_id":
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
    if cents is None:
        raise ValueError(
            "keep_policy='centroid' needs the fitted centroids: use the "
            "quantizer path (num_clusters >= 2, no precomputed assignment)"
        )
    # rank key (centroid_sim, id): rounded like every output-edge float
    # so the order is engine-portable and tie-broken deterministically
    scored = (
        assigned.join(F.broadcast(cents), "bucket")
        .withColumn("_csim", F.round(V.cosine(vec_col, "centroid"), 6))
        .drop("centroid")
    )
    # r14: norms attach once per join-side row (see _pairs_from_assigned)
    a = scored.select(
        F.col("bucket").alias("_ba"),
        F.col(corpus_id).alias("_ida"),
        F.col(vec_col).alias("v_a"),
        V.norm(vec_col).alias("_na"),
        F.col("_csim").alias("_csa"),
    )
    b = scored.select(
        "bucket",
        F.col(corpus_id).alias("_idb"),
        F.col(vec_col).alias("v_b"),
        V.norm(vec_col).alias("_nb"),
        F.col("_csim").alias("_csb"),
    )
    sim = (
        V.dot("v_a", "v_b")
        if normalized
        else V.cosine_with_norms("v_a", "v_b", "_na", "_nb")
    )
    dominates = (F.col("_csa") < F.col("_csb")) | (
        (F.col("_csa") == F.col("_csb")) & (F.col("_ida") < F.col("_idb"))
    )
    dropped = (
        a.join(b, F.col("_ba") == F.col("bucket"))
        .filter(dominates & (F.round(sim, 6) >= threshold))
        .select(F.col("_idb").alias(corpus_id))
        .distinct()
    )
    return (
        scored.select(corpus_id, "bucket")
        .join(dropped.withColumn("_drop", F.lit(True)), corpus_id, "left")
        .select(
            corpus_id,
            "bucket",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def semantic_dedup_delta_pairs(
    store_assigned: DataFrame,
    centroids: DataFrame,
    delta: DataFrame,
    threshold: float = 0.95,
    corpus_id: str = "id",
    vec_col: str = "embedding",
    normalized: bool = False,
    delta_assignment: DataFrame | None = None,
) -> DataFrame:
    """DAY-2 SemDeDup: near-dup pairs TOUCHING a delta doc, probed
    against the FROZEN stored clustering — completing the incremental
    dedup family (minhash ``dedup_delta``, SimHash ``simhash_delta``,
    embedding ``embedding_delta``, and this). ``store_assigned`` is
    the stored assignment table ``build_ivf_index`` wrote (corpus_id,
    vec_col, bucket — partitioned by bucket at scale); ``centroids``
    is its tiny (bucket, centroid) sidecar. The delta is assigned to
    the frozen centroids (``ivf_index_append`` — one broadcast of the
    KB-scale centroid frame, never a re-fit), the store is pruned to
    the delta's clusters with a REAL single-column filter (bucket ids
    collected driver-side — bounded by the centroid count, never
    corpus- or delta-proportional; on a bucket-partitioned store this
    is partition pruning), and one fused join emits new-vs-stored plus
    new-vs-new pairs: (id_a, id_b, cos_sim) with id_a < id_b, cos_sim
    rounded to 6 then threshold-filtered. Output contract: exactly the
    ``semantic_dedup_pairs`` rows over corpus-union-delta under the
    union assignment (stored rows keep their frozen buckets, delta
    rows take frozen-centroid assignment) that touch >= 1 delta id —
    O(|delta| x matched-cluster) work, the corpus is never re-paired.
    Disjoint id spaces required (same contract as the family).

    Drift caveat is inherited from ``ivf_index_append``: heavy ingest
    against frozen centroids degrades the partition of space — append
    per batch, re-cluster per snapshot.

    ``delta_assignment`` supplies a precomputed (corpus_id, vec_col,
    bucket) frame for the delta and skips the centroid assignment
    entirely (``centroids`` may then be None) — the incremental twin
    of ``semantic_dedup_pairs``'s r9 ``assignment`` hook: with a
    deterministic bucket expression on BOTH sides the whole day-2
    algebra is DuckDB-provable (the ``semantic_dedup_incremental_hash``
    harness oracle)."""
    from .retrieval import ivf_index_append

    # one assignment pass shared by discovery + probe; a provided
    # delta_assignment is used AS-IS (r14 — callers sharing one
    # materialized assignment across delta ops were paying a second
    # checkpoint of the same rows here)
    delta_assigned = (
        delta_assignment
        if delta_assignment is not None
        else ivf_index_append(
            centroids, delta, corpus_id=corpus_id, vec_col=vec_col
        ).localCheckpoint()
    )
    return _delta_pairs_from_assigned(
        store_assigned, delta_assigned, threshold, corpus_id, vec_col, normalized
    )


def _delta_pairs_from_assigned(
    store_assigned: DataFrame,
    delta_assigned: DataFrame,
    threshold: float,
    corpus_id: str,
    vec_col: str,
    normalized: bool,
) -> DataFrame:
    touched = [r.bucket for r in delta_assigned.select("bucket").distinct().collect()]
    pruned = store_assigned.select(corpus_id, vec_col, "bucket").filter(
        F.col("bucket").isin(touched)
    )
    unioned = pruned.withColumn("_new", F.lit(False)).unionByName(
        delta_assigned.select(corpus_id, vec_col, "bucket").withColumn(
            "_new", F.lit(True)
        )
    )
    # r14: norms attach once per join-side row (see _pairs_from_assigned)
    new_side = F.broadcast(
        unioned.filter(F.col("_new")).select(
            F.col("bucket").alias("_ba"),
            F.col(corpus_id).alias("_ida"),
            F.col(vec_col).alias("v_a"),
            V.norm(vec_col).alias("_na"),
        )
    )
    both = unioned.select(
        "bucket",
        F.col(corpus_id).alias("_idb"),
        F.col(vec_col).alias("v_b"),
        V.norm(vec_col).alias("_nb"),
        "_new",
    )
    sim = (
        V.dot("v_a", "v_b")
        if normalized
        else V.cosine_with_norms("v_a", "v_b", "_na", "_nb")
    )
    # one fused join, condition split on the _new flag (the
    # _probe_minhash shape): vs stored rows any id inequality,
    # normalized by least/greatest; vs delta rows _ida < _idb emits
    # each new-new pair once
    return (
        new_side.join(
            both,
            (F.col("_ba") == F.col("bucket"))
            & (
                (~F.col("_new") & (F.col("_ida") != F.col("_idb")))
                | (F.col("_new") & (F.col("_ida") < F.col("_idb")))
            ),
        )
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def semantic_dedup_delta(
    store_assigned: DataFrame,
    centroids: DataFrame,
    delta: DataFrame,
    threshold: float = 0.95,
    corpus_id: str = "id",
    vec_col: str = "embedding",
    normalized: bool = False,
    delta_assignment: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Per-DELTA-doc incremental SemDeDup verdict: (corpus_id, bucket,
    keep) for every delta row — ``keep = false`` iff a smaller-id
    cluster-mate (stored OR delta) sits within ``threshold`` under the
    frozen clustering; min-id dominance restricted to delta docs, so
    verdicts equal ``semantic_dedup`` over corpus-union-delta (union
    assignment) filtered to delta ids. Built on
    ``semantic_dedup_delta_pairs``: a delta doc is dropped iff it
    appears as some pair's ``id_b`` (pairs are min-first, so being
    ``id_b`` means a smaller-id mate exists).

    ID-ORDER CONTRACT (ADVICE r9): delta ids must be STRICTLY GREATER
    than every stored id — the append-log convention every in-repo
    caller follows (+10_000_000 offsets). Only then do stored docs'
    verdicts never change on day 2 (a higher-id delta can only add
    dominance over ITSELF), making delta-only output the whole
    contract. A delta id smaller than a stored near-duplicate's would
    flip that stored doc under full min-id recompute, and this
    delta-only view would not surface it — if ids are not monotone in
    arrival order, re-run the snapshot ``semantic_dedup`` instead.

    ``delta_assignment`` passes a precomputed delta bucket frame
    through to the pair generator (``centroids`` may then be None);
    see ``semantic_dedup_delta_pairs``. ``pairs`` (r14) additionally
    accepts the ALREADY-COMPUTED ``semantic_dedup_delta_pairs`` frame
    for the same (store, delta, threshold) so a caller needing both
    the pair set and the verdicts (the harness self-validating entry,
    or a pipeline logging pairs while acting on verdicts) runs the
    probe join once — the verdict is then one broadcast join over the
    assignment spine. Both hooks are cost knobs, not semantics knobs:
    outputs are identical either way (pytest-pinned)."""
    from .retrieval import ivf_index_append

    # ONE assignment pass: discovery + probe + verdict spine; a
    # provided delta_assignment is used as-is (see
    # semantic_dedup_delta_pairs)
    delta_assigned = (
        delta_assignment
        if delta_assignment is not None
        else ivf_index_append(
            centroids, delta, corpus_id=corpus_id, vec_col=vec_col
        ).localCheckpoint()
    )
    if pairs is None:
        pairs = _delta_pairs_from_assigned(
            store_assigned, delta_assigned, threshold, corpus_id, vec_col, normalized
        )
    dropped = pairs.select(F.col("id_b").alias(corpus_id)).distinct()
    return (
        delta_assigned.select(corpus_id, "bucket")
        .join(
            F.broadcast(dropped.withColumn("_drop", F.lit(True))), corpus_id, "left"
        )
        .select(
            corpus_id,
            "bucket",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )

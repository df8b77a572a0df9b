"""Deterministic sampling / splitting for training-data pipelines
(north-star extension, BASELINE.json scale goals).

Why hash-based rather than ``df.sample`` / ``rand()``: at 100 TB a split
must be (a) reproducible across reruns and engines, (b) stable under
repartitioning and retries, and (c) derivable per-row with no shared
state. Spark's ``rand()`` is seeded per-partition, so the assignment
changes whenever partitioning changes — a silent train/test leak. A
salted content/id hash gives every row a permanent position in [0, 1)
that any engine can recompute (the same portable md5 -> 60-bit family
the dedup operators use, so DuckDB oracles verify assignments exactly).

All operators are narrow (per-row expressions, zero shuffle) except the
stratified sample's per-stratum top-n window (one exchange on the
stratum key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long

# Granularity of the unit-interval discretization: 1e6 buckets keeps
# threshold arithmetic exact in int space (no float boundary drift).
_BUCKETS = 1_000_000


def hash_bucket(id_col: Column | str, seed: int = 42) -> Column:
    """Permanent pseudo-random bucket in [0, _BUCKETS) for a row id:
    salted portable md5, identical in any engine."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(c.cast("string"), F.lit(str(seed))) % _BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Assign every row to a named split by cumulative weight thresholds
    over its hash bucket. Weights must sum to 1 (validated). The
    assignment is a pure per-row expression: stable under reruns,
    repartitioning, task retries, and engine swaps."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, seed)
    expr: Column | None = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        threshold = int(round(cum * _BUCKETS))
        cond = bucket < F.lit(threshold)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last_name = items[-1][0]
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame, id_col: str = "doc_id", fraction: float = 0.1, seed: int = 42
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the
    bucket space — a reproducible Bernoulli-style sample whose
    membership never changes across runs (unlike ``df.sample``, whose
    per-partition seeding ties membership to the physical split)."""
    threshold = int(round(fraction * _BUCKETS))
    return df.filter(hash_bucket(id_col, seed) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by smallest hash bucket with an id tie-break —
    deterministic, and one exchange on the stratum key. For heavily
    skewed strata the window input is already reduced to (bucket, id)
    ordering, so the exchange carries the full stratum but ranks
    cheaply; pre-filtering with deterministic_sample bounds it when
    strata are huge."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )

"""Mergeable quantile sketches (DataSketches KLL via Spark 4's native
``kll_*`` SQL functions) — the constant-memory percentile path for
100 TB metric columns, completing the sketch family next to the HLL
distinct-count rollup (``operators/sketches.py``).

Why sketches and not ``percentile_approx``: ``percentile_approx``
answers ONE query over ONE grouping and its state is not storable — a
daily pipeline that later needs weekly/monthly/any-dimension
percentiles must rescan the facts. A KLL sketch is a ~KB binary column
PER GROUP that (a) persists in the group table, (b) MERGES
associatively to any coarser granularity (``kll_merge_agg``), and
(c) answers any quantile after the fact — one fact scan, every
rollup thereafter O(groups), never O(rows).

Accuracy contract (Karnin-Lang-Liberty 2016): a k=200 sketch bounds
normalized RANK error at ~1.65 % (99 % two-sided). ``kll_rank_check``
turns that bound into an auditable frame (exact rank of every
estimated quantile vs its target), the same verify-or-raise stance as
``sketches.exact_distinct_counts``. Estimates are rank-bounded, not
bit-deterministic (KLL compaction samples), so harness registration is
rows-checked with the audit RAISING on bound violations — the hll_rollup
pattern.

The reference has no sketching at all (3 curated PDFs); north-star
extension surface. New module (r11) so the registration closure stays
empty until the r12 window opens.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DataSketches KLL default-ish size: ~1.65% normalized rank error.
DEFAULT_K = 200
# Two-sided 99% normalized rank-error bound for k=200 (DataSketches
# published table), with slack for the merge path compounding.
RANK_EPS_K200 = 0.0165


def _ident(name: str) -> str:
    assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name), f"bad column {name!r}"
    return f"`{name}`"


def kll_group_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = DEFAULT_K,
) -> DataFrame:
    """One KLL(double) sketch per group over ``value_col``: a two-phase
    (map-side-combinable) hash aggregation whose output is O(groups)
    KB-scale binaries — the frame a daily job APPENDS to its metrics
    table. NULL values are ignored (cast-filtered) so a NULL can never
    poison a group's sketch."""
    v = _ident(value_col)
    d = df.filter(F.col(value_col).isNotNull())
    return d.groupBy(*group_cols).agg(
        F.expr(f"kll_sketch_agg_double(CAST({v} AS DOUBLE), {int(k)})").alias(
            "kll"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def kll_rollup(sketches: DataFrame, keep_cols: list[str]) -> DataFrame:
    """Merge group sketches to ANY coarser granularity without touching
    the fact table: one O(groups) aggregation of KB blobs
    (``kll_merge_agg`` is associative and commutative — the same
    register-algebra argument as the HLL rollup)."""
    return sketches.groupBy(*keep_cols).agg(
        F.expr("kll_merge_agg_double(kll)").alias("kll"),
        F.sum("n_rows").alias("n_rows"),
    )


def kll_quantile_table(
    sketches: DataFrame, probs: list[float], group_cols: list[str]
) -> DataFrame:
    """Long-form quantile estimates: one row per (group, p) —
    ``(group_cols..., p, est)``. A pure per-row projection over the
    sketch frame, no data scan. The probe list compiles to one literal
    ``kll_sketch_get_quantile`` column per p (the function requires a
    FOLDABLE rank) and a ``stack`` unpivot."""
    qcols = [
        F.expr(
            f"kll_sketch_get_quantile_double(kll, CAST({float(p)!r} AS DOUBLE))"
        ).alias(f"_q{i}")
        for i, p in enumerate(probs)
    ]
    wide = sketches.select(*group_cols, *qcols)
    stack = ", ".join(
        f"CAST({float(p)!r} AS DOUBLE), _q{i}" for i, p in enumerate(probs)
    )
    return wide.selectExpr(
        *group_cols, f"stack({len(probs)}, {stack}) AS (p, est)"
    )


def kll_rank_check(
    df: DataFrame,
    value_col: str,
    quantile_table: DataFrame,
    group_cols: list[str],
    eps: float = 3 * RANK_EPS_K200,
) -> DataFrame:
    """The ACCURACY AUDIT: for every estimated quantile, compute the
    EXACT normalized rank of the estimate inside its group (one
    broadcast of the KB-scale quantile table against one fact scan)
    and flag ``|exact_rank - p| > eps``. Returns
    ``(group_cols..., p, est, exact_rank, within_bound)`` — a caller
    can ``F.raise_error`` on any ``within_bound = false`` row, the
    verify-or-raise stance the sketch family ships with. One
    aggregation over the facts regardless of how many probes."""
    v = F.col(value_col).cast("double")
    j = df.filter(F.col(value_col).isNotNull()).join(
        F.broadcast(quantile_table), group_cols
    )
    agg = j.groupBy(*group_cols, "p", "est").agg(
        (
            F.sum(F.when(v <= F.col("est"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("exact_rank")
    )
    return agg.withColumn(
        "within_bound",
        (F.col("exact_rank") - F.col("p")).between(-eps, eps),
    )

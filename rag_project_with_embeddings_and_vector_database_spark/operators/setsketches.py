"""Mergeable distinct-SET algebra (DataSketches Theta via Spark 4's
native ``theta_*`` SQL functions): union / intersection / difference
of distinct-value sets as operations on KB-scale binary sketches —
the questions HLL cannot answer (HLL unions but never intersects).

The 100 TB shapes this buys with NO join and NO rescans:
  * corpus-snapshot overlap — how many distinct documents/URLs/tokens
    do yesterday's and today's crawls share? (intersection)
  * retention / churn — distinct ids in A but not B (difference)
  * any-dimension rollup of distinct sets (union_agg, associative)
Each group's state is one sketch blob persisted next to the group key;
day-2 cost is O(groups), the facts are scanned once, ever.

Exactness contract: a Theta sketch with lg_k nominal entries is EXACT
(no sampling, estimate == true distinct count) while the set stays
under ~2^lg_k values, and value->hash is deterministic — so in the
sparse regime union/intersection/difference estimates equal the
answers a join would give, and ``exact mode`` checks can RAISE on any
drift (the ``hll_rollup`` verify-or-raise pattern). Above 2^lg_k the
estimates carry the published ~1/sqrt(2^lg_k) relative error.

The reference has no sketching; north-star extension surface. New
module (r11) so the registration closure stays empty until the r12
window opens.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 4096 nominal entries; <1% error beyond exact mode


def _ident(name: str) -> str:
    assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name), f"bad column {name!r}"
    return f"`{name}`"


def theta_group_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One Theta sketch per group over ``value_col``'s distinct values:
    a two-phase hash aggregation, output O(groups) blobs. NULLs are
    ignored (a NULL is not a member of any set)."""
    v = _ident(value_col)
    d = df.filter(F.col(value_col).isNotNull())
    return d.groupBy(*group_cols).agg(
        F.expr(f"theta_sketch_agg({v}, {int(lg_k)})").alias("theta")
    )


def theta_rollup(
    sketches: DataFrame, keep_cols: list[str], lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Distinct-set UNION to any coarser granularity: one O(groups)
    aggregation of blobs (``theta_union_agg`` is associative).
    ``lg_k`` must be >= the input sketches' — Spark's union gear has
    its OWN nominal-entry budget defaulting to 12 and silently
    DOWNSAMPLES larger inputs through it (caught at sf0.1 in r12:
    lg_k=14 sketches unioned at the default lost exactness at 5000
    distincts), so every union call in this module threads it."""
    return sketches.groupBy(*keep_cols).agg(
        F.expr(f"theta_union_agg(theta, {int(lg_k)})").alias("theta")
    )


def theta_estimates(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., distinct_est) — a pure projection."""
    return sketches.select(
        *group_cols,
        F.expr("theta_sketch_estimate(theta)").cast("bigint").alias(
            "distinct_est"
        ),
    )


def theta_set_algebra(
    sketches: DataFrame, group_col: str, left, right,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Full set algebra between TWO named groups' sketches: one row
    ``(n_left, n_right, n_union, n_intersection, n_left_only,
    n_right_only, jaccard_est)``. The two blobs broadcast-join into a
    single projection — no fact scan, no pair join; at 100 TB this is
    how snapshot-overlap and churn reports run daily.

    Missing-group guard (r11 ADVICE): each side reduces through a
    grouped-less ``theta_union_agg`` (always exactly one row, merging
    any duplicate group rows), so a group name with NO sketch row
    RAISES instead of silently returning an empty frame — a daily
    churn report against a missing snapshot must fail loudly, not
    yield no output."""
    a = sketches.filter(F.col(group_col) == left).agg(
        F.expr(f"theta_union_agg(theta, {int(lg_k)})").alias("ta"),
        F.count(F.lit(1)).alias("_ca"),
    )
    b = sketches.filter(F.col(group_col) == right).agg(
        F.expr(f"theta_union_agg(theta, {int(lg_k)})").alias("tb"),
        F.count(F.lit(1)).alias("_cb"),
    )
    one = a.crossJoin(F.broadcast(b))
    est = lambda e: F.expr(f"theta_sketch_estimate({e})").cast("bigint")  # noqa: E731
    # the guard wraps an ALWAYS-SELECTED output column — a standalone
    # guard column would be pruned away unevaluated
    n_left_guarded = (
        F.when(
            (F.col("_ca") == 0) | (F.col("_cb") == 0),
            F.raise_error(
                F.format_string(
                    f"theta_set_algebra: group {left!r} has %d sketch "
                    f"row(s) and group {right!r} has %d - both sides "
                    "must exist",
                    F.col("_ca"),
                    F.col("_cb"),
                )
            ).cast("bigint"),
        )
        .otherwise(est("ta"))
    )
    return one.select(
        n_left_guarded.alias("n_left"),
        est("tb").alias("n_right"),
        est(f"theta_union(ta, tb, {int(lg_k)})").alias("n_union"),
        est("theta_intersection(ta, tb)").alias("n_intersection"),
        est("theta_difference(ta, tb)").alias("n_left_only"),
        est("theta_difference(tb, ta)").alias("n_right_only"),
        F.round(
            est("theta_intersection(ta, tb)")
            / F.greatest(est(f"theta_union(ta, tb, {int(lg_k)})"), F.lit(1)),
            6,
        ).alias("jaccard_est"),
    )


def exact_set_algebra(
    df: DataFrame, value_col: str, group_col: str, left, right
) -> DataFrame:
    """The EXACT twin of ``theta_set_algebra`` (one aggregation over
    the two groups' distinct values — the verify side of the sparse-
    regime exactness contract; same column names, so a caller can
    exceptAll the two frames and RAISE on drift)."""
    v = F.col(value_col)
    d = (
        df.filter(F.col(group_col).isin([left, right]) & v.isNotNull())
        .select(
            v.alias("_v"),
            (F.col(group_col) == left).alias("_l"),
            (F.col(group_col) == right).alias("_r"),
        )
        .groupBy("_v")
        .agg(F.max("_l").alias("in_l"), F.max("_r").alias("in_r"))
    )
    return d.agg(
        F.sum(F.when(F.col("in_l"), 1).otherwise(0)).alias("n_left"),
        F.sum(F.when(F.col("in_r"), 1).otherwise(0)).alias("n_right"),
        F.count(F.lit(1)).alias("n_union"),
        F.sum(F.when(F.col("in_l") & F.col("in_r"), 1).otherwise(0)).alias(
            "n_intersection"
        ),
        F.sum(F.when(F.col("in_l") & ~F.col("in_r"), 1).otherwise(0)).alias(
            "n_left_only"
        ),
        F.sum(F.when(F.col("in_r") & ~F.col("in_l"), 1).otherwise(0)).alias(
            "n_right_only"
        ),
    ).select(
        "n_left", "n_right", "n_union", "n_intersection",
        "n_left_only", "n_right_only",
        F.round(
            F.col("n_intersection") / F.greatest(F.col("n_union"), F.lit(1)), 6
        ).alias("jaccard_est"),
    )

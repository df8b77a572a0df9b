"""Join operators beyond Spark's built-ins: as-of and range joins.

The reference has no joins at all (SURVEY.md §2.8) — its nearest
analogues are the relevance theta-join predicate and the queries x
collections cross join. These operators round out the engine's join
surface for time-series / training-data workloads.

Scale design: the as-of join avoids the naive "join all earlier rows
then argmax" explosion by unioning both sides into one stream, sorting
within (key) partitions once, and using ``last(..., ignorenulls)`` over
an ordered window — one shuffle on the key, no pair blow-up, skew
handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` and the same ``on`` key (backward as-of).

    Implementation: union-of-streams + ordered window carry-forward.
    Right rows sort before left rows at equal timestamps so an exact
    timestamp tie matches (standard as-of semantics). When several right
    rows share a timestamp, ``right_tiebreak`` (ascending; the max value
    wins) makes the match deterministic."""
    right_value_cols = right_value_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_struct_t = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    r_struct_t = (
        right.select(F.struct(*([right_ts] + right_value_cols)).alias("s")).schema["s"].dataType
    )

    tb_src = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
        F.lit(None).cast(right.select(tb_src.alias("t")).schema["t"].dataType).alias("_tb"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        F.struct(*([right_ts] + right_value_cols)).alias("_r"),
        tb_src.alias("_tb"),
    )

    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_last("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_seconds is not None:
        carried = carried.withColumn(
            "_match",
            F.when(
                F.col(f"_match.{right_ts}")
                >= F.col("_ts") - F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS"),
                F.col("_match"),
            ),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{c}").alias(f"asof_{c}") for c in [right_ts] + right_value_cols]
    return carried.select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the (large, skewed) left side into
    ``salt`` sub-keys and replicate the right side across all salts, so
    one hot key spreads over ``salt`` reducers instead of one straggler.

    AQE's skew-join split handles moderate skew automatically; explicit
    salting is the deterministic fallback for pathological keys (one key
    = 30% of rows) or for engines/stages where AQE can't split (e.g.
    aggregations keyed on the hot column). For inner/left joins results
    are identical to a plain join — only the exchange layout changes.
    right/full outer joins are rejected: the right side is replicated
    across all salts, so every unmatched right row would be emitted
    ``salt`` times as duplicate null-extended rows."""
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): the "
            f"salt-replicated right side duplicates unmatched right rows under "
            f"right/full outer semantics."
        )
    l_salted = left.withColumn("_salt", (F.xxhash64(F.monotonically_increasing_id()) % salt).cast("int"))
    l_salted = l_salted.withColumn("_salt", F.abs(F.col("_salt")))
    r_salted = right.join(
        F.broadcast(right.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))),
        how="cross",
    )
    out = l_salted.join(r_salted, [on, "_salt"], how=how)
    return out.drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Column | None,
    left_point: str,
    right_lo: str,
    right_hi: str,
) -> DataFrame:
    """Point-in-interval join: left.point in [right.lo, right.hi).

    Declarative form — Catalyst/AQE pick the strategy; for heavily
    overlapping intervals at scale, pre-bucketing points and intervals to
    a common grid key turns this into an equi-join (not needed at test
    scale, documented here as the 100x plan)."""
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    if on is not None:
        key = (left[on] == right[on]) if isinstance(on, str) else on
        cond = key & cond
    return left.join(right, cond)

"""Count-Min frequency sketches as RELATIONAL state (Cormode &
Muthukrishnan 2005) — the sketch family's frequency-estimation member,
built WITHOUT DataSketches binaries: Spark 4 ships no ``cms_*`` SQL
estimate/merge functions (the r11 survey's reason to skip CMS), but a
CMS is just a depth x width counter MATRIX, and a counter matrix is
rows — ``(group..., depth, bucket, cnt)``. That representation buys
properties the binary sketches cannot offer:

  * EXACT mergeability — union of sketch tables + sum by (depth,
    bucket) is bit-identical to building over the union (counter
    addition is the CMS merge; no sampling, no compaction
    randomness), pinned by tests;
  * engine portability — the bucket hash is the repo's salted
    portable-md5 family, so a DuckDB oracle replays the ENTIRE sketch
    bit-for-bit (a hash-oracle-able sketch, unlike KLL/Theta);
  * plain-parquet storage — no binary reader needed; day-2 appends are
    keyed row merges.

Estimation contract: ``est(x) = min over depth rows of cnt`` is ALWAYS
>= the true count (counters only over-count on collisions — the hard
one-sided guarantee), and exceeds it by more than ``eps * N`` (where
``eps = e / width``, N = total occurrences) with probability at most
``e^-depth`` per the paper. ``cms_error_audit`` turns both statements
into a RAISE-able frame — the sketch family's verify-or-raise stance
(``hll_rollup`` / ``kll_rank_check`` pattern).

Shuffle shape at 100 TB: build is one explode to ``depth`` rows per
occurrence (scan-local) + a two-phase hash aggregation; output is at
most ``groups x depth x width`` integer rows (KB-scale per group).
Rollups and merges are keyed sums over those rows — O(sketch), never a
fact rescan. Point queries broadcast the probe items' KB of (depth,
bucket) keys against the sketch rows. Heavy-hitter candidate sets
inherit the one-sided bound: no false negatives at threshold
``phi * N``, only (bounded) false positives.

The reference has no sketching; north-star extension surface. New
module (r12) so the registration closure stays empty until the r13
window opens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 2048


def _bucket(value_col: str, d: int, width: int, seed: int):
    """Row d's bucket for a value: the salted portable-md5 family with
    a per-depth salt, so every engine recomputes the same counter
    cell. ``seed*1000 + d`` keeps depth salts disjoint across seeds."""
    return (
        md5_long(F.col(value_col).cast("string"), F.lit(str(seed * 1000 + d)))
        % width
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 7,
) -> DataFrame:
    """One CMS per group over ``value_col`` occurrences (NULLs ignored;
    a NULL is not an occurrence): ``(group_cols..., depth, bucket,
    cnt)``. One scan, one explode to ``depth`` rows per occurrence,
    one two-phase count aggregation — output bounded by
    ``groups x depth x width`` rows regardless of input size."""
    group_cols = group_cols or []
    d = df.filter(F.col(value_col).isNotNull())
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                _bucket(value_col, i, width, seed).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        d.select(*group_cols, F.explode(probes).alias("_p"))
        .select(*group_cols, "_p.depth", "_p.bucket")
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_rollup(sketch: DataFrame, keep_cols: list[str] | None = None) -> DataFrame:
    """Merge sketches to ANY coarser granularity: counter addition by
    (keep..., depth, bucket) — the CMS merge is EXACTLY row-sum, so
    rollup(build(A) ∪ build(B)) == build(A ∪ B) bit-for-bit (pinned).
    O(sketch-rows), the facts are never re-read."""
    keep_cols = keep_cols or []
    return sketch.groupBy(*keep_cols, "depth", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_point_query(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 7,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """Estimated occurrence count for every item row:
    ``(group_cols..., value_col, est)`` with ``est = min over depth``
    of the matching counters — ALWAYS >= the true count. Items hash to
    their (depth, bucket) probes scan-locally. An item whose probe
    hits an absent counter row has true count 0 and est 0 (coalesced —
    absence means no occurrence ever incremented that cell).

    ``broadcast_sketch=True`` fits the common case — ONE sketch (or a
    handful of groups), depth x width counter rows, KBs. Pass False
    when the sketch table spans MANY groups (per-domain/per-day
    sketches: groups x depth x width rows can exceed broadcast budget)
    — the join then shuffles on (group, depth, bucket), which both
    sides are already keyed by."""
    group_cols = group_cols or []
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                _bucket(value_col, i, width, seed).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    p = (
        items.filter(F.col(value_col).isNotNull())
        .select(*group_cols, value_col, F.explode(probes).alias("_p"))
        .select(*group_cols, value_col, "_p.depth", "_p.bucket")
    )
    side = F.broadcast(sketch) if broadcast_sketch else sketch
    j = p.join(side, [*group_cols, "depth", "bucket"], "left")
    return j.groupBy(*group_cols, value_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )


def cms_heavy_hitters(
    df: DataFrame,
    sketch: DataFrame,
    value_col: str,
    phi: float,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 7,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """Candidate heavy hitters: distinct values whose CMS estimate is
    >= ``phi * N`` (N = the sketch's total occurrences, derived from
    one depth row — every depth sums to N). Because estimates never
    under-count, the candidate set has NO false negatives; false
    positives are bounded by the overestimate bound. The distinct-value
    probe scans the corpus once; at 100 TB the probe set is whatever
    candidate stream the pipeline already tracks (the sketch itself
    cannot enumerate values — standard CMS)."""
    group_cols = group_cols or []
    n = sketch.filter(F.col("depth") == 0).groupBy(*group_cols).agg(
        F.sum("cnt").alias("_n")
    )
    distinct_vals = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, value_col
    ).distinct()
    est = cms_point_query(
        sketch, distinct_vals, value_col, group_cols=group_cols,
        depth=depth, width=width, seed=seed,
        broadcast_sketch=broadcast_sketch,
    )
    joined = est.join(F.broadcast(n), group_cols) if group_cols else est.crossJoin(
        F.broadcast(n)
    )
    return joined.filter(
        F.col("est") >= F.col("_n") * F.lit(float(phi))
    ).select(*group_cols, value_col, "est")


def write_cms_store(
    sketch: DataFrame, path: str, batch_id: str
) -> None:
    """Append one day's sketch to a stored CMS as its OWN batch
    partition (``{path}/batch=<id>``, overwrite). Counter rows are
    ADDITIVE, so a blindly-appended retry after a crash would DOUBLE
    whatever the torn write landed — unlike the signature stores,
    where replayed duplicates are only a size cost. The batch key
    makes the append IDEMPOTENT instead: a retry overwrites exactly
    its own directory, other batches' bytes are never touched, and a
    crash costs at most one incomplete batch dir that the retry
    replaces (pinned in tests/test_freqsketch.py)."""
    sketch.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")


def read_cms_store(spark, path: str, group_cols: list[str] | None = None) -> DataFrame:
    """The stored CMS at full resolution: partition discovery lists
    the batch dirs, and one keyed sum collapses them — O(batches x
    sketch-rows) KB-scale rows, the facts behind any batch are never
    re-read. Day-N rollups/probes run on this frame exactly as on a
    freshly built sketch (merge == build over the union, bit-for-bit,
    because the CMS merge is counter addition)."""
    group_cols = group_cols or []
    return cms_rollup(
        spark.read.parquet(path).drop("batch"), group_cols
    )


def cms_error_audit(
    df: DataFrame,
    sketch: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 7,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """The estimation contract as an auditable frame: for every
    distinct value, its exact count, CMS estimate, and two flags —
    ``never_undercounts`` (MUST always hold; a False row is a bug, not
    noise — callers RAISE) and ``within_eps`` (est - true <= ceil(e /
    width * N); per-value failures occur with probability <= e^-depth,
    so a fixture sized far from the bound asserts all-True). One exact
    aggregation + one probe join."""
    group_cols = group_cols or []
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    est = cms_point_query(
        sketch, exact.select(*group_cols, value_col), value_col,
        group_cols=group_cols, depth=depth, width=width, seed=seed,
        broadcast_sketch=broadcast_sketch,
    )
    n = sketch.filter(F.col("depth") == 0).groupBy(*group_cols).agg(
        F.sum("cnt").alias("_n")
    )
    j = exact.join(est, [*group_cols, value_col])
    j = j.join(F.broadcast(n), group_cols) if group_cols else j.crossJoin(
        F.broadcast(n)
    )
    import math

    eps = math.e / width
    return j.select(
        *group_cols,
        value_col,
        "true_cnt",
        "est",
        (F.col("est") >= F.col("true_cnt")).alias("never_undercounts"),
        (
            F.col("est") - F.col("true_cnt")
            <= F.ceil(F.col("_n") * F.lit(eps))
        ).alias("within_eps"),
    )

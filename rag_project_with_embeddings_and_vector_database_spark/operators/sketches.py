"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark 3.5+ ``hll_sketch_agg`` / ``hll_union_agg`` expressions).

The 100 TB pattern this packages: a fact table is rolled up ONCE per
partition (day, domain, shard) into per-group HLL sketches stored as a
binary column; any coarser distinct count — weekly, global, cross-
domain — is then a UNION of the stored sketches, never a rescan of the
raw data. Register-wise max is associative and commutative, so
estimate(union(sketches over disjoint row sets)) equals
estimate(one-pass sketch over the union) EXACTLY (bit-identical
registers, not merely close) — pytest-pinned, and the rollup queries
self-check it.

Contrast with the exact paths already in the engine:
  * ``approx_distinct`` (HyperLogLog++ via approx_count_distinct) gives
    one number per query — nothing is stored, nothing merges.
  * exact count-distinct (``distinct_counts``) is the expand shuffle —
    right answer, but at 100 TB the re-aggregation cost repeats for
    every granularity.
Sketches make granularity changes free: O(groups) binary blobs move,
the fact table stays cold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2 of the HLL register count. 12 (4096 registers) keeps the sketch
# under ~3 KB while the DataSketches sparse mode stays EXACT for small
# per-group cardinalities — the regime the equality self-checks pin.
DEFAULT_LGK = 12


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL sketches: one partial/final hash-agg exchange on
    ``group_cols`` (map-side combine carries partial sketches, never
    raw values), emitting (group_cols..., sketch: binary, n_distinct:
    bigint). Write the result out partitioned however the read path
    prunes; the raw table is never needed again for distinct counts."""
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    return df.groupBy(*group_cols).agg(sk).select(
        *group_cols,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("n_distinct"),
    )


def hll_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union stored sketches up to a coarser granularity (or globally
    with ``group_cols=None``): a groupBy over O(groups) binary rows —
    the fact table is not touched. Emits the merged sketch (still
    mergeable further) alongside its estimate."""
    agg = [
        F.hll_union_agg(F.col(sketch_col)).alias("sketch"),
    ]
    if group_cols:
        out = sketches.groupBy(*group_cols).agg(*agg)
        return out.select(
            *group_cols, "sketch", F.hll_sketch_estimate("sketch").alias("n_distinct")
        )
    out = sketches.agg(*agg)
    return out.select(
        "sketch", F.hll_sketch_estimate("sketch").alias("n_distinct")
    )


def hll_rollup_checked(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """The self-validating harness form: per-group sketches PLUS the
    merge-equals-direct proof — the global estimate from unioning the
    per-group sketches must equal the one-pass global sketch's
    estimate (associativity of register max), and in the exact sparse
    regime both equal the true distinct count. RAISES on any breach;
    returns (group_cols..., n_distinct, global_merged, global_direct,
    global_exact) so the driver rows pin all three numbers."""
    per_group = hll_rollup(df, group_cols, value_col, lgk)
    merged = hll_merge(per_group).collect()[0].n_distinct
    direct = (
        df.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
            ).alias("e")
        ).collect()[0].e
    )
    # hll_sketch_agg ignores NULLs, so the exact twin must too — an
    # unfiltered distinct() would count NULL as one extra "value" and
    # false-trip the sparse-regime check on any nullable column
    # (ADVICE r9).
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .select(value_col)
        .distinct()
        .count()
    )
    if merged != direct:
        raise AssertionError(
            f"sketch merge broke associativity: merged={merged} direct={direct}"
        )
    if merged != exact:
        raise AssertionError(
            f"sketch left the exact sparse regime on a fixture sized to stay "
            f"inside it: est={merged} exact={exact}"
        )
    return per_group.select(
        *group_cols,
        "n_distinct",
        F.lit(merged).alias("global_merged"),
        F.lit(direct).alias("global_direct"),
        F.lit(exact).cast("bigint").alias("global_exact"),
    )

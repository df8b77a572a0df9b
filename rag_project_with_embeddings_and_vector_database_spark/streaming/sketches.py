"""Streaming sketch rollups: watermarked windowed Theta + KLL sketch
aggregation over an unbounded stream — mergeable O(windows x groups)
state instead of O(distinct values) or O(rows).

Why this shape at 100 TB/day: an exact streaming ``approx_count_
distinct``/percentile over high-cardinality values keeps per-key state
proportional to the data; a sketch aggregation keeps ONE KB-scale blob
per (event-time window, group), emits it once the watermark closes the
window, and the emitted blobs form an append-only SKETCH TABLE that
the batch rollup operators (``operators/setsketches.theta_rollup``,
``operators/quantiles.kll_rollup``) merge to any coarser granularity —
hourly -> daily -> monthly distinct counts, overlaps and percentiles
without ever rescanning the stream's history.

Semantics pins (tests/test_streaming_sketches.py): a full availableNow
drain's merged sketches answer EXACTLY like batch sketches over the
same rows (same deterministic value hashing / mergeable state), and in
the Theta sparse regime exactly like the true distinct counts. Append
mode emits a window only after the watermark passes its end — the
standard spacer-batch consideration every windowed streaming query in
this repo pins.

The reference has no streaming; north-star extension surface. New
module (r11) so the registration closure stays empty until the r12
window opens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.quantiles import DEFAULT_K
from ..operators.setsketches import DEFAULT_LG_K


def windowed_sketches(
    stream: DataFrame,
    ts_col: str,
    distinct_col: str,
    metric_col: str,
    group_cols: list[str],
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    lg_k: int = DEFAULT_LG_K,
    kll_k: int = DEFAULT_K,
) -> DataFrame:
    """One Theta sketch (distinct ``distinct_col`` values) and one KLL
    sketch (``metric_col`` quantiles) per (event-time window, group):
    a standard watermarked streaming aggregation whose per-window
    state is two KB blobs + a row count. Works in append mode (final
    blobs emitted when the watermark closes the window) so the sink is
    an append-only sketch table; callers chain ``.writeStream``."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *group_cols)
        .agg(
            F.expr(f"theta_sketch_agg(`{distinct_col}`, {int(lg_k)})").alias(
                "theta"
            ),
            F.expr(
                f"kll_sketch_agg_double(CAST(`{metric_col}` AS DOUBLE), {int(kll_k)})"
            ).alias("kll"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def merge_sketch_table(
    sketch_table: DataFrame, keep_cols: list[str], lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Roll the emitted (window, group) sketch rows up to any coarser
    granularity — one O(rows-of-blobs) aggregation, the stream history
    is never re-read. ``lg_k`` must match (or exceed) the stream
    aggregation's: Spark's union gear carries its OWN nominal-entry
    budget defaulting to 12 and silently downsamples larger sketches
    through it (see operators/setsketches.theta_rollup)."""
    return sketch_table.groupBy(*keep_cols).agg(
        F.expr(f"theta_union_agg(theta, {int(lg_k)})").alias("theta"),
        F.expr("kll_merge_agg_double(kll)").alias("kll"),
        F.sum("n_rows").alias("n_rows"),
    )


def windowed_cms(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    depth: int | None = None,
    width: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Streaming Count-Min: because the relational CMS
    (operators/freqsketch.py) is counter ROWS and its build is an
    ordinary count aggregation, it runs natively as a watermarked
    windowed streaming aggregation — no custom state store, state
    bounded at O(windows x groups x depth x width) integer rows, final
    counters emitted in append mode when the watermark closes the
    window. The emitted rows merge offline with ``cms_rollup`` (exact
    counter addition), so hourly stream output rolls to daily/monthly
    frequency tables without rescanning history — and drain parity vs
    the batch build is EXACT, not estimate-vs-estimate (pinned in
    tests/test_streaming_sketches.py)."""
    from ..operators.freqsketch import DEFAULT_DEPTH, DEFAULT_WIDTH, _bucket

    depth = DEFAULT_DEPTH if depth is None else depth
    width = DEFAULT_WIDTH if width is None else width
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
        stream.filter(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(ts_col, *group_cols, F.explode(probes).alias("_p"))
        .groupBy(
            F.window(ts_col, window).alias("win"),
            *group_cols,
            F.col("_p.depth").alias("depth"),
            F.col("_p.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

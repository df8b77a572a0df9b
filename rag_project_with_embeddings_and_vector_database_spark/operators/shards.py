"""Deterministic global shuffle -> training shards — the LAST step of
every training-data pipeline (after filter/dedup/decontaminate/mix, the
corpus is written as N shards in a reproducible pseudo-random order so
the training loader sees an i.i.d.-ish stream without any runtime
shuffle of its own).

Why not ``ORDER BY rand()``: a global random sort is (a) a RANGE
exchange + total sort — the single most expensive shuffle shape at
100 TB, and (b) non-reproducible across retries/engines. The salted-
hash form gets the same statistical effect from ONE hash exchange:

  * ``shard``   = pmod(md5(id, seed), n_shards) — which shard a doc
    lands in; uniform by hash, reproducible by (id, seed).
  * ``pos``     = row_number within the shard, ordered by an
    INDEPENDENT second hash (salt seed+1, so intra-shard order is not
    correlated with shard choice), tie-broken by id for a total order.

Plan shape: one hash exchange on ``shard`` + a per-shard sort (Spark's
window sort spills, so a shard only has to fit on DISK, not in
memory). There is deliberately NO global sort and NO range exchange —
plan-pinned. Sizing at 100 TB: parallelism of the position pass equals
n_shards, so pick n_shards well above the executor count and far
enough below corpus/|doc| that a shard's sort stays disk-friendly
(10k shards x 10 GB at 100 TB is the comfortable middle; the writer
below keeps one file per shard either way).

Epoch semantics: a different ``seed`` is a DIFFERENT uniform
permutation of the same corpus (epoch e trains on seed base+e) —
pinned; the same seed replays bit-for-bit on any engine (the oracle
replays shard, order and position exactly).

The reference has no training-shard story; north-star extension
surface (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 1234,
) -> DataFrame:
    """Attach ``(shard, pos)`` to every row: the deterministic global
    shuffle. One hash exchange (partitionBy shard) + one per-shard
    spillable sort; no global ordering anywhere. ``pos`` is 0-based
    and dense within each shard — exactly the record index a training
    loader seeks by."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h_shard = md5_long(F.col(id_col).cast("string"), F.lit(str(seed)))
    h_order = md5_long(F.col(id_col).cast("string"), F.lit(str(seed + 1)))
    w = Window.partitionBy("shard").orderBy(
        F.col("_h_order").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("shard", F.pmod(h_shard, F.lit(n_shards)).cast("int"))
        .withColumn("_h_order", h_order)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_h_order")
    )


def shard_manifest(assigned: DataFrame) -> DataFrame:
    """The per-shard summary a training loader consumes before opening
    any data file: ``(shard, n_rows, min_pos, max_pos)``. Positions
    are dense 0..n-1 by construction, so ``max_pos == n_rows - 1``
    doubles as a corruption check (callers may assert it). One
    map-side-combinable aggregation, O(n_shards) output rows."""
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    assigned: DataFrame, path: str, payload_cols: list[str] | None = None
) -> None:
    """Write the shuffled corpus as ``{path}/shard=<k>/`` parquet, ONE
    file per shard sorted by ``pos`` (``repartition(shard)`` then
    ``sortWithinPartitions`` — the write discipline of every
    partitioned store in this repo: each directory gets exactly one
    file, and the loader streams a shard in position order without
    sorting anything). Overwrite-mode: re-running the shuffle is
    idempotent because (shard, pos) is a pure function of (id, seed)."""
    cols = payload_cols or [
        c for c in assigned.columns if c not in ("shard", "pos")
    ]
    (
        assigned.select("shard", "pos", *cols)
        .repartition("shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )

"""Bounded-state streaming dedup via ``dropDuplicatesWithinWatermark``
(Spark 3.5+) — the TTL form of the exact streaming dedup in
``streaming/ingest.py``.

Why a second dedup shape exists: plain ``dropDuplicates`` on a stream
keeps EVERY key seen forever — state grows with the corpus and a
100 TB/day ingest eventually cannot hold it. The production contract
most streaming dedups actually need is "drop re-arrivals within a
horizon": with an event-time watermark, Spark evicts a key's state
once the watermark passes its event time plus the delay, so state is
O(keys inside the horizon), never O(history). The semantic trade is
explicit: a duplicate arriving AFTER the horizon re-emits — callers
that need exact global dedup compose this with the STORED signature
index (dedup_gated_ingest), using the TTL stage as the cheap front
filter that absorbs the burst-duplicate common case.

The reference repo has no streaming at all; this is north-star surface
completing the streaming family (windowed aggs, exact dedup, gated
ingest, upsert, stateful sessionization, IVF growth, interval join).

Registered as ``stream_dedup_ttl`` since r10 (rows-checked: a real
availableNow drain with key-set parity vs a batch distinct, raising on
drift); pytest pins the within-horizon collapse, the beyond-horizon
re-emit that distinguishes it from exact dedup, and checkpoint
recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    horizon: str = "30 minutes",
) -> DataFrame:
    """First arrival per key within the watermark horizon; state for a
    key is evicted once the watermark passes ``ts + horizon``. The
    watermark must be set HERE (the horizon IS the eviction contract);
    callers chain ``.writeStream`` directly."""
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        key_cols
    )

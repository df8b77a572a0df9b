"""Stored-signature dedup index: the incremental near-dup path.

A production corpus does not re-pair 100 TB every day; it builds the
banded minhash signature table ONCE (``build_dedup_index``), writes it
out partitioned by (band, sig_bucket) — a bounded hash of band_hash,
since the raw hash is too high-cardinality to be a directory key —
and dedups each incoming delta against that index (``dedup_delta``)
with the delta's bucket set applied as a REAL partition filter:
O(|delta|) shingling plus one pruned probe join, never a corpus
self-join. The one-shot generator
(operators/dedup.py ``minhash_lsh_pairs``) remains the
backfill/bootstrap path; this module is its steady-state twin, sharing
the exact signature family so the two are value-identical (the
``dedup_incremental`` harness oracle proves it by definition: the
one-shot pairs over corpus-union-delta, filtered to pairs touching the
delta, hash-match ``dedup_delta``'s output).

Reference scope note: the reference pipeline (vector_db.py,
main.py) has no dedup at all — this whole family is the
training-data-pipeline extension surface (SURVEY.md north-star), and
the incremental form is what makes it operable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import swap_cache as _swap_cache
from .dedup import (
    _occupancy_guard,
    hamming64,
    minhash_bands,
    minhash_signatures,
    simhash_fingerprints,
)


def build_dedup_index(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """The dedup INDEXING job: the banded minhash signature table
    (id, sig, band, band_hash) — one row per (doc, band). At 100 TB
    this is WRITTEN OUT once per corpus snapshot, partitioned (or
    bucketed) by (band, band_hash) so an incremental delta's probe
    equi-join prunes to exactly the buckets the new docs land in; the
    corpus text is never re-shingled after the build. ``dedup_delta``
    is the query path over this index. Same signature family and band
    hashing as ``minhash_lsh_pairs`` (the one-shot form), so
    index+delta results are value-identical to re-running the one-shot
    generator over corpus-union-delta."""
    rows_per_band = num_perm // num_bands
    sig = minhash_signatures(df, content_col, id_col, shingle_n, num_perm, seed)
    return sig.select(
        F.col(id_col),
        "sig",
        F.explode(minhash_bands("sig", num_bands, rows_per_band)).alias("bb"),
    ).select(
        id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def dedup_delta(
    index: DataFrame,
    delta: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    broadcast_delta: bool = False,
) -> DataFrame:
    """INCREMENTAL near-dup detection — the operation a production
    corpus actually runs daily: dedup a NEW batch against the stored
    signature index without ever re-pairing the existing corpus.
    Returns exactly the candidate pairs of the one-shot
    ``minhash_lsh_pairs`` over corpus-union-delta that TOUCH at least
    one delta doc (same union-level oversized-bucket guard), as
    (id_a, id_b, est_jaccard) with id_a < id_b. Delta and corpus id
    spaces must be disjoint.

    Cost shape at scale: the delta is shingled/banded (O(|delta| x
    bands)); new-vs-corpus candidates come from ONE equi-join of the
    delta's bands against the index — with the index bucket-partitioned
    by (band, band_hash) the probe prunes to matched buckets, so the
    corpus contributes only matched-bucket rows, never a scan-and-pair
    of itself; new-vs-new candidates are a self-join of the (small)
    delta frame. The guard counts occupancy over index+delta so a
    degenerate bucket is dropped identically on both sides (a stored
    index would keep per-bucket occupancy as metadata and skip the
    count). ``broadcast_delta=True`` hints the (by-contract bounded)
    delta side broadcast so the probe join shuffles nothing — set it
    when the caller knows the delta is a bounded batch, as the
    streaming gate and probe helpers do."""
    delta_banded = build_dedup_index(
        delta, content_col, id_col, shingle_n, num_perm, num_bands, seed
    )
    return _probe_minhash(
        index, delta_banded, id_col, num_perm, max_bucket_size,
        broadcast_delta=broadcast_delta,
    )


def _probe_minhash(
    index: DataFrame,
    delta_banded: DataFrame,
    id_col: str,
    num_perm: int,
    max_bucket_size: int | None,
    broadcast_delta: bool = False,
) -> DataFrame:
    """The probe-join core of ``dedup_delta`` over an ALREADY-banded
    delta — split out so ``probe_dedup_index`` can shingle the delta
    exactly once (bucket discovery and the probe share the frame).

    Plan shape (r8, measured 2x faster than the r7 two-join form on
    small probes): the occupancy guard is a WINDOWED count over
    (band, band_hash) — one exchange, on the same key the join uses —
    instead of groupBy + anti-join (two); new-vs-old and new-vs-new
    are ONE fused join whose condition splits on the ``_new`` flag
    (least/greatest normalizes both cases), instead of two joins + a
    union. ``broadcast_delta=True`` (set by ``probe_dedup_index``,
    whose delta is a by-contract bounded daily batch it has already
    collected bucket keys from) hints the delta side broadcast so the
    probe join shuffles nothing."""
    unioned = index.withColumn("_new", F.lit(False)).unionByName(
        delta_banded.withColumn("_new", F.lit(True))
    )
    kept = _occupancy_guard(
        unioned, ["band", "band_hash"], max_bucket_size,
        broadcast_oversized=broadcast_delta,
    )
    kept = _swap_cache("dedup_delta", kept)
    new_side = kept.filter(F.col("_new")).alias("a")
    if broadcast_delta:
        new_side = F.broadcast(new_side)
    both = kept.alias("b")
    est = F.round(
        F.aggregate(
            F.zip_with(
                F.col("a.sig"),
                F.col("b.sig"),
                lambda x, y: F.when(x == y, F.lit(1.0)).otherwise(F.lit(0.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(num_perm)),
        6,
    ).alias("est_jaccard")
    # the id inequality on the old side is a no-op under the documented
    # disjoint-ids contract; it matters when a caller accumulates prior
    # deltas INTO the index (streaming ingest): a replayed doc then
    # meets its own stored signature, and same-id means same-document
    # (an update, not a duplicate). On the new side a.id < b.id emits
    # each new-new pair once.
    pairs = new_side.join(
        both,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (
            (~F.col("b._new") & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
            | (F.col("b._new") & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        ),
    ).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        est,
    )
    return pairs.distinct()


def build_simhash_index(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    num_blocks: int = 4,
) -> DataFrame:
    """The SimHash twin of ``build_dedup_index``: the pigeonhole-blocked
    fingerprint table (id, sh, block_id, block_key) — one row per
    (doc, block), written out bucketed by (block_id, block_key) at
    scale so ``simhash_delta``'s probe prunes. Same fingerprint and
    Manku blocking as the one-shot ``simhash_pairs``."""
    if bits % num_blocks != 0:
        raise ValueError(f"bits ({bits}) must be divisible by num_blocks ({num_blocks})")
    width = bits // num_blocks
    mask = (1 << width) - 1
    sh = simhash_fingerprints(df, content_col, id_col, bits).withColumnRenamed(
        "simhash", "sh"
    )
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("block_id"),
                F.shiftright(F.col("sh"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("block_key"),
            )
            for b in range(num_blocks)
        ]
    )
    return sh.select(F.col(id_col), "sh", F.explode(blocks).alias("bb")).select(
        id_col,
        "sh",
        F.col("bb.block_id").alias("block_id"),
        F.col("bb.block_key").alias("block_key"),
    )


def simhash_delta(
    index: DataFrame,
    delta: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    num_blocks: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
    broadcast_delta: bool = False,
) -> DataFrame:
    """Incremental SimHash near-dup detection over a stored blocked
    fingerprint index — the ``dedup_delta`` contract for the Hamming
    family: returns exactly the pairs of the one-shot ``simhash_pairs``
    over corpus-union-delta that touch at least one delta doc (same
    union-level bucket guard), as (id_a, id_b, hamming) with
    id_a < id_b. Recall is exact for max_hamming <= num_blocks - 1
    (pigeonhole). Disjoint id spaces required; cost is O(|delta| x
    blocks) fingerprinting plus one pruned probe join — the corpus is
    never re-fingerprinted."""
    delta_blocked = build_simhash_index(delta, content_col, id_col, bits, num_blocks)
    return _probe_simhash(
        index, delta_blocked, id_col, max_hamming, max_bucket_size,
        broadcast_delta=broadcast_delta,
    )


def _probe_simhash(
    index: DataFrame,
    delta_blocked: DataFrame,
    id_col: str,
    max_hamming: int,
    max_bucket_size: int | None,
    broadcast_delta: bool = False,
) -> DataFrame:
    """The probe-join core of ``simhash_delta`` over an ALREADY-blocked
    delta (see ``_probe_minhash`` — same windowed guard + fused-join
    plan shape)."""
    unioned = index.withColumn("_new", F.lit(False)).unionByName(
        delta_blocked.withColumn("_new", F.lit(True))
    )
    kept = _occupancy_guard(
        unioned, ["block_id", "block_key"], max_bucket_size,
        broadcast_oversized=broadcast_delta,
    )
    kept = _swap_cache("simhash_delta", kept)
    new_side = kept.filter(F.col("_new")).alias("a")
    if broadcast_delta:
        new_side = F.broadcast(new_side)
    both = kept.alias("b")
    ham = hamming64(F.col("a.sh"), F.col("b.sh")).cast("int").alias("hamming")
    block_eq = (F.col("a.block_id") == F.col("b.block_id")) & (
        F.col("a.block_key") == F.col("b.block_key")
    )
    # id inequality: no-op under disjoint ids, required when the index
    # accumulates prior deltas (see dedup_delta)
    pairs = new_side.join(
        both,
        block_eq
        & (
            (~F.col("b._new") & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
            | (F.col("b._new") & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        ),
    ).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        ham,
    )
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()


def probe_dedup_index(
    spark,
    path: str,
    delta: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    num_buckets: int = 64,
    bucket_col: str = "sig_bucket",
    max_delta_docs: int | None = 100_000,
    extra_index: DataFrame | None = None,
    layout_cache: dict | None = None,
) -> DataFrame:
    """The STEADY-STATE daily probe against a stored minhash signature
    index written ``partitionBy(band, sig_bucket)`` (the
    ``compact_signature_store`` layout, pmod-``num_buckets`` of
    band_hash): shingle/band the delta EXACTLY ONCE (localCheckpoint —
    bounded at |delta| x bands rows), collect its distinct partition
    keys (bounded at num_bands x num_buckets entries — 256 at the
    shared pmod-64 convention — never delta- or corpus-proportional),
    read ONLY the matched store partitions, and run the probe join.
    This packages the discover-prune-probe recipe the bench twin and
    VERDICT r5-r7 used inline, so the pruning contract lives in code —
    and costs one delta pass instead of two. The matched partitions
    are read by DIRECT PATH (batched Hadoop-FS listings, O(#bands)
    driver RPCs, then ``parquet(*dirs)`` under ``basePath``) rather
    than an OR-disjunct filter over the root: measured 4x faster at 83
    keys — the root listing plus per-row disjunct evaluation dominated
    the whole probe. Output contract == ``dedup_delta`` against the
    full index.

    The delta side is BROADCAST into the probe join and checkpointed,
    so this helper is for the bounded daily-batch contract only;
    ``max_delta_docs`` (ADVICE r8) converts a contract violation into
    a clear error instead of a silent memory degradation — enforced
    for free from the bucket-discovery aggregation itself (the
    per-key counts sum to |delta| x bands; no extra job). Pass
    ``None`` (or raise the cap) only when the caller has sized
    executor/driver memory for the larger broadcast; bulk backfills
    belong to the one-shot generator.

    Stores written by ``write_signature_store`` are SELF-DESCRIBING:
    their ``_store_meta.json`` modulus is validated AND adopted (the
    ``num_buckets`` argument is then only the fallback for meta-less
    stores), so probing a store bucketed with a different modulus —
    larger or SMALLER, which listings alone cannot prove — yields the
    correct pruned read instead of missed duplicates.

    ``extra_index`` unions additional ALREADY-banded signature rows
    (id, sig, band, band_hash) into the probe's index side — the
    streaming gate passes its small accumulated-survivor store here so
    one probe covers corpus-store + accumulation without re-shingling
    the delta twice. Extra rows in buckets the delta never addresses
    can't join and only add inert occupancy-guard groups, so the pair
    output equals a probe of the full union.

    ``layout_cache`` (r15, VERDICT r14 item 1): a caller-owned dict
    memoizing the store's PROBE PLANNING — the resolved sidecar
    modulus and the partition-directory listing — across repeated
    probes of the SAME immutable store generation. The streaming gate
    probes the corpus store once per micro-batch; without the cache
    every batch re-pays the sidecar read plus 1+#bands driver listing
    RPCs for a store that cannot change mid-drain. Pass a dict scoped
    to one store generation (the gate scopes it to one drain); never
    share it across store rewrites — the cache pins layout facts, not
    data."""
    num_buckets = _resolve_store_layout(
        spark, path, ("band", bucket_col), num_buckets,
        layout_cache=layout_cache,
    )
    banded = build_dedup_index(
        delta, content_col, id_col, shingle_n, num_perm, num_bands, seed
    ).localCheckpoint()
    keys = _discover_keys(
        banded, "band", "band_hash", num_buckets, num_bands,
        "probe_dedup_index", max_delta_docs,
    )
    pruned = _read_matched_partitions(
        spark, path,
        [(("band", b), (bucket_col, sb)) for b, sb in keys],
        empty_like=banded.select(id_col, "sig", "band", "band_hash"),
        bucket_modulus=num_buckets,
        layout_cache=layout_cache,
    )
    index_side = pruned.drop(bucket_col)
    if extra_index is not None:
        index_side = index_side.select(
            id_col, "sig", "band", "band_hash"
        ).unionByName(extra_index.select(id_col, "sig", "band", "band_hash"))
    return _probe_minhash(
        index_side, banded, id_col, num_perm, max_bucket_size,
        broadcast_delta=True,
    )


STORE_META_FILE = "_store_meta.json"

# The shared pmod convention every band-partitioned store uses when the
# corpus is large enough to saturate it (dedup/simhash signature stores,
# star bucket roots, bm25 term buckets).
DEFAULT_NUM_BUCKETS = 64

# auto-modulus sizing: aim for at least this many store rows per bucket
# directory before adding more hash-bucket splits — the small-files
# discipline (guide §6: tiny partition directories cost a file commit
# and a listing each, and at bench scale the pmod-64 fan-out writes 256
# directories of ~80 rows; measured 2.6 s vs 0.5 s for the identical
# materialized rows at modulus 8). A 100 TB corpus saturates to the
# DEFAULT_NUM_BUCKETS cap, so the at-scale layout is unchanged.
TARGET_ROWS_PER_DIR = 2000


def auto_modulus(n_rows_per_lvl1: int) -> int:
    """Pick the bucket modulus for a store holding ``n_rows_per_lvl1``
    rows under each level-1 partition (band / block_id): small stores
    get few (or one) bucket splits, large stores cap at the shared
    pmod-64 convention. Stores stay self-describing — probes adopt
    whatever modulus the ``_store_meta.json`` sidecar records, so any
    choice is probe-compatible and mixed-generation chains are fine."""
    return max(1, min(DEFAULT_NUM_BUCKETS, n_rows_per_lvl1 // TARGET_ROWS_PER_DIR))


def write_signature_store(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    bucket_modulus: int | None = None,
    mode: str = "overwrite",
) -> None:
    """The signature/assignment store WRITE DISCIPLINE in one place:
    repartition by the partition keys (without it every input task
    writes a file into every directory it touches — tasks x dirs tiny
    files; clustered, each directory gets exactly one file), write
    ``partitionBy`` parquet, and drop a ``_store_meta.json`` sidecar
    recording the layout and bucket modulus (ADVICE r8): probe helpers
    validate — and ADOPT — the modulus directly from metadata, which
    also makes the SMALLER-modulus mismatch provable (directory
    listings alone cannot catch it: every bucket value below the
    probe's modulus looks plausible). The underscore-prefixed sidecar
    is invisible to Spark's parquet reader; it is written through the
    Hadoop FS API so the same code serves HDFS/S3.

    ``mode='append'`` HOLDS the layout invariant instead of rewriting
    it (ADVICE r14): appending cannot change where existing rows live,
    so the stored generation's sidecar stays authoritative — an
    appender whose partition columns or bucket modulus differ from the
    recorded ones would create a mixed-modulus store whose sidecar
    lies to every probe (rows bucketed under the old modulus read from
    the wrong directories, duplicates silently missed), so a mismatch
    RAISES; a matching append leaves the sidecar untouched. Appends to
    a store without a sidecar record one (first writer wins)."""
    if mode == "append":
        meta = read_store_meta(df.sparkSession, path)
        if meta is not None:
            cols = tuple(meta.get("partition_cols") or ())
            recorded = meta.get("bucket_modulus")
            if cols != tuple(partition_cols) or recorded != bucket_modulus:
                raise ValueError(
                    f"write_signature_store(mode='append') to {path}: store "
                    f"records partition_cols={list(cols)} "
                    f"bucket_modulus={recorded}; appender brought "
                    f"{list(partition_cols)} / {bucket_modulus}. Layout "
                    f"facts cannot change on append — adopt the recorded "
                    f"modulus (read_store_meta) or compact to a new "
                    f"generation (compact_signature_store dest_path)."
                )
            df.repartition(*partition_cols).write.mode(mode).partitionBy(
                *partition_cols
            ).parquet(path)
            return
    df.repartition(*partition_cols).write.mode(mode).partitionBy(
        *partition_cols
    ).parquet(path)
    write_store_meta(df.sparkSession, path, partition_cols, bucket_modulus)


def write_store_meta(
    spark, path: str, partition_cols: tuple[str, ...], bucket_modulus: int | None
) -> None:
    """Drop (or overwrite) a store's ``_store_meta.json`` layout
    sidecar — split out of ``write_signature_store`` (r14) so stores
    with their own write shape (the bm25 postings table) record the
    same self-describing metadata probes adopt."""
    import json as _json

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{STORE_META_FILE}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(_json.dumps(
            {
                "partition_cols": list(partition_cols),
                "bucket_modulus": bucket_modulus,
            }
        ).encode("utf-8")))
    finally:
        out.close()


def read_store_meta(spark, path: str) -> dict | None:
    """Read a store's ``_store_meta.json`` sidecar, or None for stores
    predating the convention (probe helpers then fall back to
    listing-based validation). One existence probe + one small read."""
    import json as _json

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{STORE_META_FILE}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; py4j cannot fill a Python
        # bytearray through java's read(byte[]) (arrays cross the
        # bridge by copy), so read fully on the JVM side
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return _json.loads(data.decode("utf-8"))


def _resolve_store_layout(
    spark, path: str, expected_cols: tuple[str, str], num_buckets: int,
    layout_cache: dict | None = None,
) -> int:
    """Validate a store's metadata sidecar against the probe's expected
    partition columns and return the EFFECTIVE bucket modulus: the
    store's own recorded modulus when metadata exists (self-describing
    stores make the probe's ``num_buckets`` a fallback, not a
    contract), else the caller's ``num_buckets``. Raises on provable
    layout mismatches — wrong partition column names, or a store
    recorded without a modulus being probed as if bucketed.

    ``layout_cache`` memoizes the resolved modulus per (path,
    expected_cols) for repeated probes of one immutable store
    generation (see ``probe_dedup_index``)."""
    if layout_cache is not None:
        key = ("layout", path, expected_cols)
        if key in layout_cache:
            return layout_cache[key]
        resolved = _resolve_store_layout(spark, path, expected_cols, num_buckets)
        layout_cache[key] = resolved
        return resolved
    meta = read_store_meta(spark, path)
    if meta is None:
        return num_buckets
    cols = tuple(meta.get("partition_cols") or ())
    if cols != expected_cols:
        raise ValueError(
            f"store {path} metadata records partition_cols={list(cols)}; "
            f"probe expects {list(expected_cols)}"
        )
    modulus = meta.get("bucket_modulus")
    if modulus is None:
        raise ValueError(
            f"store {path} metadata records no bucket_modulus but the "
            f"probe addresses bucketed partitions; rebuild the store "
            f"with write_signature_store(bucket_modulus=...)"
        )
    return int(modulus)


def _discover_keys(
    banded: DataFrame,
    lvl1_col: str,
    hash_col: str,
    num_buckets: int,
    rows_per_doc: int,
    helper: str,
    max_delta_docs: int | None,
) -> list[tuple]:
    """Collect the delta's distinct (lvl1, pmod-bucket) partition keys
    — bounded at #lvl1 x num_buckets entries regardless of delta size
    — AND enforce the bounded daily-batch contract (ADVICE r8) from
    the SAME aggregation: the per-key counts sum to
    |delta| x rows_per_doc, so no separate counting job runs (the r9
    first cut paid one extra limit+count pass per probe — measured
    ~0.3-0.4 s of pure job overhead on the steady-state twins). The
    delta is broadcast downstream, so exceeding ``max_delta_docs``
    raises a clear error instead of degrading into driver/executor
    memory pressure; ``None`` disables."""
    rows = (
        banded.groupBy(
            lvl1_col, F.pmod(hash_col, F.lit(num_buckets)).alias("_sb")
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    if max_delta_docs is not None:
        n_docs = sum(r["_n"] for r in rows) // rows_per_doc
        if n_docs > max_delta_docs:
            raise ValueError(
                f"{helper}: delta has {n_docs} docs, exceeding "
                f"max_delta_docs={max_delta_docs}; it is broadcast into "
                f"the probe join under the bounded daily-batch contract. "
                f"Batch the delta, raise max_delta_docs explicitly, or "
                f"run the one-shot pair generator for bulk backfills."
            )
    return sorted({(r[lvl1_col], r["_sb"]) for r in rows})


def _list_store_partitions(
    spark, root: str, lvl1_col: str, lvl2_col: str | None,
    bucket_modulus: int | None,
) -> set:
    """The batched listing + layout-validation half of
    ``_read_matched_partitions``: one ``listStatus`` on the root plus
    one per level-1 directory, returning the set of existing partition
    directory tuples. Split out (r15) so a drain-scoped
    ``layout_cache`` can run it once per immutable store generation
    instead of once per micro-batch probe."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    lvl1 = [
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.isDirectory()
    ]
    bad = [d for d in lvl1 if not d.startswith(f"{lvl1_col}=")]
    if bad or not lvl1:
        raise ValueError(
            f"store {root} layout mismatch: expected {lvl1_col}= "
            f"partition directories, found {sorted(lvl1)[:5] or 'none'}"
        )
    if lvl2_col is None:
        return {(d,) for d in lvl1}
    existing = set()
    for d in lvl1:
        sub = jvm.org.apache.hadoop.fs.Path(f"{root}/{d}")
        lvl2 = [
            st.getPath().getName()
            for st in fs.listStatus(sub)
            if st.isDirectory()
        ]
        bad2 = [x for x in lvl2 if not x.startswith(f"{lvl2_col}=")]
        if bad2 or not lvl2:
            raise ValueError(
                f"store {root} layout mismatch: expected {lvl2_col}= "
                f"bucket directories under {d}, found "
                f"{sorted(lvl2)[:5] or 'none'}"
            )
        existing.update((d, x) for x in lvl2)
    if bucket_modulus is not None:
        store_max = max(int(x.split("=", 1)[1]) for _, x in existing)
        if store_max >= bucket_modulus:
            # the probe's pmod(hash, bucket_modulus) can never
            # address this directory -> the store was written
            # with a larger modulus; skipping would silently
            # miss duplicates
            raise ValueError(
                f"store {root} bucketed with modulus > "
                f"{bucket_modulus} (saw {lvl2_col}={store_max}); "
                f"pass the writer's num_buckets"
            )
    return existing


def _read_matched_partitions(
    spark, root: str, keys, empty_like: DataFrame, bucket_modulus: int | None = None,
    layout_cache: dict | None = None,
) -> DataFrame:
    """Read exactly the partition directories named by ``keys`` (each a
    tuple of (col, value) pairs, in partition order) from a
    ``partitionBy`` parquet store — Hadoop-FS existence probes (works
    on HDFS/S3, no full root listing) + a direct multi-path read with
    ``basePath`` so the partition columns are still recovered. Keys
    whose directory does not exist contribute nothing (the delta lands
    in a bucket the corpus never touched). If NO key matches, returns
    ``empty_like.limit(0)`` — the probe then sees an empty index and
    still emits new-vs-new pairs.

    A missing key is only safe to skip when the STORE LAYOUT actually
    matches the probe's key shape — a store written under different
    partition column names, or bucketed with a LARGER modulus than the
    probe assumes, would otherwise silently contribute nothing and let
    duplicates through. Discovery is BATCHED (r9, VERDICT r8 item 5):
    one ``listStatus`` on the root plus one per level-1 directory —
    O(#bands/#blocks) driver RPCs REGARDLESS of delta size, where the
    r8 form paid one sequential ``fs.exists`` RPC per candidate key
    and would stall the driver on a 100x-larger delta. The existing
    (lvl1, lvl2) directory set is then intersected with ``keys`` in
    memory. The same listings validate the layout: partition column
    names on EVERY directory, and the bucket modulus against the
    values seen across ALL level-1 directories (not just the first —
    ADVICE r8: a larger-modulus store whose first band directory held
    only low bucket values used to pass). Provable mismatches raise
    instead of returning an empty probe. (A store bucketed with a
    SMALLER modulus is still not provable from listings alone — keep
    ``num_buckets`` consistent with the writer, as every in-repo
    layout does via the shared pmod-64 convention.)

    ``layout_cache`` memoizes the validated directory set per root so
    repeated probes of one immutable store generation (a drain's
    micro-batches) pay the listing RPCs and the modulus validation
    once — see ``probe_dedup_index``."""
    if not keys:
        return empty_like.limit(0)
    lvl1_col = keys[0][0][0]
    lvl2_col = keys[0][1][0] if len(keys[0]) > 1 else None
    if layout_cache is not None:
        ck = ("dirs", root, lvl1_col, lvl2_col, bucket_modulus)
        existing = layout_cache.get(ck)
        if existing is None:
            existing = _list_store_partitions(
                spark, root, lvl1_col, lvl2_col, bucket_modulus
            )
            layout_cache[ck] = existing
    else:
        existing = _list_store_partitions(
            spark, root, lvl1_col, lvl2_col, bucket_modulus
        )
    dirs = [
        f"{root}/" + "/".join(parts)
        for parts in (
            tuple(f"{c}={v}" for c, v in key) for key in keys
        )
        if parts in existing
    ]
    if not dirs:
        return empty_like.limit(0)
    if len(dirs) == len(existing):
        # full-match fast path (r14, VERDICT r13 item 2): the delta
        # addresses EVERY stored partition — a bulk-backfill-shaped
        # probe — so the multi-path read (one file listing per
        # directory, 256 dirs under the pmod-64 convention) degrades
        # into pure overhead. One root scan recovers the same rows
        # with native partition discovery; pruning still engages
        # whenever any partition is unmatched (the steady-state case).
        return spark.read.option("basePath", root).parquet(root)
    return spark.read.option("basePath", root).parquet(*dirs)


def probe_simhash_index(
    spark,
    path: str,
    delta: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    num_blocks: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
    num_buckets: int = 64,
    bucket_col: str = "blk_bucket",
    max_delta_docs: int | None = 100_000,
) -> DataFrame:
    """``probe_dedup_index`` for the SimHash family: one fingerprint
    pass over the delta, partition-pruned read of a store written
    ``partitionBy(block_id, blk_bucket)``, then the blocked Hamming
    probe (batched direct-path matched-partition read,
    ``max_delta_docs`` bounded-delta guard, and metadata-adopted
    bucket modulus, see ``probe_dedup_index``). Output contract ==
    ``simhash_delta`` against the full index."""
    num_buckets = _resolve_store_layout(
        spark, path, ("block_id", bucket_col), num_buckets
    )
    blocked = build_simhash_index(
        delta, content_col, id_col, bits, num_blocks
    ).localCheckpoint()
    keys = _discover_keys(
        blocked, "block_id", "block_key", num_buckets, num_blocks,
        "probe_simhash_index", max_delta_docs,
    )
    pruned = _read_matched_partitions(
        spark, path,
        [(("block_id", b), (bucket_col, bb)) for b, bb in keys],
        empty_like=blocked.select(id_col, "sh", "block_id", "block_key"),
        bucket_modulus=num_buckets,
    )
    return _probe_simhash(
        pruned.drop(bucket_col), blocked, id_col, max_hamming, max_bucket_size,
        broadcast_delta=True,
    )


def compact_signature_store(
    spark,
    path: str,
    dedup_cols: tuple[str, ...] = ("doc_id", "band"),
    partition_col: str = "band",
    bucket_from: str | None = "band_hash",
    num_buckets: int | None = None,
    dest_path: str | None = None,
) -> int:
    """Compact an append-mode signature store (the accumulation target
    of streaming/ingest.dedup_gated_ingest): collapse replay-duplicated
    rows on ``dedup_cols`` and rewrite the store in the SAME pruned
    layout the stored corpus indexes use — partitioned by
    ``partition_col`` plus a bounded ``sig_bucket`` hash of
    ``bucket_from`` (pmod 64, the bm25 term_bucket pattern), so
    subsequent probes turn their bucket set into a real partition
    filter. Pass ``bucket_from=None`` (or point at an absent column)
    for the flat band-only layout. Run on the maintenance cadence
    (e.g. nightly) — between compactions the readers already dedup at
    read time, so compaction is purely a size/pruning optimization,
    never a correctness event. Returns the compacted row count. At
    100 TB this is the OPTIMIZE/rewrite step of a transactional table.

    Crash contract: pass ``dest_path`` to write a NEW table generation
    (the ``compact_text_index`` pointer-swap shape) — the source store
    is never touched, so a crash mid-write costs only the incomplete
    new directory and the source remains the store of record until the
    caller swaps its pointer. With ``dest_path=None`` the rewrite is
    IN-PLACE (read -> dropDuplicates -> localCheckpoint to cut the
    read-path lineage -> overwrite of the same path) — convenient for
    a store whose path is fixed by its readers, but a crash between
    the delete and the commit loses the store; reserve it for stores
    that are rebuildable from the corpus or snapshotted first. Both
    shapes finish through ``write_signature_store`` (which also drops
    the ``_store_meta.json`` sidecar the probe helpers validate and
    adopt). Note the readback gains a ``sig_bucket`` column; probe
    callers that union it with an unbucketed frame drop it first
    (dedup_delta itself never references it)."""
    df = spark.read.parquet(path).dropDuplicates(list(dedup_cols))
    # materialize once: the in-place mode needs the lineage cut before
    # overwriting the same path anyway, and with the r14 auto modulus
    # (num_buckets=None) the sizing count, the write and the returned
    # row count all reuse the same materialized rows
    df = df.localCheckpoint()
    parts = [partition_col]
    modulus = None
    if bucket_from is not None and bucket_from in df.columns:
        if num_buckets is None:
            num_buckets = auto_modulus(df.count())
        df = df.withColumn("sig_bucket", F.pmod(bucket_from, F.lit(num_buckets)))
        parts.append("sig_bucket")
        modulus = num_buckets
    write_signature_store(
        df, dest_path if dest_path is not None else path,
        tuple(parts), bucket_modulus=modulus,
    )
    return df.count()


def embedding_delta(
    corpus: DataFrame,
    delta: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    normalized: bool = False,
    max_delta_docs: int = 10_000,
    gate: str = "eager",
) -> DataFrame:
    """Incremental embedding-cosine near-dup detection — the third
    member of the incremental family (minhash ``dedup_delta``, SimHash
    ``simhash_delta``, and this): a NEW batch of embeddings is scored
    against the stored corpus embedding table without ever pairing
    corpus-vs-corpus. Returns exactly the pairs of the one-shot
    ``embedding_neardup_pairs`` over corpus-union-delta that TOUCH at
    least one delta id, as (id_a, id_b, cos_sim) with id_a < id_b and
    cos_sim rounded to 6 then threshold-filtered.

    Cost shape at scale: the delta is BROADCAST, so new-vs-corpus is
    ONE linear scan of the stored embedding table per batch — embedding
    column + id only, a few GB per billion rows at int8 — and
    new-vs-new is the delta's tiny self-join. (To prune the corpus
    scan further, probe a stored IVF index's matched buckets first —
    operators/retrieval.knn_ivf_indexed — trading exact recall for
    bucket recall; this operator is the exact-recall contract.)
    ``normalized=True`` skips the norm division (dot == cosine on unit
    vectors). The broadcast side is gated exactly like
    ``embedding_neardup_pairs``: an eager early-exit count raises past
    ``max_delta_docs`` (``gate='off'`` for callers composing bounded
    plans). Same-id pairs are excluded (an id present on both sides is
    the same document — an update, not a duplicate)."""
    from ..functions import vectors as V

    if gate not in ("eager", "off"):
        raise ValueError(f"gate must be 'eager' or 'off', got {gate!r}")
    a = delta.select(F.col(id_col).alias("_did"), F.col(vec_col).alias("v_a"))
    if gate == "eager" and a.limit(max_delta_docs + 1).count() > max_delta_docs:
        raise ValueError(
            f"embedding_delta delta side exceeds max_delta_docs="
            f"{max_delta_docs}; it is broadcast into a theta join against "
            f"the corpus scan, so an unbounded delta is O(n^2). Batch the "
            f"delta, raise max_delta_docs explicitly, or use "
            f"minhash/simhash blocking for bulk backfills."
        )
    # r14: norms once per join-side row (bit-identical; cosine_with_norms)
    a = a.withColumn("_na", V.norm("v_a"))
    sim_ab = (
        V.dot("v_a", "v_b")
        if normalized
        else V.cosine_with_norms("v_a", "v_b", "_na", "_nb")
    )
    b = corpus.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("v_b"),
        V.norm(vec_col).alias("_nb"),
    )
    new_old = (
        b.join(F.broadcast(a), F.col("_did") != F.col("_cid"))
        .select(
            F.least("_did", "_cid").alias("id_a"),
            F.greatest("_did", "_cid").alias("id_b"),
            F.round(sim_ab, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    b2 = delta.select(
        F.col(id_col).alias("_bid"), F.col(vec_col).alias("v_b"),
        V.norm(vec_col).alias("_nb"),
    )
    new_new = (
        b2.join(F.broadcast(a), F.col("_did") < F.col("_bid"))
        .select(
            F.col("_did").alias("id_a"),
            F.col("_bid").alias("id_b"),
            F.round(sim_ab, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return new_old.unionByName(new_new).distinct()

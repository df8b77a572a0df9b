"""Day-2 incremental star clustering — the stored-index twin of
``cluster.minhash_dedup_star`` (the same daily-batch shape as
``dedup_index`` / ``semantic_dedup_incremental`` / day-2 DSIR).

Day 1 persists two tables: the corpus's component assignment and the
LSH BUCKET ROOTS ``(band, band_hash, root)`` — the minimum member id
per occupied bucket, O(distinct buckets) <= n * bands rows. Day 2
never re-reads the day-1 corpus:

  1. the delta's banded signatures equi-join the stored bucket roots —
     a delta doc sharing any bucket with day 1 gets an edge to that
     bucket's root's COMPONENT label;
  2. delta-delta star edges come from the same groupBy-min as the
     one-shot path (new buckets the day-1 corpus never occupied);
  3. connected components run over this SMALL graph only — delta ids
     plus touched day-1 component labels as contracted supernodes.
     Contracting a connected subgraph (a day-1 cluster) to one node
     preserves component structure, and because day-1 labels are
     min-member ids, the min label over a merged group equals the min
     over ALL underlying member ids — so the incremental result is
     BIT-EQUAL to a full star recompute over day1 ∪ delta (the pinned
     contract, and the driver oracle);
  4. component merges caused by a bridging delta doc surface as a
     KB-scale REMAP table (old_label -> new_label) applied to the
     day-1 assignment as a broadcast join — the deletion-vector style
     trade: day 2 writes O(delta + merges) rows, never rewrites the
     corpus assignment.

Cost: O(delta * bands) probe rows against an O(buckets) store, CC over
O(delta + touched components) nodes. Degenerate buckets stay linear
for the same star reason as day 1.

New module (r12): the registration closure is its own harness entry;
primitives import from ``cluster`` / ``dedup`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cluster import components_checked
from .dedup import minhash_bands, minhash_signatures
from .dedup_index import (
    DEFAULT_NUM_BUCKETS,
    STORE_META_FILE,
    _discover_keys,
    _read_matched_partitions,
    _resolve_store_layout,
    auto_modulus,
    read_store_meta,
    write_signature_store,
)

# r14: the auto-modulus sizing moved to dedup_index (it now serves every
# band-partitioned store — signature, simhash, overlap AND these bucket
# roots); this alias keeps the original call sites and tests stable.
_auto_modulus = auto_modulus


def _banded(
    df: DataFrame,
    content_col: str,
    id_col: str,
    shingle_n: int,
    num_perm: int,
    num_bands: int,
    seed: int,
) -> DataFrame:
    sig = minhash_signatures(df, content_col, id_col, shingle_n, num_perm, seed)
    return sig.select(
        id_col,
        F.explode(minhash_bands("sig", num_bands, num_perm // num_bands)).alias("bb"),
    ).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )


def _probe_buckets(
    spark: SparkSession,
    path: str,
    delta_banded: DataFrame,
    num_bands: int,
    id_col: str,
) -> DataFrame:
    """The partition-pruned stored-bucket read behind the day-2 probe
    (VERDICT r12 item 4): the store is band/sig_bucket-partitioned, so
    the delta's distinct partition keys (bounded at num_bands x
    modulus) select exactly the matched directories — O(bands)
    discovery RPCs, stored buckets the delta never addresses are never
    read (plan-pinned in tests/test_plans.py). The delta is NOT
    broadcast on this path (the probe is a plain equi-join), so no
    max_delta_docs contract applies.

    Legacy stores (ADVICE r13): a bucket table written before the
    band-partitioned layout (flat parquet — no ``band=`` directories,
    no ``_store_meta.json``) is still READABLE: detected by the
    absence of both the sidecar and partition directories, it falls
    back to a FULL unpruned scan (correct, just O(store) instead of
    O(matched partitions)); rewrite via ``write_star_index`` to regain
    pruning. A store with partition directories but no sidecar keeps
    the listing-validated pruned path as before."""
    if read_store_meta(spark, f"{path}/buckets") is None:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/buckets")
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        has_band_dirs = any(
            st.isDirectory() and st.getPath().getName().startswith("band=")
            for st in fs.listStatus(hpath)
        )
        if not has_band_dirs:
            return spark.read.parquet(f"{path}/buckets").select(
                "band", "band_hash", "root"
            )
    num_buckets = _resolve_store_layout(
        spark, f"{path}/buckets", ("band", "sig_bucket"), DEFAULT_NUM_BUCKETS
    )
    keys = _discover_keys(
        delta_banded, "band", "band_hash", num_buckets, num_bands,
        "star_assign_incremental", None,
    )
    return _read_matched_partitions(
        spark,
        f"{path}/buckets",
        [(("band", b), ("sig_bucket", sb)) for b, sb in keys],
        empty_like=delta_banded.select(
            "band", "band_hash", F.col(id_col).alias("root")
        ),
        bucket_modulus=num_buckets,
    ).drop("sig_bucket")


def write_star_index(
    df: DataFrame,
    path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    bucket_modulus: int | None = None,
) -> None:
    """Persist the day-1 clustering state: ``{path}/components``
    (id, component — plain parquet, O(corpus) integer rows) and
    ``{path}/buckets`` (band, band_hash, root = min member id per
    occupied bucket) in the BAND-PARTITIONED signature-store layout
    (VERDICT r12 item 4; precedent ``dedup_index.write_signature_store``):
    ``partitionBy(band, sig_bucket)`` with the shared pmod-64 bucket of
    band_hash plus the ``_store_meta.json`` sidecar, so day-2 probes
    prune to exactly the delta's matched partitions with O(bands)
    discovery RPCs instead of scanning every stored bucket. The corpus
    text is never needed again by the day-2 path.

    ONE minhash pass (r14, VERDICT r13 item 2): components and bucket
    roots both derive from a single materialized banded frame — the
    bucket-roots table IS the star construction's ``mins`` aggregation,
    so the r13 shape (``minhash_dedup_star`` + a second ``_banded``
    scan for the store) shingled and minhashed the corpus TWICE per
    write. Star edges here are the same groupBy-min + equi-join as
    ``cluster.lsh_star_edges`` over the same banded rows, so the
    persisted assignment stays bit-equal to ``minhash_dedup_star``
    (pinned by every incremental-vs-full parity test).

    ``bucket_modulus=None`` (default) sizes the sig_bucket fan-out to
    the store via ``_auto_modulus`` — the small-files discipline; pass
    an explicit modulus to pin the layout (tests, or co-locating with
    a fixed-layout sibling store). Probes always adopt the modulus the
    sidecar records, so any choice is probe-compatible."""
    banded = _banded(
        df, content_col, id_col, shingle_n, num_perm, num_bands, seed
    ).localCheckpoint(eager=True)
    mins = (
        banded.groupBy("band", "band_hash")
        .agg(F.min(id_col).alias("root"))
        .localCheckpoint(eager=True)
    )
    edges = (
        banded.join(mins, ["band", "band_hash"])
        .filter(F.col(id_col) != F.col("root"))
        .select(F.col("root").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )
    comp = components_checked(edges).withColumnRenamed("id", id_col)
    assignment = (
        df.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )
    assignment.write.mode("overwrite").parquet(f"{path}/components")
    modulus = bucket_modulus if bucket_modulus is not None else _auto_modulus(
        mins.count()
    )
    buckets = mins.withColumn(
        "sig_bucket", F.pmod(F.col("band_hash"), F.lit(modulus))
    )
    write_signature_store(
        buckets, f"{path}/buckets", ("band", "sig_bucket"),
        bucket_modulus=modulus,
    )


def update_star_index(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    dest_path: str | None = None,
    in_place: bool = False,
) -> DataFrame:
    """Fold a day-2 delta INTO the stored index so day 3 can probe it:
    components become the incremental assignment (day-1 remapped +
    delta), buckets become min(stored root, delta members) per bucket
    — after which the store is indistinguishable from one built from
    scratch over day1 ∪ delta (pinned: a day-3 incremental against
    the updated store equals the three-day full recompute). Day-N
    chaining therefore costs O(store) rewrite, not O(corpus) text
    reprocessing. Returns the updated assignment frame.

    Crash contract (ADVICE r12; default hardened r14 per VERDICT r13
    item 8): pass ``dest_path`` to write BOTH tables into a NEW
    generation directory — the source store is never touched, a crash
    costs only the incomplete new directory, and a retry re-reads the
    ORIGINAL store so the id-disjoint delta contract holds across
    retries (the ``compact_signature_store`` dest_path shape); the
    caller swaps its pointer when both tables land. The IN-PLACE
    rewrite (two sequential overwrites behind localCheckpoint
    barriers) is now an EXPLICIT opt-in via ``in_place=True`` — a
    crash BETWEEN the two overwrites leaves a mixed-generation store,
    and a retry would re-submit delta ids already folded into
    components (violating the id-disjoint contract, duplicating
    assignment rows); reserve it for stores that are snapshotted or
    rebuildable. Calling with NEITHER raises, so a caller who never
    read this paragraph cannot silently land on the crash-prone path
    (pinned in tests/test_cluster_index.py)."""
    if dest_path is None and not in_place:
        raise ValueError(
            "update_star_index: pass dest_path=<new generation dir> "
            "(crash-safe, recommended) or in_place=True (explicit "
            "opt-in: a crash between the two overwrites tears the "
            "store and a retry duplicates delta assignment rows)"
        )
    out = dest_path if dest_path is not None else path
    # one minhash pass for the delta (r14): the banded frame feeds both
    # the incremental assignment and the merged bucket roots
    delta_banded = _banded(
        delta, content_col, id_col, shingle_n, num_perm, num_bands, seed
    ).localCheckpoint(eager=True)
    updated = star_assign_incremental(
        spark, delta, path, content_col, id_col,
        shingle_n, num_perm, num_bands, seed,
        _delta_banded=delta_banded,
    )
    if in_place:
        # the in-place overwrite reads {path}/components inside
        # ``updated``'s own plan — the lineage must be cut before the
        # same path is overwritten
        updated = updated.localCheckpoint(eager=True)
    delta_buckets = (
        delta_banded
        .groupBy("band", "band_hash")
        .agg(F.min(id_col).alias("root"))
    )
    merged_buckets = (
        spark.read.parquet(f"{path}/buckets")
        .drop("sig_bucket")
        .unionByName(delta_buckets)
        .groupBy("band", "band_hash")
        .agg(F.min("root").alias("root"))
        # materialized in BOTH modes (r14): the auto-modulus count
        # below needs the rows anyway, and the in-place mode needs the
        # lineage cut before overwriting the same paths
        .localCheckpoint(eager=True)
    )
    modulus = _auto_modulus(merged_buckets.count())
    merged_buckets = merged_buckets.withColumn(
        "sig_bucket", F.pmod(F.col("band_hash"), F.lit(modulus))
    )
    updated.select(id_col, "component").write.mode("overwrite").parquet(
        f"{out}/components"
    )
    write_signature_store(
        merged_buckets, f"{out}/buckets", ("band", "sig_bucket"),
        bucket_modulus=modulus,
    )
    if not in_place:
        # r15 (guide §1.2 — don't compute things twice): the dest-path
        # mode used to eagerly localCheckpoint ``updated`` and then
        # write the same rows, materializing the FULL day1+delta
        # assignment twice per fold. The write above is the single
        # materialization; the returned frame is the store just
        # written, with ``keep`` re-derived by its definition
        # (id == component) — bit-identical rows, one O(corpus) pass
        # saved per generation.
        return (
            spark.read.parquet(f"{out}/components")
            .withColumn("keep", F.col(id_col) == F.col("component"))
        )
    return updated


def star_assign_incremental(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    _delta_banded: DataFrame | None = None,
) -> DataFrame:
    """Assign a day-2 delta against the stored day-1 clustering and
    return the FULL updated assignment ``(id, component, keep)`` —
    bit-equal to a from-scratch star recompute over day1 ∪ delta
    (pinned in tests/test_cluster_index.py; hash-oracled on the
    driver). The delta must be ID-DISJOINT from day 1 — the same
    daily-batch contract every incremental path in this repo carries
    (dedup_index probes, semantic deltas, day-2 DSIR); a re-submitted
    day-1 id would emit two assignment rows rather than deduplicate.
    A production pipeline persists only the delta rows and
    the remap table this derives (O(delta + merges)); the day-1 side
    of the returned frame is the stored assignment passed through one
    broadcast remap join, reproduced here so the contract is checkable
    end-to-end."""
    day1_comp = spark.read.parquet(f"{path}/components")

    # ``_delta_banded``: internal fast path (update_star_index) handing
    # in an already-materialized banded frame so the delta is shingled
    # and minhashed exactly once per fold
    delta_banded = (
        _delta_banded
        if _delta_banded is not None
        else _banded(
            delta, content_col, id_col, shingle_n, num_perm, num_bands, seed
        ).localCheckpoint(eager=True)
    )

    buckets = _probe_buckets(spark, path, delta_banded, num_bands, id_col)

    # (1) delta -> day-1 component edges through shared buckets. The
    # bucket root is a day-1 doc; its component label contracts the
    # whole day-1 cluster to one supernode.
    root_comp = day1_comp.select(
        F.col(id_col).alias("root"), F.col("component").alias("_c1")
    )
    cross_edges = (
        delta_banded.join(buckets, ["band", "band_hash"])
        .join(root_comp, "root")
        .select(F.col(id_col).alias("id_a"), F.col("_c1").alias("id_b"))
        .distinct()
    )
    # (2) delta-delta star edges (buckets day 1 never occupied join
    # among themselves exactly like the one-shot path)
    delta_edges = (
        delta_banded.groupBy("band", "band_hash")
        .agg(F.min(id_col).alias("_root"))
        .join(delta_banded, ["band", "band_hash"])
        .filter(F.col(id_col) != F.col("_root"))
        .select(F.col("_root").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )
    # (3) components over the contracted graph only — convergence
    # RAISE-checked (the bit-equality-with-exact-closure contract)
    small = components_checked(cross_edges.unionByName(delta_edges))

    # (4) remap for day-1 labels that merged (or were relabeled by a
    # smaller delta id); KB-scale — broadcast over the stored frame
    labels = small.withColumnRenamed("id", "_node")
    remap = (
        day1_comp.select(F.col("component").alias("old_label"))
        .distinct()
        .join(
            labels.select(
                F.col("_node").alias("old_label"),
                F.col("component").alias("new_label"),
            ),
            "old_label",
        )
        .filter(F.col("old_label") != F.col("new_label"))
    )
    day1_updated = (
        day1_comp.join(
            F.broadcast(remap),
            day1_comp.component == remap.old_label,
            "left",
        )
        .select(
            id_col,
            F.coalesce("new_label", "component").alias("component"),
        )
    )
    delta_assigned = (
        delta.select(id_col)
        .join(labels.select(F.col("_node").alias(id_col), "component"), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )
    return (
        day1_updated.unionByName(delta_assigned)
        .withColumn("keep", F.col(id_col) == F.col("component"))
    )

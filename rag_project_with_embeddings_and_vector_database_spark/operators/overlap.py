"""Cross-corpus overlap estimation (north-star extension).

The acquisition-time question every data team asks before paying for a
new crawl/dataset: "how much of corpus B do we already have in corpus
A?" Answered here with the same banded-MinHash machinery the dedup
family uses (operators/dedup.py, imported not modified) — but as an
A-PROBE-B join rather than a self-join, i.e. the dedup_delta shape: B's
banded signatures equi-join A's on (band, band_hash), candidates are
confirmed by signature-agreement Jaccard, and each B doc gets a
``matched`` verdict. No pair ever forms outside a shared LSH bucket, so
the cost is |A|+|B| signature scans plus one bucket-keyed shuffle —
never |A|x|B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_bands, minhash_signatures, _occupancy_guard


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
        "sig",
        F.explode(minhash_bands("sig", num_bands, num_perm // num_bands)).alias("bb"),
    ).select(
        id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Per-B-doc near-dup verdict against corpus A: (id, matched) for
    every row of ``b``, where matched means >= 1 A-doc shares an LSH
    band bucket AND the signature-agreement Jaccard clears
    ``threshold``. Summarize with one trivial aggregate
    (avg(matched::int) = the overlap fraction). The bucket guard drops
    degenerate boilerplate buckets on BOTH sides before the probe join
    (same rationale and knob as minhash_lsh_pairs); A-side reuse across
    many probe corpora is the stored-index variant — write the banded
    A frame out once (dedup_index.py's layout) and this probe becomes
    the partition-pruned dedup_delta path."""
    ba = _banded(a, content_col, id_col, shingle_n, num_perm, num_bands, seed)
    bb = _banded(b, content_col, id_col, shingle_n, num_perm, num_bands, seed)
    ba = _occupancy_guard(ba, ["band", "band_hash"], max_bucket_size)
    bb = _occupancy_guard(bb, ["band", "band_hash"], max_bucket_size)
    agree = F.aggregate(
        F.zip_with(
            F.col("b.sig"), F.col("a.sig"),
            lambda x, y: F.when(x == y, F.lit(1.0)).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_perm))
    matched = (
        bb.alias("b")
        .join(ba.alias("a"), ["band", "band_hash"])
        .filter(F.round(agree, 6) >= F.lit(threshold))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("matched", F.lit(True))
    )
    return (
        b.select(id_col)
        .join(matched, id_col, "left")
        .select(id_col, F.coalesce("matched", F.lit(False)).alias("matched"))
    )


def probe_overlap_index(
    spark,
    path: str,
    b: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
    num_buckets: int = 64,
    bucket_col: str = "sig_bucket",
) -> DataFrame:
    """``corpus_overlap`` against a STORED banded index of corpus A —
    the amortized shape when MANY candidate corpora are screened
    against one holding: A is shingled/banded ONCE
    (``dedup_index.build_dedup_index`` + ``write_signature_store``
    with the usual (band, sig_bucket) layout — the store is
    interchangeable with the incremental-dedup signature store), and
    each candidate B pays only its own signature pass plus a
    partition-PRUNED probe join. Output contract == ``corpus_overlap``
    over the full A (per-B-doc ``matched`` verdicts).

    Scale shape: B is NOT assumed bounded (a candidate corpus can be
    huge) — its guarded banded frame is persisted via the scoped cache
    (one frame per call, ``release_caches()`` drops it; at 100 TB you
    write it out instead) and the probe join shuffles on the bucket
    key. Partition discovery stays bounded REGARDLESS of |B|: the
    distinct (band, pmod-bucket) key space is at most
    num_bands x num_buckets (256 at the shared convention), so the
    driver collect and the per-band ``listStatus`` RPCs never grow
    with the data. Pruning cannot change the result: a
    (band, band_hash) bucket lives entirely inside one
    (band, sig_bucket) partition, so every bucket B can touch is read
    in full — the A-side occupancy guard over the pruned read counts
    exactly what it would over the full store — and unmatched buckets
    can produce no matches. Self-describing stores
    (``_store_meta.json``) have their modulus validated and adopted."""
    from ._cache import swap_cache as _swap_cache
    from .dedup_index import _read_matched_partitions, _resolve_store_layout

    bb = _banded(b, content_col, id_col, shingle_n, num_perm, num_bands, seed)
    bb = _occupancy_guard(bb, ["band", "band_hash"], max_bucket_size)
    bb = _swap_cache("probe_overlap_index", bb)
    num_buckets = _resolve_store_layout(
        spark, path, ("band", bucket_col), num_buckets
    )
    keys = sorted(
        {
            (r.band, r.sb)
            for r in bb.select(
                "band", F.pmod("band_hash", F.lit(num_buckets)).alias("sb")
            )
            .distinct()
            .collect()
        }
    )
    ba = _read_matched_partitions(
        spark, path,
        [(("band", k), (bucket_col, sb)) for k, sb in keys],
        empty_like=bb,
        bucket_modulus=num_buckets,
    ).drop(bucket_col)
    ba = _occupancy_guard(ba, ["band", "band_hash"], max_bucket_size)
    agree = F.aggregate(
        F.zip_with(
            F.col("b.sig"), F.col("a.sig"),
            lambda x, y: F.when(x == y, F.lit(1.0)).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_perm))
    matched = (
        bb.alias("b")
        .join(ba.alias("a"), ["band", "band_hash"])
        .filter(F.round(agree, 6) >= F.lit(threshold))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("matched", F.lit(True))
    )
    return (
        b.select(id_col)
        .join(matched, id_col, "left")
        .select(id_col, F.coalesce("matched", F.lit(False)).alias("matched"))
    )

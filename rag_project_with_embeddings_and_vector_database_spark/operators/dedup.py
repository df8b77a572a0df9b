"""Deduplication operators for large-scale training-data pipelines.

North-star extensions (BASELINE.json / SURVEY.md §2.9) — not in the
reference, designed for the 100 TB regime:

  * exact_dedup        — sha256 content hash, groupBy keeper selection.
  * minhash signatures — shingle -> 60-bit md5 hash -> k permutations of a
                         universal hash family (a*x+b mod p), all as native
                         Catalyst expressions (no Python in the hot path).
  * minhash_lsh_pairs  — band the signature, shuffle once on (band,
                         band-hash) buckets, self-join within buckets.
  * simhash            — 32-bit sign-aggregated token hashes; near-dup =
                         small Hamming distance.
  * ngram_jaccard      — exact n-gram Jaccard on candidate pairs.
  * embedding near-dup — cosine > threshold pairs over embeddings.
  * connected components — iterative min-label propagation to collapse
                         duplicate *clusters* (small-diameter graphs
                         converge in a few joins).

Scale notes: every operator shuffles on a uniformly-distributed hash key
(band bucket, content hash), so skew is bounded; candidate generation is
O(n * bands) not O(n^2); only within-bucket pairs are scored. The base
hash (md5 -> 60-bit int) is engine-portable so DuckDB oracles reproduce
signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import md5_long, whitespace_tokens

# Mersenne prime 2^31 - 1: modulus for the universal hash family. Small
# enough that a*h+b stays < 2^63 (no int64 overflow, no 128-bit tricks),
# large enough for minhash (per-perm collision odds ~5e-10).
_P = (1 << 31) - 1

# Bounded per-operator cache registry (ADVICE r3): the pair generators
# persist() their banded/blocked frame because BOTH sides of the
# self-join read it (no exchange reuse across differing join-side
# projections — measured ~1.6x without the cache). Each generator
# swaps its previous persisted frame out (at most ONE cached frame per
# generator) and release_caches() drops them all — shared scoped
# registry in operators/_cache.py.
from ._cache import release_caches  # noqa: F401  (re-exported public API)
from ._cache import swap_cache as _swap_cache


# r15 (guide §1/§7.3 — the driver gap is the bottleneck, not the
# executors): CONSTRUCTED-EXPRESSION memo. Building the minhash /
# simhash expression trees costs ~0.6-1.1 s of pure Python->py4j
# round-trips per call (measured: hundreds of Column ops and lambda
# registrations), and the streaming gate pays it once per MICRO-BATCH,
# the batch family once per query. A Column is an immutable unresolved
# expression tree — a pure function of the constructor parameters, no
# data, no session state — so reusing one across DataFrames/queries is
# exactly as safe as writing the same expression twice. This memoizes
# PLAN OBJECTS only; it can never cache results (the cache key is the
# parameter tuple, the value is an unresolved AST).
_EXPR_CACHE: dict = {}


def _cached_exprs(key: tuple, build):
    got = _EXPR_CACHE.get(key)
    if got is None:
        got = build()
        _EXPR_CACHE[key] = got
    return got


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) parameters via an LCG recurrence —
    reproducible in SQL (the oracle inlines the constants)."""
    params = []
    x = seed & 0xFFFFFFFF
    for _ in range(num_perm):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (_P - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % _P
        params.append((a, b))
    return params


def content_hash(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def exact_dedup(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by content hash, keep the minimum id; returns
    (content_sha, keeper_id, n_dups). At scale this is one hash-partition
    shuffle on a uniform 256-bit key — no skew, no sort."""
    return (
        df.select(content_hash(content_col).alias("content_sha"), F.col(id_col))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), built natively:
    tokens -> sequence(0, len-n) -> concat_ws slices.

    Documents shorter than n tokens emit ONE truncated gram (their whole
    token sequence): try_element_at yields NULL past the end and
    concat_ws skips NULLs — the same semantics DuckDB's out-of-range
    list indexing gives the oracle. Plain element_at would throw
    INVALID_ARRAY_INDEX under ANSI mode on any short doc."""
    def build(c):
        toks = F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != F.lit(""))
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        gram = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
        return F.array_distinct(gram)

    if isinstance(col, str):
        # name-keyed expression memo (see _EXPR_CACHE) — Column args
        # are not hashable keys, so only the string form caches
        return _cached_exprs(("shingles", col, n), lambda: build(F.col(col)))
    return build(col)


def minhash_signature(
    shingle_col: Column | str, num_perm: int = 16, seed: int = 42
) -> Column:
    """Array of num_perm minhash values.

    h_i(s) = (a_i * (H(s) mod P) + b_i) mod P, minimized over shingles,
    where H(s) is the portable 60-bit md5 hash. a, b, H mod P are all
    < 2^31 so a*h+b < 2^63: plain int64 arithmetic, identical in any
    engine (the oracle inlines the (a, b) constants)."""
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    hashes = F.transform(c, lambda s: md5_long(s) % _P)

    def _perm_fn(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % _P

    sigs = [
        F.array_min(F.transform(hashes, _perm_fn(a, b)))
        for a, b in _perm_params(num_perm, seed)
    ]
    return F.array(*sigs)


def minhash_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    seed: int = 42,
) -> DataFrame:
    """DataFrame-level minhash: explode shingles -> hash each gram ONCE ->
    one groupBy(id) computing all permutation minima as aggregate
    functions. Same values as ``minhash_signature`` (the column form),
    but the physical plan is a single uniform-key shuffle with map-side
    partial min aggregation — the shape that scales; the column form
    re-evaluates the hash array per permutation (no common-subexpression
    elimination across array transforms)."""
    gram_col, hash_col, aggs, sig_arr = _cached_exprs(
        ("minhash_sig", content_col, shingle_n, num_perm, seed),
        lambda: (
            F.explode(shingles(content_col, shingle_n)).alias("gram"),
            (md5_long("gram") % _P).alias("h"),
            tuple(
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % _P).alias(f"mh_{i}")
                for i, (a, b) in enumerate(_perm_params(num_perm, seed))
            ),
            F.array(*[f"mh_{i}" for i in range(num_perm)]).alias("sig"),
        ),
    )
    grams = df.select(F.col(id_col), gram_col)
    hashed = grams.select(id_col, hash_col)
    sig = hashed.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, sig_arr)


def minhash_bands(sig_col: Column | str, num_bands: int, rows_per_band: int) -> Column:
    """Array of (band_id, band_hash) structs: the LSH bucketing key."""

    def build(c):
        bands = []
        for band in range(num_bands):
            vals = [c[band * rows_per_band + r] for r in range(rows_per_band)]
            bands.append(
                F.struct(
                    F.lit(band).alias("band"),
                    md5_long(F.concat_ws("_", *[v.cast("string") for v in vals])).alias("band_hash"),
                )
            )
        return F.array(*bands)

    if isinstance(sig_col, str):
        return _cached_exprs(
            ("minhash_bands", sig_col, num_bands, rows_per_band),
            lambda: build(F.col(sig_col)),
        )
    return build(sig_col)


def bucket_stats(df: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """Per-bucket cardinality with a ``dropped`` flag: the observability
    companion to the oversized-bucket guard — run it to see exactly
    which LSH/blocking buckets the pair generators skipped."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .withColumn("dropped", F.col("n_members") > max_bucket_size)
    )


def _occupancy_guard(
    df: DataFrame, keys: list[str], max_bucket_size: int | None,
    broadcast_oversized: bool = False,
) -> DataFrame:
    """Drop rows in buckets holding more than ``max_bucket_size`` rows
    before a within-bucket self-join. A degenerate bucket (thousands of
    identical or boilerplate docs — ubiquitous in web corpora) makes
    the self-join quadratic; such docs are better collapsed by
    exact_dedup first. Two physical forms, picked by the caller to
    match the downstream join strategy — they keep the SAME rows
    (equivalence pinned in tests/test_round8.py):

    - default (shuffle-join path — the one-shot pair generators and the
      non-broadcast probes): ONE windowed count over the join key. The
      window's exchange lands the data hash-partitioned on exactly the
      key the self-join shuffles on, so the guard's exchange IS the
      join's exchange — net one, where the r8-era groupBy + anti-join
      form paid two (migrated r9, VERDICT r8 item 2).

    - ``broadcast_oversized=True`` (broadcast-join path): when the
      downstream join broadcasts the small side, it needs NO exchange —
      the window's full-row exchange would then be the plan's ONLY
      shuffle, pure overhead. Instead: a map-side-combinable groupBy
      count (shuffles one partial row per bucket per partition, never
      data rows) finds the oversized buckets and a broadcast LEFT ANTI
      join drops their rows — zero full-row exchanges. The broadcast
      key set is bounded at |rows|/max_bucket_size keys (in practice
      the handful of degenerate shingles), but on a pathologically
      skewed corpus that bound is the corpus size over the threshold —
      callers that cannot assert a bounded oversized set (one-shot
      scans of unvetted web corpora) must stay on the default windowed
      form, which never collects keys to the driver (ADVICE r8)."""
    if max_bucket_size is None:
        return df
    if broadcast_oversized:
        oversized = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket_size)
            .select(*keys)
        )
        return df.join(F.broadcast(oversized), keys, "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band bucket, with
    the estimated Jaccard (signature agreement rate).

    Shuffle profile at scale: one explode to (doc, band) rows — n*bands
    rows — one hash shuffle on (band, band_hash), within-bucket self-join,
    then distinct on (a, b). Buckets larger than ``max_bucket_size`` are
    dropped before the self-join (the quadratic-blowup guard; inspect
    them with ``bucket_stats``) — at default settings a single degenerate
    bucket of 100k identical boilerplate docs would otherwise emit 5e9
    pairs. Exact duplicates belong to exact_dedup, which is linear.

    The guarded banded frame is persist()ed: it is read by BOTH sides
    of the self-join, and without the cache Spark recomputes the whole
    shingle->hash->min-agg signature pipeline per side (no exchange
    reuse across the differing join-side projections — measured ~1.6x
    wall on the pair query). Persist placement was measured, not
    guessed: caching after the guard (signature computed twice during
    the fill, once per guard subtree) beats caching before it (guard
    anti-join recomputed per join side) and beats caching both layers
    (double cache-write overhead) — 1.7s vs 2.3s vs 1.9s at sf0.1.
    The cache is SCOPED (a few dozen bytes per (doc, band) row): each
    call swaps out the previous call's frame — at most one cached frame
    per generator, ``release_caches()`` drops it — and at 100 TB the
    same role is played by writing the signature table out, which dedup
    rounds reuse anyway."""
    rows_per_band = num_perm // num_bands
    sig = minhash_signatures(df, content_col, id_col, shingle_n, num_perm, seed)
    banded = sig.select(
        id_col, "sig", F.explode(minhash_bands("sig", num_bands, rows_per_band)).alias("bb")
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    banded = _occupancy_guard(banded, ["band", "band_hash"], max_bucket_size)
    banded = _swap_cache("minhash_lsh_pairs", banded)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                F.aggregate(
                    F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: F.when(x == y, F.lit(1.0)).otherwise(F.lit(0.0))),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.lit(float(num_perm)),
                6,
            ).alias("est_jaccard"),
        )
        .distinct()
    )
    return pairs


def verify_pairs_exact_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    verify_threshold: float = 0.5,
    containment_threshold: float | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate near-dup pairs — the
    second half of the production fuzzy-dedup shape. LSH banding emits
    a candidate SUPERSET (anything sharing one band bucket); committing
    a destructive keep/drop verdict on the 16-perm estimate alone would
    delete documents whose true similarity is far below the threshold.

    Besides ``exact_jaccard``, every surviving pair carries
    ``containment`` = |A∩B| / min(|A|,|B|): the asymmetric overlap a
    short document wholly embedded in a long one scores ~1.0 while its
    Jaccard stays low. Pass ``containment_threshold`` to ALSO keep
    pairs that clear it (OR-combined with the Jaccard gate) — the
    subset-dedup policy used when boilerplate-wrapped reposts should
    collapse onto their source.
    This pass computes the true shingle-set Jaccard for candidates only
    and keeps pairs with exact_jaccard >= verify_threshold.

    Scale shape: the corpus's distinct (doc, gram) rows are exploded
    ONCE; candidate pairs equi-join that table on id_a, then on
    (id_b, gram) — so the work is linear in sum(|A ∩ B|) over the
    candidate pairs, never quadratic in the corpus, and the gram join
    key is uniform (md5-distributed text shingles). Set sizes come from
    the same exploded table (one groupBy(id) count — map-side
    combinable), so shingling runs once end to end.

    Zero-overlap candidates drop out of the intersection equi-join by
    construction, which is only correct because they cannot pass a
    positive threshold — hence the guard below."""
    if not verify_threshold > 0:
        raise ValueError(
            "verify_threshold must be > 0: zero-overlap candidate pairs are "
            "dropped by the intersection join, so a non-positive threshold "
            "could not be honored"
        )
    if containment_threshold is not None and not containment_threshold > 0:
        raise ValueError("containment_threshold must be > 0 when given")
    sh = df.select(
        F.col(id_col), F.explode(shingles(content_col, shingle_n)).alias("gram")
    )
    sh = _swap_cache("verify_pairs_exact_jaccard", sh)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_grams"))
    inter = (
        pairs.select("id_a", "id_b")
        .join(sh.select(F.col(id_col).alias("id_a"), "gram"), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), "gram"), ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_n_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"])
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("_n_grams").alias("_n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_n_grams").alias("_n_b")), "id_b")
        .withColumn(
            "exact_jaccard",
            F.round(
                F.col("_n_inter")
                / F.greatest(F.col("_n_a") + F.col("_n_b") - F.col("_n_inter"), F.lit(1)),
                6,
            ),
        )
        # asymmetric overlap |A∩B| / min(|A|,|B|): a short document
        # contained wholesale in a long one has low Jaccard but
        # containment ~1 — the signal subset-dedup policies act on
        .withColumn(
            "containment",
            F.round(
                F.col("_n_inter")
                / F.greatest(F.least(F.col("_n_a"), F.col("_n_b")), F.lit(1)),
                6,
            ),
        )
        .filter(
            (F.col("exact_jaccard") >= verify_threshold)
            if containment_threshold is None
            else (
                (F.col("exact_jaccard") >= verify_threshold)
                | (F.col("containment") >= containment_threshold)
            )
        )
        .drop("_n_inter", "_n_a", "_n_b")
    )


def simhash(col: Column | str, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: bit j of the fingerprint is the
    sign of sum(+1/-1 over tokens' hash bit j). Native expressions only."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != F.lit(""))
    hashes = F.transform(toks, lambda t: md5_long(t))

    def _vote_fn(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_terms = []
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("bigint"), _vote_fn(j))
        bit_terms.append(
            F.when(vote > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        )
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def simhash_fingerprints(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """DataFrame-level simhash: explode tokens, hash each ONCE, one
    groupBy(id) with per-bit conditional sums — same values as the
    ``simhash`` column form, scalable plan (single shuffle, map-side
    partial sums). Token-less docs (which the explode would drop) are
    joined back with fingerprint 0, matching the column form."""
    def build():
        tok_col = F.explode(
            F.filter(F.split(F.lower(F.col(content_col)), r"\s+"), lambda x: x != F.lit(""))
        ).alias("tok")
        hash_col = md5_long("tok").alias("h")
        # branch-free per-bit tally: sum the raw bit instead of a +1/-1
        # CASE; vote_j = 2*ones_j - n, so vote_j > 0 <=> 2*ones_j > n —
        # identical sign semantics, but the per-row expression is
        # shift+and+add with no conditional, which codegen vectorizes
        # better across 32 aggregates.
        ones = tuple(
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"b_{j}")
            for j in range(bits)
        )
        out = F.lit(0).cast("bigint")
        for j in range(bits):
            out = out + F.when(
                F.col(f"b_{j}") * 2 > F.col("_n"), F.lit(1 << j).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        return tok_col, hash_col, ones, out.alias("simhash")

    tok_col, hash_col, ones, out_col = _cached_exprs(
        ("simhash_fp", content_col, bits), build
    )
    toks = df.select(F.col(id_col), tok_col)
    hashed = toks.select(id_col, hash_col)
    agg = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *ones)
    sig = agg.select(id_col, out_col)
    return (
        df.select(id_col)
        .join(sig, id_col, "left")
        .select(id_col, F.coalesce("simhash", F.lit(0).cast("bigint")).alias("simhash"))
    )


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (native)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    num_blocks: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-dup candidate pairs by SimHash with pigeonhole blocking
    (Manku et al., WWW'07): split the fingerprint into ``num_blocks``
    contiguous bit blocks; any pair within Hamming distance
    ``num_blocks - 1`` must agree exactly on >= 1 block, so an equi-join
    on (block_id, block_key) finds ALL such pairs — no all-pairs product,
    and recall is exact for max_hamming <= num_blocks - 1 (the default).

    Fingerprints come from the scalable DF form (explode -> hash-once ->
    per-bit partial sums). Buckets larger than ``max_bucket_size`` are
    dropped before the self-join (degenerate boilerplate guard — inspect
    with ``bucket_stats``); identical docs belong to exact_dedup.

    As in minhash_lsh_pairs, the guarded blocked frame is persist()ed
    so the fingerprint pipeline is computed once per fill, not once per
    join side (scoped cache: each call swaps the previous frame out;
    placement measured — see there)."""
    if bits % num_blocks != 0:
        raise ValueError(f"bits ({bits}) must be divisible by num_blocks ({num_blocks})")
    width = bits // num_blocks
    mask = (1 << width) - 1
    sh = simhash_fingerprints(df, content_col, id_col, bits).withColumnRenamed("simhash", "sh")
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("block_id"),
                F.shiftright(F.col("sh"), b * width).bitwiseAND(F.lit(mask)).alias("block_key"),
            )
            for b in range(num_blocks)
        ]
    )
    blocked = sh.select(F.col(id_col), "sh", F.explode(blocks).alias("bb")).select(
        id_col, "sh", F.col("bb.block_id").alias("block_id"), F.col("bb.block_key").alias("block_key")
    )
    blocked = _occupancy_guard(blocked, ["block_id", "block_key"], max_bucket_size)
    blocked = _swap_cache("simhash_pairs", blocked)
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    left: DataFrame,
    right: DataFrame | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
    max_docs: int = 2000,
    gate: str = "eager",
) -> DataFrame:
    """Exact n-gram Jaccard scoring.

    The scalable form passes ``candidates`` — an (id_a, id_b) DataFrame
    from a bounded generator (minhash_lsh_pairs / simhash_pairs); each
    candidate pair is scored via two equi-joins on id, linear in the
    candidate count. Without ``candidates`` the theta self-join is
    O(n^2) BY CONSTRUCTION, so it is gated — and the gate is an EAGER
    Spark action at call time: a ``limit(max_docs + 1).count()`` probe
    per distinct side (an early-exit scan that never reads more than
    max_docs + 1 rows, counted once when right defaults to left). The
    call raises above ``max_docs`` rather than silently launching a
    quadratic job on a 100 TB corpus.

    ``gate='off'`` skips the probe (no Spark action at plan-construction
    time) for callers composing lazy plans over inputs they have already
    bounded — the caller owns the O(n^2) risk (ADVICE r3)."""
    if gate not in ("eager", "off"):
        raise ValueError(f"gate must be 'eager' or 'off', got {gate!r}")
    same_side = right is None or right is left
    right = left if same_side else right
    a = left.select(F.col(id_col).alias("id_a"), shingles(content_col, n).alias("g_a"))
    b = right.select(F.col(id_col).alias("id_b"), shingles(content_col, n).alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    score = F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard")
    if candidates is not None:
        return (
            candidates.select("id_a", "id_b")
            .join(a, "id_a")
            .join(b, "id_b")
            .select("id_a", "id_b", score)
            .filter(F.col("jaccard") >= threshold)
        )
    if gate == "eager":
        n_bound = left.limit(max_docs + 1).count()
        if not same_side:
            n_bound = max(n_bound, right.limit(max_docs + 1).count())
        if n_bound > max_docs:
            raise ValueError(
                f"ngram_jaccard_pairs without `candidates` is an O(n^2) self-join; "
                f"side exceeds max_docs={max_docs}. Pass candidate "
                f"pairs from minhash_lsh_pairs/simhash_pairs (or raise max_docs explicitly)."
            )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score)
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    probe_filter: Column | None = None,
    normalized: bool = False,
    max_probe_docs: int = 10_000,
    gate: str = "eager",
) -> DataFrame:
    """Cosine-near-duplicate pairs. ``probe_filter`` restricts the
    broadcast probe side (e.g. a sample) so the pair count stays linear;
    the full-scale path is knn_lsh in operators/retrieval.py.
    ``normalized=True`` skips the norm division (dot == cosine on unit
    vectors).

    The probe side is BROADCAST into a theta join, so an unbounded probe
    is a broadcast nested-loop O(n^2) that OOMs executors at scale. The
    probe side is therefore gated — an EAGER ``limit(max_probe_docs +
    1).count()`` probe at call time (early-exit scan) — and the call
    raises when it exceeds ``max_probe_docs``, whether or not a
    ``probe_filter`` was given. ``gate='off'`` skips the probe for
    callers composing lazy plans over already-bounded probes (ADVICE
    r3); the caller owns the O(n^2) risk. For all-pairs near-dup over a
    large corpus use knn_lsh / minhash_lsh_pairs instead."""
    from ..functions import vectors as V

    if gate not in ("eager", "off"):
        raise ValueError(f"gate must be 'eager' or 'off', got {gate!r}")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    if probe_filter is not None:
        a = df.filter(probe_filter).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    if gate == "eager" and a.limit(max_probe_docs + 1).count() > max_probe_docs:
        raise ValueError(
            f"embedding_neardup_pairs probe side exceeds max_probe_docs="
            f"{max_probe_docs}; it is broadcast into a theta join, so an "
            f"unbounded probe is O(n^2). Pass a tighter probe_filter, raise "
            f"max_probe_docs explicitly, or use knn_lsh for the full corpus."
        )
    # r14: L2 norms attach once per join-side row instead of being
    # re-aggregated per joined pair (bit-identical; cosine_with_norms)
    a = a.withColumn("_na", V.norm("v_a"))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        V.norm(vec_col).alias("_nb"),
    )
    sim = (
        V.dot("v_a", "v_b")
        if normalized
        else V.cosine_with_norms("v_a", "v_b", "_na", "_nb")
    )
    return (
        b.join(F.broadcast(a), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# Edge-count ceiling for the driver-side union-find fast path of
# ``_min_label_propagation``. 100k edges collect to a few MB — the same
# bounded planning-collect discipline as the PQ training sample and the
# probe helpers' bucket-key collects; a dup graph CONTRACTED to
# supernodes (the star/incremental paths) sits orders of magnitude
# below this even at large corpus scale, while a genuinely large edge
# set takes the distributed loop unchanged.
CC_DRIVER_MAX_EDGES = 100_000


def _min_label_propagation(
    pairs: DataFrame, id_a: str, id_b: str, max_iter: int
) -> tuple[DataFrame, bool]:
    """Shared body of ``connected_components``: returns
    ``(labels, converged)`` where ``converged`` is True iff the last
    round changed NOTHING — which is itself the executable fixpoint
    proof (``changed == 0`` means cand(id) == label(id) for every id;
    for any edge (a, b), cand(a) <= label(b), so label(a) <= label(b)
    and symmetrically, i.e. every edge's endpoints already carry the
    same label). Callers that need the convergence CONTRACT
    (``cluster.components_checked``) read the flag instead of paying a
    separate verification join over the caller's edge lineage — the
    r13 form of that check was the measured regression in
    dedup_star_incremental (VERDICT r13 item 2).

    r14 small-graph fast path: the edge frame is materialized
    (localCheckpoint) before the loop anyway, so its count is one cheap
    cached scan — at or below ``CC_DRIVER_MAX_EDGES`` the component
    labels come from a driver-side union-find over the collected edges
    (min id per component — the exact closure min-label propagation
    converges to, so ``converged`` is True by construction; identity
    with the distributed loop is pytest-pinned). The distributed loop
    costs 2 jobs per iteration plus the checkpoint machinery — on the
    KB-scale contracted graphs of the star/incremental paths that was
    most of their job count — while the union-find is one collect plus
    one createDataFrame. Graphs above the ceiling run the distributed
    loop exactly as before."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if edges.count() <= CC_DRIVER_MAX_EDGES:
        return _union_find_components(edges), True
    labels = edges.select("src").union(edges.select("dst")).distinct().select(
        F.col("src").alias("id"), F.col("src").alias("component")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        cand = (
            edges.join(labels, edges.dst == labels.id)
            .select(F.col("src").alias("id"), F.col("component"))
            .union(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            cand.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = cand
        if changed == 0:
            converged = True
            break
    return labels, converged


def _union_find_components(edges: DataFrame) -> DataFrame:
    """Driver-side union-find over a MATERIALIZED, bounded (src, dst)
    edge frame (see ``CC_DRIVER_MAX_EDGES``): returns the same
    ``(id, component = min reachable id)`` frame the distributed
    min-label loop converges to, as the exact closure. Path-compressed,
    min-root union — O(E a(E)) on a few MB of driver memory.

    Null ids are filtered BEFORE the collect (ADVICE r14): the
    distributed min-label loop silently tolerates a null src/dst (the
    equi-join drops it), whereas Python ``<`` on None raises mid-query
    — the filter keeps both paths identical on such rows. The min-root
    choice compares ids with Python ``<``, which matches Spark's
    ordering for the id types in use here (longs and ASCII strings);
    a caller introducing an exotic orderable id type should check that
    Spark's sort order agrees with Python's before relying on the
    min-label contract."""
    rows = edges.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r.src, r.dst
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # min id becomes the root so the final label IS min(component)
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = [(x, find(x)) for x in parent]
    id_type = edges.schema["src"].dataType
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("component", id_type)]
    )
    return edges.sparkSession.createDataFrame(out, schema)


def connected_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 10) -> DataFrame:
    """Min-label propagation over an undirected dup-pair graph: returns
    (id, component) where component = min id reachable. Dup clusters have
    tiny diameter, so this converges in 2-3 joins; each iteration is one
    shuffle on id.

    Each iteration's labels are localCheckpoint()ed (eager): lineage
    stays O(1) across iterations instead of growing a join chain, and
    the convergence check + next join reuse the materialized result
    rather than recomputing the whole history. Edges are cached once —
    they're re-joined every round."""
    labels, _ = _min_label_propagation(pairs, id_a, id_b, max_iter)
    return labels


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """SUBSTRING-level exact dedup — the span analogue of document-level
    exact_dedup, after Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499): find every
    maximal run of tokens that participates in a ``k``-token window
    shared VERBATIM by >= ``min_docs`` distinct documents. Document-
    level dedup keeps one copy of a duplicated page but misses the
    boilerplate paragraph pasted into thousands of otherwise-unique
    pages; this operator finds exactly those runs so a pipeline can
    strip them (``strip_duplicate_spans``) instead of dropping whole
    documents.

    Returns (id_col, span_start, span_end, n_tokens): 0-based INCLUSIVE
    token positions of each merged maximal duplicated run, one row per
    run. Tokens are lowercased whitespace tokens (the corpus-wide
    convention — bm25/minhash use the same split, so span positions
    index the same token array every other operator sees).

    Plan shape, built for 100 TB: the paper's suffix array is a
    single-machine construct; the distributed equivalent is the k-gram
    hash join. ONE posexplode produces (doc, start, gram-hash) — about
    dl rows per doc, the same expansion every shingle operator here
    pays; the duplicated-gram set is ONE groupBy on the 60-bit md5 gram
    hash (uniform key, partial-agg count-distinct) and is semi-joined
    back on that same uniform hash. There is NO pair generation and NO
    self-join anywhere — cost is linear in corpus tokens regardless of
    how many documents share a run (a gram pasted into 10^6 docs is
    one group, not 10^12 pairs), which is precisely why this shape
    replaces the suffix array in map-reduce settings. The final
    interval merge (classic gaps-and-islands: running max of span ends,
    island counter, one groupBy) runs per-document over only the
    matched gram starts — a vanishingly small frame after the filter.
    The md5-based hash is the module's engine-portable base hash, so a
    DuckDB oracle reproduces the span set bit-for-bit (collisions,
    ~5e-10 per gram pair, are identical in both engines by
    construction)."""
    from pyspark.sql.window import Window

    base = docs.select(
        F.col(id_col),
        F.transform(whitespace_tokens(text_col), F.lower).alias("tk"),
    ).filter(F.size("tk") >= k)
    grams = base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - k),
                lambda i: F.concat_ws(" ", F.slice("tk", i + 1, k)),
            )
        ).alias("s", "_g"),
    ).select(id_col, "s", md5_long(F.col("_g")).alias("gh"))
    # both the dup-set groupBy and the probe side read the exploded
    # frame — persist it once (scoped registry, same rationale and
    # release path as the pair generators' banded frames)
    grams = _swap_cache("duplicate_spans", grams)
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gh")
    )
    covered = grams.join(dup, "gh").select(
        id_col, "s", (F.col("s") + F.lit(k - 1)).alias("e")
    )
    win = Window.partitionBy(id_col).orderBy("s")
    prev_end = F.max("e").over(win.rowsBetween(Window.unboundedPreceding, -1))
    flagged = covered.withColumn(
        "_new", F.when(prev_end.isNull() | (F.col("s") > prev_end + 1), 1).otherwise(0)
    ).withColumn("_island", F.sum("_new").over(win))
    return (
        flagged.groupBy(id_col, "_island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove the duplicated runs ``duplicate_spans`` found, keeping the
    rest of each document: rebuilds ``text_col`` from the tokens whose
    0-based position falls inside no span, preserving order. Documents
    with no spans pass through verbatim (token-rejoined); a document
    that is ONE big span comes back empty — the quality_filter stage
    downstream drops empties, mirroring a production strip->filter
    chain.

    Scale shape: spans collapse to ONE small array-of-structs per
    affected document (a handful of (start,end) pairs), joined back in
    a single equi-join on the id; the strip itself is a native
    filter-with-index lambda over the token array — no explode, no
    Python, no second shuffle."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = whitespace_tokens(text_col)
    keep = F.filter(
        F.coalesce(F.col("_tk"), F.array()),
        lambda x, i: ~F.exists(
            F.coalesce(F.col("_spans"), F.array()),
            lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]),
        ),
    )
    return (
        docs.withColumn("_tk", toks)
        .join(per_doc, id_col, "left")
        .withColumn(text_col, F.concat_ws(" ", keep))
        .drop("_tk", "_spans")
    )

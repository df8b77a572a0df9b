"""Bloom-filter benchmark decontamination — the broadcast-bitset form
of the n-gram contamination probe.

The exact decontamination path (harness ``decontaminate``) broadcasts
the benchmark's DISTINCT hashed n-grams and semi-joins the corpus —
already shuffle-free on the corpus side, but the broadcast payload
grows linearly with the benchmark: a full eval-suite union (millions
of 5-grams x 8-byte hashes, plus hash-table overhead) is tens to
hundreds of MB shipped to every executor. A Bloom filter compresses
the same membership question to ``m`` BITS with a false-POSITIVE rate
p ~ (1 - e^(-k*n/m))^k and ZERO false negatives: at 10 bits/element,
one million benchmark grams fit in ~1.2 MB regardless of gram length,
and a contaminated document can never slip through — the only cost is
a bounded overquarantine rate, the right trade for a filter whose
positives are cheap to re-check exactly (or simply dropped, at 100 TB
the usual policy).

Design — relational state, JVM-only probe, no driver collect:

  * ``bloom_positions``: the filter's SET BITS as rows ``(pos)`` —
    k salted portable-md5 hashes per value, distinct. This is the
    STORED form: plain parquet, mergeable by union (Bloom OR is set
    union of positions — day-2 benchmarks append their positions, no
    rebuild), and engine-portable (DuckDB replays every position).
  * ``bloom_pack``: positions -> ONE row holding ``array<long>`` of
    m/64 words — built by a JVM-side bit_or aggregation + a dense
    sequence fill; never collected to the driver. m/64 longs = m/8
    bytes: the broadcast is the bitset itself.
  * ``bloom_probe``: corpus crossJoin(broadcast(packed 1-row)) — a
    broadcast nested loop of ONE row, i.e. a free column attach —
    then per value: forall k positions, bit_get(words[p/64], p%64).
    Scan-local, whole-stage-codegen'd, zero shuffles, zero UDFs.
  * ``bloom_decontaminate``: the per-document verdict — explode
    n-grams scan-locally, probe, count flagged grams per doc (one
    map-side-combinable aggregation — the only exchange in the plan,
    O(docs) rows).
  * ``bloom_fp_audit``: the contract as a frame — per-gram Bloom
    verdict vs the exact broadcast semi-join: ``false_negative`` MUST
    be all-False (hash determinism makes it structural, callers
    RAISE), false positives are counted and bounded.

Probe-side equivalence (packed bit test == positions-set membership)
is pytest-pinned; the DuckDB oracle replays membership through the
positions set, which is the same predicate by construction.

The reference has no decontamination; north-star extension surface
(the training-pipeline step every LLM data team runs before training).
New module (r12): registration closure is exactly its own entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long

DEFAULT_K = 5
DEFAULT_M_BITS = 1 << 16


def _positions(value_col, k: int, m_bits: int, seed: int, hash_family: str = "salted"):
    """Array of the value's k bit positions.

    ``hash_family='salted'`` (default, the stored/oracled form): k
    independent salted portable-md5 hashes (salt = seed*1000 + i,
    disjoint from the CMS family by seed choice), each reduced mod
    m_bits — k full md5 evaluations per value.

    ``hash_family='km'`` (VERDICT r12 item 6): classic Kirsch-
    Mitzenmacher double hashing — TWO salted md5s (salts seed*1000 and
    seed*1000+1) derive all k positions as (h1 + i*step) mod m, which
    preserves the asymptotic false-positive rate of k independent
    hashes (Kirsch & Mitzenmacher 2006) at ~2/k of the hash CPU; at
    corpus scale the gram-hash cost dominates the probe, so k=5 drops
    ~2.5x of it. Both operands reduce mod m BEFORE the multiply-add
    (ANSI overflow discipline — i*h2 on raw 60-bit hashes would
    overflow BIGINT at k=5 on both engines) and the stride is forced
    ODD, hence full-period over the power-of-two m (no degenerate
    step=0 family collapsing k positions to one). The family is as
    oracle-portable as the salted one — same md5 primitive, same
    integer arithmetic — but filters are NOT cross-family compatible:
    positions written by one family must be probed by the same family
    (callers pin hash_family alongside k/m/seed, exactly like the
    other filter parameters)."""
    if hash_family == "km":
        if m_bits < 2 or (m_bits & (m_bits - 1)) != 0:
            # The odd-stride full-period argument needs gcd(step, m)=1,
            # which the *2+1 trick only guarantees when m is a power of
            # two; a composite-odd-factor m would let the k probes
            # collapse into a short cycle and silently inflate the FP
            # rate (ADVICE r13). Fail loudly instead.
            raise ValueError(
                f"hash_family='km' requires power-of-two m_bits >= 2, got {m_bits}"
            )
        h1 = md5_long(value_col.cast("string"), F.lit(str(seed * 1000))) % m_bits
        step = (
            md5_long(value_col.cast("string"), F.lit(str(seed * 1000 + 1)))
            % (m_bits // 2)
        ) * 2 + 1
        return F.array(*[(h1 + F.lit(i) * step) % m_bits for i in range(k)])
    if hash_family != "salted":
        raise ValueError(f"unknown hash_family {hash_family!r} (salted|km)")
    return F.array(
        *[
            md5_long(value_col.cast("string"), F.lit(str(seed * 1000 + i)))
            % m_bits
            for i in range(k)
        ]
    )


def bloom_positions(
    df: DataFrame,
    value_col: str = "gh",
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    seed: int = 77,
    hash_family: str = "salted",
) -> DataFrame:
    """The filter's set bits as distinct ``(pos)`` rows — the stored,
    mergeable, engine-portable form (union of position tables IS the
    Bloom union). One scan-local explode + one distinct."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.explode(
                _positions(F.col(value_col), k, m_bits, seed, hash_family)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_pack(positions: DataFrame, m_bits: int = DEFAULT_M_BITS) -> DataFrame:
    """ONE row ``(bits: array<long>)`` of m_bits/64 words, built
    entirely executor/JVM-side: per-word bit_or of the set positions,
    collected to a word->bits map in a single-row aggregation, then
    densified over a literal sequence (absent words = 0). The array is
    m_bits/8 bytes — the object later broadcast by the probe."""
    n_words = (m_bits + 63) // 64
    words = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            # the SQL shiftleft accepts a COLUMN shift amount (the
            # Python wrapper insists on an int literal, hence expr)
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
    )
    dense = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.try_element_at("m", i.cast("int")),
                F.lit(0).cast("bigint"),
            ),
        ).alias("bits")
    )
    return dense


def bloom_probe(
    df: DataFrame,
    value_col: str,
    packed: DataFrame,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    seed: int = 77,
    flag_col: str = "maybe_member",
    hash_family: str = "salted",
) -> DataFrame:
    """Attach ``flag_col`` to every row: True iff ALL k bit positions
    of ``value_col`` are set. The packed 1-row frame joins as a
    broadcast nested loop (a free column attach); the bit test is
    element_at + bit_get — O(1) per position, codegen'd, no shuffle of
    ``df`` at any size."""
    probe = F.forall(
        _positions(F.col(value_col), k, m_bits, seed, hash_family),
        lambda p: F.bit_get(
            F.coalesce(
                F.try_element_at("bits", (p / 64).cast("int") + 1),
                F.lit(0).cast("bigint"),
            ),
            (p % 64).cast("int"),
        )
        == 1,
    )
    return df.crossJoin(F.broadcast(packed)).withColumn(flag_col, probe).drop("bits")


def bloom_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    seed: int = 77,
    hash_family: str = "salted",
) -> DataFrame:
    """Per-corpus-document contamination verdict against a benchmark
    set: ``(id, n_flagged, contaminated)`` where a gram flags iff the
    Bloom filter of the benchmark's hashed word n-grams claims it.
    NO FALSE NEGATIVES: a document sharing any n-gram with the
    benchmark is always flagged (same deterministic hash family both
    sides); overquarantine is the bounded Bloom false-positive rate.

    Plan shape: benchmark grams -> positions -> packed bits (one
    KB/MB-scale broadcast); corpus grams explode scan-locally, probe
    without shuffling, and the only exchange is the O(docs) per-doc
    count. The document spine left-joins the flagged counts so
    gram-free documents still get a verdict."""
    from .dedup import shingles

    bench_grams = bench.select(
        F.explode(shingles(text_col, n)).alias("_g")
    ).select(md5_long(F.col("_g")).alias("gh"))
    packed = bloom_pack(
        bloom_positions(bench_grams, "gh", k, m_bits, seed, hash_family), m_bits
    )
    return bloom_decontaminate_packed(
        corpus, packed, text_col, id_col, n, k, m_bits, seed, hash_family
    )


def bloom_decontaminate_packed(
    corpus: DataFrame,
    packed: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    seed: int = 77,
    hash_family: str = "salted",
) -> DataFrame:
    """The per-document verdict against an ALREADY-PACKED filter — the
    stored-filter day-2 shape: ``read_bloom_store -> bloom_pack`` hands
    the accumulated suites' bitset here and the corpus is scored
    against every suite ever appended without rebuilding anything.
    ``bloom_decontaminate`` is exactly pack-from-bench + this. The
    filter parameters (k, m_bits, seed, hash_family) must match the
    writers' — same caller contract as any Bloom probe."""
    from .dedup import shingles

    corpus_grams = corpus.select(
        id_col, F.explode(shingles(text_col, n)).alias("_g")
    ).select(id_col, md5_long(F.col("_g")).alias("gh"))
    flagged = (
        bloom_probe(corpus_grams, "gh", packed, k, m_bits, seed,
                    hash_family=hash_family)
        .filter(F.col("maybe_member"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_flagged"))
    )
    return (
        corpus.select(id_col)
        .join(flagged, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_flagged", F.lit(0)).cast("bigint").alias("n_flagged"),
            (F.coalesce("n_flagged", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def write_bloom_store(positions: DataFrame, path: str) -> None:
    """Append a benchmark suite's set-bit positions to a stored Bloom
    filter. Append-mode is CORRECT here without any batch keying —
    the exact opposite of the CMS store's discipline — because the
    Bloom state is a SET: replayed or duplicated appends change
    nothing after the read-side distinct (union is idempotent), and a
    torn write can only lose rows it would re-append on retry, never
    corrupt counts. Day-2 suites therefore just append their
    positions; no compaction is ever required for correctness (a
    periodic distinct-rewrite is purely a size optimization)."""
    positions.write.mode("append").parquet(path)


def read_bloom_store(spark, path: str) -> DataFrame:
    """The stored filter's distinct positions — feed to ``bloom_pack``
    for probing. O(set bits) rows regardless of how many suites (or
    retried appends) landed."""
    return spark.read.parquet(path).select("pos").distinct()


def bloom_flag_docs(
    docs: DataFrame,
    packed: DataFrame,
    text_col: str = "text",
    n: int = 5,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    seed: int = 77,
    flag_col: str = "contaminated",
    hash_family: str = "salted",
) -> DataFrame:
    """STATELESS per-document contamination flag: EXISTS over the
    document's shingle array, each gram tested against the attached
    bitset by the same forall/bit_get probe — no explode, no
    aggregation, no state of any kind, so the identical expression
    runs over a BATCH frame or a Structured Streaming micro-batch
    (stream-static broadcast of the 1-row bitset; append mode, no
    watermark needed). This is the streaming ingest gate: quarantine
    contaminated documents at arrival, before they reach the corpus
    store — batch/stream parity is pytest-pinned. Verdict-only (the
    per-gram count needs the exploded aggregation in
    ``bloom_decontaminate``); same no-false-negative contract."""
    from .dedup import shingles

    def gram_hits(g):
        return F.forall(
            _positions(md5_long(g), k, m_bits, seed, hash_family),
            lambda p: F.bit_get(
                F.coalesce(
                    F.try_element_at("bits", (p / 64).cast("int") + 1),
                    F.lit(0).cast("bigint"),
                ),
                (p % 64).cast("int"),
            )
            == 1,
        )

    return (
        docs.crossJoin(F.broadcast(packed))
        .withColumn(flag_col, F.exists(shingles(text_col, n), gram_hits))
        .drop("bits")
    )


def bloom_fp_audit(
    corpus_grams: DataFrame,
    bench_grams: DataFrame,
    value_col: str = "gh",
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
    seed: int = 77,
    hash_family: str = "salted",
) -> DataFrame:
    """The Bloom contract as an auditable per-gram frame: Bloom verdict
    vs exact membership (broadcast semi-join twin), with
    ``false_negative`` (MUST be all-False — a True row is a bug, not
    noise; callers RAISE) and ``false_positive`` (counted, bounded by
    the (1-e^(-kn/m))^k rate; a fixture sized well under capacity
    asserts a generous ceiling)."""
    packed = bloom_pack(
        bloom_positions(bench_grams, value_col, k, m_bits, seed, hash_family),
        m_bits,
    )
    exact = bench_grams.select(F.col(value_col).alias("_x")).distinct()
    probed = bloom_probe(
        corpus_grams.select(value_col).distinct(), value_col, packed,
        k, m_bits, seed, hash_family=hash_family,
    )
    j = probed.join(
        F.broadcast(exact), F.col(value_col) == F.col("_x"), "left"
    )
    return j.select(
        value_col,
        "maybe_member",
        F.col("_x").isNotNull().alias("in_bench"),
        (F.col("_x").isNotNull() & ~F.col("maybe_member")).alias("false_negative"),
        (~F.col("_x").isNotNull() & F.col("maybe_member")).alias("false_positive"),
    )

"""Bloom-filter decontamination pins (operators/bloom.py — r12): the
structural no-false-negative guarantee, packed-bitset == positions-set
probe equivalence, position-union mergeability (the day-2 append
contract), a bounded false-positive rate on a deliberately loaded
filter, and the per-document verdict against planted contamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    bloom as BL,
)


@pytest.fixture(scope="module")
def grams(spark):
    # 3000 distinct corpus "gram hashes", first 400 of which are the
    # benchmark set
    all_g = spark.range(3000).select(
        (F.col("id") * 2654435761 % 1000000007).alias("gh")
    )
    return all_g


def test_no_false_negatives_structural(spark, grams):
    bench = grams.filter(F.col("gh") % 7 == 0)
    audit = BL.bloom_fp_audit(grams, bench, m_bits=1 << 14)
    assert audit.filter("false_negative").count() == 0
    # every bench gram present in the probe set is claimed
    claimed = audit.filter("in_bench").count()
    assert claimed == audit.filter("in_bench AND maybe_member").count()


def test_packed_probe_equals_position_set_membership(spark, grams):
    """The packed array<long> bit test must agree with direct
    membership of every one of the k positions in the positions
    table — the equivalence that lets the oracle replay membership
    while Spark ships the bitset."""
    k, m = 5, 1 << 12
    bench = grams.filter(F.col("gh") % 11 == 0)
    pos = BL.bloom_positions(bench, "gh", k, m)
    packed = BL.bloom_pack(pos, m)
    probed = BL.bloom_probe(grams, "gh", packed, k, m).select("gh", "maybe_member")
    # reference semantics: explode each probe's k positions, all must
    # be present in the positions table
    ref = (
        grams.select(
            "gh", F.explode(BL._positions(F.col("gh"), k, m, 77)).alias("pos")
        )
        .join(pos.withColumn("_hit", F.lit(1)), "pos", "left")
        .groupBy("gh")
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("_hit", F.lit(0)))).alias("ref"))
    )
    diff = (
        probed.join(ref, "gh")
        .filter(F.col("maybe_member") != F.col("ref"))
        .count()
    )
    assert diff == 0


def test_position_union_is_bloom_union(spark, grams):
    a = grams.filter(F.col("gh") % 2 == 0)
    b = grams.filter(F.col("gh") % 2 == 1)
    merged = (
        BL.bloom_positions(a, "gh").unionByName(BL.bloom_positions(b, "gh")).distinct()
    )
    direct = BL.bloom_positions(grams, "gh")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_fp_rate_bounded_on_loaded_filter(spark, grams):
    """m=2^12 with ~270 bench grams x k=5 gives a measurably loaded
    filter; false positives must appear bounded (well under the
    asymptotic (fill)^k plus slack), never a false negative."""
    bench = grams.filter(F.col("gh") % 11 == 0)
    audit = BL.bloom_fp_audit(grams, bench, m_bits=1 << 12)
    rows = audit.count()
    fn = audit.filter("false_negative").count()
    fp = audit.filter("false_positive").count()
    assert fn == 0
    assert 0 <= fp < rows * 0.10, fp


def test_document_verdict_catches_planted_contamination(spark):
    bench = spark.createDataFrame(
        [(0, "the held out benchmark question about ancient rome empire")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words then the held out benchmark question about ancient rome empire and a suffix"),
            (11, "entirely unrelated content with completely different tokens and nothing shared at all here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in BL.bloom_decontaminate(corpus, bench).collect()}
    assert out[10].contaminated and out[10].n_flagged > 0
    assert not out[11].contaminated and out[11].n_flagged == 0


def test_store_append_is_idempotent_and_merges_suites(spark, grams, tmp_path):
    """Two benchmark suites append their positions; a REPLAYED append
    (the crash-retry shape) must change nothing — Bloom state is a
    set, so union idempotence makes blind appends safe, the exact
    opposite of the CMS store's batch-keying requirement. The stored
    filter must equal the filter built over the suite union."""
    path = str(tmp_path / "bloom_store")
    suite_a = grams.filter(F.col("gh") % 3 == 0)
    suite_b = grams.filter(F.col("gh") % 3 == 1)
    pa = BL.bloom_positions(suite_a, "gh")
    pb = BL.bloom_positions(suite_b, "gh")
    BL.write_bloom_store(pa, path)
    BL.write_bloom_store(pb, path)
    BL.write_bloom_store(pb, path)  # replayed append: harmless
    stored = BL.read_bloom_store(spark, path)
    direct = BL.bloom_positions(
        suite_a.unionByName(suite_b), "gh"
    )
    assert stored.exceptAll(direct).count() == 0
    assert direct.exceptAll(stored).count() == 0


def test_km_family_no_false_negatives_and_bounded_fp(spark, grams):
    """VERDICT r12 item 6: the Kirsch-Mitzenmacher double-hash family
    (two md5s -> k positions as (h1 + i*step) mod m) keeps the same
    contracts as the k-independent-salt family — structurally ZERO
    false negatives (determinism, both sides same family) and a
    bounded false-positive rate at the same load — at ~2/k the hash
    CPU. Same fixture/load as the salted-family FP pin so the two
    bounds are comparable."""
    bench = grams.filter(F.col("gh") % 7 == 0)
    audit = BL.bloom_fp_audit(grams, bench, m_bits=1 << 14, hash_family="km")
    assert audit.filter("false_negative").count() == 0
    claimed = audit.filter("in_bench").count()
    assert claimed == audit.filter("in_bench AND maybe_member").count()
    # ~429 bench grams in 16384 bits at k=5 -> theoretical fp ~ 1e-4;
    # the salted-family pin allows a generous 2% ceiling — hold the KM
    # family to the SAME ceiling (its asymptotic rate matches)
    n_neg = audit.filter("NOT in_bench").count()
    n_fp = audit.filter("false_positive").count()
    assert n_fp / max(n_neg, 1) < 0.02, (n_fp, n_neg)


def test_km_positions_distinct_and_in_range(spark):
    """The KM stride is forced odd (full period over power-of-two m):
    a value's k positions are k DISTINCT in-range bits — no degenerate
    step collapsing the family to fewer probes than k."""
    df = spark.range(500).select(F.col("id").alias("gh"))
    pos = df.select(
        BL._positions(F.col("gh"), 5, 1 << 14, 77, "km").alias("ps")
    )
    bad = pos.filter(
        (F.array_size(F.array_distinct("ps")) != 5)
        | F.exists("ps", lambda p: (p < 0) | (p >= (1 << 14)))
    ).count()
    assert bad == 0


def test_km_and_salted_filters_are_independent_parameterizations(spark, grams):
    """Cross-family probing is a CALLER error (the docstring contract):
    the same bench set packed under 'salted' and probed under 'km'
    must NOT be relied on — pin that the two families genuinely differ
    (some gram's position sets diverge), so the contract is real."""
    bench = grams.filter(F.col("gh") % 7 == 0).limit(50)
    a = BL.bloom_positions(bench, "gh", hash_family="salted")
    b = BL.bloom_positions(bench, "gh", hash_family="km")
    assert a.exceptAll(b).count() > 0


def test_km_family_rejects_non_power_of_two_m_bits(spark, grams):
    """ADVICE r13: the KM odd-stride full-period argument needs
    gcd(step, m) = 1, which *2+1 only guarantees for power-of-two m —
    a composite-odd-factor m (e.g. 15) could collapse the k probe
    positions into a short cycle and silently inflate the FP rate. The
    precondition is now a raised error, not a docstring."""
    for bad_m in (15, 1, 0, 3 << 10):
        with pytest.raises(ValueError, match="power-of-two"):
            BL.bloom_positions(
                grams, "gh", m_bits=bad_m, hash_family="km"
            ).count()
    # power-of-two m stays accepted
    assert (
        BL.bloom_positions(grams, "gh", m_bits=1 << 10, hash_family="km")
        .count()
        > 0
    )

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

"""Dedup operator tests: exact, minhash, simhash, jaccard, components."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import dedup as DD

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (3, "completely different content about spark query engines at scale"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups(spark):
    out = DD.exact_dedup(_docs(spark)).collect()
    by_keeper = {r.keeper_id: r.n_dups for r in out}
    assert by_keeper[0] == 2  # docs 0,1 collapse
    assert by_keeper[2] == 1 and by_keeper[3] == 1


def test_minhash_identical_docs_identical_sigs(spark):
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in _docs(spark)
        .select("doc_id", DD.minhash_signature(DD.shingles("text"), 16, 42).alias("sig"))
        .collect()
    }
    assert sigs[0] == sigs[1]
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 16
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 16
    assert agree_near > agree_far
    assert all(0 <= v < (1 << 31) for v in sigs[0])


def test_minhash_lsh_finds_dup_pair(spark):
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in DD.minhash_lsh_pairs(_docs(spark)).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert all(a < b for a, b in pairs)


def test_simhash_hamming(spark):
    sh = {
        r.doc_id: r.sh
        for r in _docs(spark).select("doc_id", DD.simhash("text", 32).alias("sh")).collect()
    }
    assert sh[0] == sh[1]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[0], sh[2]) < ham(sh[0], sh[3])
    assert all(0 <= v < (1 << 32) for v in sh.values())


def test_ngram_jaccard_pairs(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard for r in DD.ngram_jaccard_pairs(_docs(spark), n=3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.0 < pairs[(0, 2)] < 1.0
    assert pairs[(0, 3)] == 0.0


def test_connected_components_collapses_cluster(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r.id: r.component for r in DD.connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_embedding_neardup_threshold(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.04]), (3, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    pairs = DD.embedding_neardup_pairs(df, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_simhash_pairs_pigeonhole_blocking(spark):
    pairs = {
        (r.id_a, r.id_b): r.hamming for r in DD.simhash_pairs(_docs(spark)).collect()
    }
    assert pairs[(0, 1)] == 0  # identical docs: distance 0, found via every block
    assert all(h <= 3 for h in pairs.values())
    assert all(a < b for a, b in pairs)


def test_lsh_giant_bucket_guard_degenerate_corpus(spark):
    """Thousands of identical docs -> one degenerate bucket. The guard
    must drop it (no quadratic pair blowup) while distinct documents
    still pair up; bucket_stats flags what was dropped."""
    boiler = [(i, "identical boilerplate text repeated across the whole corpus") for i in range(3000)]
    distinct = [
        (100000, "the quick brown fox jumps over the lazy dog again and again"),
        (100001, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(boiler + distinct, ["doc_id", "text"])

    pairs = DD.minhash_lsh_pairs(df, max_bucket_size=1000).collect()
    ids = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert not (ids & set(range(3000)))  # boilerplate bucket dropped, not exploded
    assert {(r.id_a, r.id_b) for r in pairs} == {(100000, 100001)}

    sh_pairs = DD.simhash_pairs(df, max_bucket_size=1000).collect()
    assert {(r.id_a, r.id_b) for r in sh_pairs} == {(100000, 100001)}

    # observability: the dropped buckets are visible with their sizes
    from rag_project_with_embeddings_and_vector_database_spark.operators.dedup import (
        _P,
        bucket_stats,
        minhash_bands,
        minhash_signatures,
    )

    sig = minhash_signatures(df, num_perm=16, seed=42)
    banded = sig.select(
        "doc_id", F.explode(minhash_bands("sig", 4, 4)).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_hash")
    stats = bucket_stats(banded, ["band", "band_hash"], 1000)
    dropped = stats.filter("dropped").collect()
    assert dropped and all(r.n_members == 3000 for r in dropped)


def test_ngram_jaccard_pairs_requires_candidates_at_scale(spark):
    import pytest

    big = spark.range(3000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc text "), F.col("id")).alias("text")
    )
    with pytest.raises(ValueError, match="candidates"):
        DD.ngram_jaccard_pairs(big)

    # candidate-pairs path: linear scoring joins, no theta join
    cand = spark.createDataFrame([(0, 1), (0, 3)], ["id_a", "id_b"])
    scored = {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(_docs(spark), candidates=cand).collect()
    }
    assert scored[(0, 1)] == 1.0 and scored[(0, 3)] == 0.0


def test_simhash_fingerprints_keeps_tokenless_docs(spark):
    df = spark.createDataFrame([(1, "real words here"), (2, "   ")], ["doc_id", "text"])
    out = {r.doc_id: r.simhash for r in DD.simhash_fingerprints(df).collect()}
    assert set(out) == {1, 2}
    assert out[2] == 0
    # column form agrees
    col = {
        r.doc_id: r.sh
        for r in df.select("doc_id", DD.simhash("text", 32).alias("sh")).collect()
    }
    assert col == out


def test_verify_pairs_exact_jaccard_hand_computed(spark):
    # doc 1: tokens a b c d  -> shingles {a b c, b c d}
    # doc 2: tokens a b c d e -> shingles {a b c, b c d, c d e}
    # doc 3: tokens x y z     -> shingles {x y z}
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e"), (3, "x y z")], ["doc_id", "text"]
    )
    cand = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.9)], ["id_a", "id_b", "est_jaccard"]
    )
    out = {
        (r.id_a, r.id_b): r.exact_jaccard
        for r in DD.verify_pairs_exact_jaccard(
            df, cand, verify_threshold=0.1
        ).collect()
    }
    # |{abc,bcd} ∩ {abc,bcd,cde}| = 2, union = 3
    assert out == {(1, 2): round(2 / 3, 6)}
    # zero-overlap candidate (1,3) dropped by the intersection join


def test_verify_pairs_exact_jaccard_threshold_filters(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e")], ["doc_id", "text"]
    )
    cand = spark.createDataFrame([(1, 2, 0.9)], ["id_a", "id_b", "est_jaccard"])
    assert DD.verify_pairs_exact_jaccard(df, cand, verify_threshold=0.7).count() == 0
    assert DD.verify_pairs_exact_jaccard(df, cand, verify_threshold=0.6).count() == 1


def test_verify_pairs_rejects_nonpositive_threshold(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    cand = spark.createDataFrame([(1, 1, 1.0)], ["id_a", "id_b", "est_jaccard"])
    with pytest.raises(ValueError, match="verify_threshold"):
        DD.verify_pairs_exact_jaccard(df, cand, verify_threshold=0.0)


def test_dedup_full_verification_kills_partial_overlap_mutants(spark, sf_dir):
    """The dedup_full planted mutants (60% token prefix + junk tail,
    true Jaccard < 0.5) must band-collide and pass the 0.25 estimate
    floor — making the exact-Jaccard verification stage load-bearing —
    and verification must kill (nearly) all of them while keeping the
    true near-duplicate copies."""
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    planted = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.lit("copy "), F.col("text")).alias("text"),
    )
    tk = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    k = F.greatest(F.floor(F.size(tk) * 3 / 5), F.lit(1)).cast("int")
    junk = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.concat(
                F.lit("junk"), F.col("doc_id").cast("string"), F.lit("x"), i.cast("string")
            ),
        ),
    )
    mutants = base.select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat_ws(" ", F.concat_ws(" ", F.slice(tk, F.lit(1), k)), junk).alias("text"),
    )
    corpus = base.unionByName(planted).unionByName(mutants)
    cand = DD.minhash_lsh_pairs(corpus, num_perm=16, num_bands=8, seed=42).filter(
        F.col("est_jaccard") >= 0.25
    )
    verified = DD.verify_pairs_exact_jaccard(corpus, cand, verify_threshold=0.5)
    is_mut = lambda r: r.id_a >= 2000 or r.id_b >= 2000
    mut_cand = [r for r in cand.collect() if is_mut(r)]
    mut_ver = [r for r in verified.collect() if is_mut(r)]
    assert len(mut_cand) >= 5, "mutants no longer band-collide; verification untested"
    assert len(mut_ver) < len(mut_cand) / 4, (mut_ver, len(mut_cand))
    # true copies still collapse: every (i, i+1000) pair verified
    copy_pairs = {(r.id_a, r.id_b) for r in verified.collect()}
    base_ids = [r.doc_id for r in base.select("doc_id").collect()]
    missing = [i for i in base_ids if (i, i + 1000) not in copy_pairs]
    assert not missing, f"copy pairs lost by verification: {missing}"


def test_verify_pairs_containment_subset_document(spark):
    # doc 2's shingles are a superset of doc 1's: low-ish Jaccard,
    # containment exactly 1.0
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e f g h")], ["doc_id", "text"]
    )
    cand = spark.createDataFrame([(1, 2, 0.9)], ["id_a", "id_b", "est_jaccard"])
    # jaccard = 2/6 -> fails the 0.5 gate without a containment gate
    assert DD.verify_pairs_exact_jaccard(df, cand, verify_threshold=0.5).count() == 0
    kept = DD.verify_pairs_exact_jaccard(
        df, cand, verify_threshold=0.5, containment_threshold=0.95
    ).collect()
    assert len(kept) == 1
    assert kept[0].containment == 1.0
    assert kept[0].exact_jaccard == round(2 / 6, 6)


def test_verify_pairs_containment_threshold_guard(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    cand = spark.createDataFrame([(1, 1, 1.0)], ["id_a", "id_b", "est_jaccard"])
    with pytest.raises(ValueError, match="containment_threshold"):
        DD.verify_pairs_exact_jaccard(
            df, cand, verify_threshold=0.5, containment_threshold=0.0
        )


def _brute_shingles(text, n=3):
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return {""}
    return {
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)
    }


def test_verify_pairs_matches_bruteforce_on_crafted_corpus(spark):
    """Exact Jaccard + containment from the distributed intersection
    join must equal a driver-side brute force over the same shingle
    definition, including short-document truncated-gram semantics."""
    docs = [
        (0, "a b c d e f"),
        (1, "a b c d e f"),          # exact dup
        (2, "a b c d"),              # prefix subset
        (3, "x y"),                  # short doc (one truncated gram)
        (4, "x y"),                  # short dup
        (5, "c d e f g h i"),        # partial overlap
        (6, "q"),                    # single token
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cand = spark.createDataFrame(
        [(a, b, 1.0) for a in range(7) for b in range(a + 1, 7)],
        ["id_a", "id_b", "est_jaccard"],
    )
    out = {
        (r.id_a, r.id_b): (r.exact_jaccard, r.containment)
        for r in DD.verify_pairs_exact_jaccard(
            df, cand, verify_threshold=1e-6
        ).collect()
    }
    texts = dict(docs)
    for a in range(7):
        for b in range(a + 1, 7):
            sa, sb = _brute_shingles(texts[a]), _brute_shingles(texts[b])
            inter = len(sa & sb)
            if inter == 0:
                assert (a, b) not in out
                continue
            jac = round(inter / max(len(sa | sb), 1), 6)
            cont = round(inter / max(min(len(sa), len(sb)), 1), 6)
            assert out[(a, b)] == (jac, cont), (a, b, out.get((a, b)), jac, cont)

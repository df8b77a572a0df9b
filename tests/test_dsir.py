"""DSIR importance-resampling pins (operators/dsir.py, after Xie et
al. NeurIPS 2023): feature-space shape, model normalization, weight
direction (target-like docs score above off-distribution docs),
Gumbel-top-k determinism and partitioning-invariance, and end-to-end
selection of a planted target-aligned document."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    dsir as DS,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta"),
        (2, "zork"),
        (3, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_feature_count_is_2n_minus_1(spark, tiny):
    """n whitespace tokens -> n unigrams + (n-1) bigrams; an empty doc
    contributes no feature rows at all."""
    feat = DS.hashed_ngram_features(tiny)
    got = {
        r["doc_id"]: r["n"]
        for r in feat.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {0: 7, 1: 3, 2: 1}


def test_fit_hashed_lm_normalizes(spark, tiny):
    """Observed-bucket probs plus (num_buckets - observed) copies of
    the default must sum to ~1 (exact up to micro-unit rounding)."""
    B = 512
    feat = DS.hashed_ngram_features(tiny, num_buckets=B)
    model, default = DS.fit_hashed_lm(feat, num_buckets=B, alpha=0.5)
    lpms = [r["lpm"] for r in model.collect()]
    d = default.first()["lpm_def"]
    mass = sum(math.exp(v / DS.MICRO) for v in lpms)
    mass += (B - len(lpms)) * math.exp(d / DS.MICRO)
    assert abs(mass - 1.0) < 1e-3


def test_empty_corpus_fit_is_uniform(spark, tiny):
    """An empty corpus must degrade to the exact uniform model
    (lpm_def = ln(1/num_buckets) in micro-units), never a NULL
    default."""
    B = 512
    empty = tiny.filter(F.lit(False))
    model, default = DS.fit_hashed_lm(
        DS.hashed_ngram_features(empty, num_buckets=B),
        num_buckets=B,
        cache_key="t_dsir_empty",
    )
    assert model.count() == 0
    d = default.first()["lpm_def"]
    assert d == round(math.log(1.0 / B) * DS.MICRO)


def test_weights_rank_target_like_docs_first(spark):
    """A document made of target-corpus tokens must out-weigh a
    document of tokens the target has never seen."""
    target = spark.range(1).select(
        F.lit(100).alias("doc_id"), F.lit("spark catalyst tungsten").alias("text")
    )
    raw = spark.createDataFrame(
        [(0, "spark catalyst tungsten"), (1, "qux zot frobnicate")],
        ["doc_id", "text"],
    )
    ft = DS.hashed_ngram_features(target)
    fr = DS.hashed_ngram_features(raw)
    tm, td = DS.fit_hashed_lm(ft, cache_key="t_dsir_t")
    rm, rd = DS.fit_hashed_lm(fr, cache_key="t_dsir_r")
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in DS.dsir_logweights(fr, tm, td, rm, rd).collect()
    }
    assert w[0] > w[1]


def test_gumbel_topk_deterministic_and_partition_invariant(spark, tiny):
    """The Gumbel key derives from the row's permanent hash position:
    the selected set must be identical across reruns AND across
    physical repartitionings, and contain exactly k distinct ids."""
    scored = tiny.select("doc_id", F.lit(0).cast("bigint").alias("logw_micro"))
    a = sorted(r["doc_id"] for r in DS.gumbel_topk(scored, 2).collect())
    b = sorted(r["doc_id"] for r in DS.gumbel_topk(scored.repartition(3), 2).collect())
    assert a == b and len(set(a)) == 2


def test_gumbel_topk_is_shift_invariant(spark, tiny):
    """key = w + g, so adding a constant to every weight shifts every
    key equally and must not change the selected set — pins that the
    noise is keyed to the ROW, not to the weight value."""
    base = tiny.select("doc_id", (F.col("doc_id") * 1000).cast("bigint").alias("logw_micro"))
    shifted = base.withColumn("logw_micro", F.col("logw_micro") + F.lit(7_000_000))
    a = sorted(r["doc_id"] for r in DS.gumbel_topk(base, 2).collect())
    b = sorted(r["doc_id"] for r in DS.gumbel_topk(shifted, 2).collect())
    assert a == b


def test_dsir_plan_shape(spark, tiny):
    """The selection must compile to TakeOrderedAndProject (per-
    partition heaps + driver merge of k — never a global sort
    shuffle), the model/default joins must broadcast, and nothing may
    plan a SortMergeJoin."""
    target = tiny.filter(F.col("doc_id") < 2)
    sel = DS.dsir_select(tiny, target, k=2)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_select_picks_planted_target_aligned_doc(spark):
    """End to end: among 30 junk docs, the one raw document written in
    the target's vocabulary accumulates a log-weight far beyond the
    Gumbel noise envelope (~ +/-15 nats) and must be selected."""
    tvocab = "alpha beta gamma delta epsilon zeta eta theta " * 4
    target = spark.range(5).select(
        (F.col("id") + 1000).alias("doc_id"), F.lit(tvocab.strip()).alias("text")
    )
    junk = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("junk"), F.col("id").cast("string"), F.lit(" filler noise")).alias("text"),
    )
    planted = spark.range(1).select(
        F.lit(999).alias("doc_id"), F.lit(tvocab.strip()).alias("text")
    )
    raw = junk.unionByName(planted)
    sel = DS.dsir_select(raw, target, k=3)
    assert sel.count() == 3
    assert 999 in {r["doc_id"] for r in sel.collect()}


def test_stored_model_scores_bit_identical(spark, tmp_path):
    """Day-2 DSIR (r11): fit once, write the model table, score a new
    batch against the STORED integers — logw_micro must be BIT-EQUAL
    to what a direct in-session fit assigns (exact BIGINT lpm through
    the parquet round-trip), so day-1 selection thresholds transfer
    unchanged."""
    target = spark.createDataFrame(
        [(100, "spark catalyst tungsten shuffle")], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [(0, "spark catalyst tungsten"), (1, "qux zot frobnicate"),
         (2, "spark qux mixed bag")],
        ["doc_id", "text"],
    )
    ft = DS.hashed_ngram_features(target)
    fr = DS.hashed_ngram_features(raw)
    tm, td = DS.fit_hashed_lm(ft, cache_key="t_dsir_st_t")
    rm, rd = DS.fit_hashed_lm(fr, cache_key="t_dsir_st_r")
    direct = {
        r["doc_id"]: (r["logw_micro"], r["n_grams"])
        for r in DS.dsir_logweights(fr, tm, td, rm, rd).collect()
    }
    p = str(tmp_path / "dsir_model")
    DS.write_dsir_model(tm, td, rm, rd, p)
    new_batch = raw.unionByName(
        spark.createDataFrame([(9, "spark catalyst fresh")], ["doc_id", "text"])
    )
    stored = {
        r["doc_id"]: (r["logw_micro"], r["n_grams"])
        for r in DS.dsir_score_incremental(new_batch, spark, p).collect()
    }
    for k, v in direct.items():
        assert stored[k] == v, k
    assert 9 in stored  # unseen day-2 doc scored without any re-fit


def test_bisection_stage_plan_shapes(spark, tiny):
    """The bisection stages must keep dsir's physical contract: model
    joins and the Gumbel table lookup broadcast (never a
    SortMergeJoin), and gumbel_terms' only join input is the KB-scale
    table."""
    target = tiny.filter(F.col("doc_id") < 2)
    ft = DS.hashed_ngram_features(target)
    fr = DS.hashed_ngram_features(tiny)
    tm, td = DS.fit_hashed_lm(ft, cache_key="t_dsir_plan_t")
    rm, rd = DS.fit_hashed_lm(fr, cache_key="t_dsir_plan_r")
    scored = DS.dsir_logweights(fr, tm, td, rm, rd)
    p1 = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p1 and "SortMergeJoin" not in p1
    keyed = DS.gumbel_keys(scored)
    p2 = keyed._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p2
    p3 = DS.gumbel_terms(tiny)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p3 and "SortMergeJoin" not in p3


def test_stored_model_records_and_enforces_fit_params(spark, tmp_path):
    """r11 ADVICE (dsir.py): the stored model records the fit's
    featurization parameters; day-2 scoring derives them from the
    store, and a caller-supplied value that contradicts the store
    RAISES instead of silently scoring in a misaligned hash space."""
    docs = spark.createDataFrame(
        [(0, "spark catalyst"), (1, "qux zot")], ["doc_id", "text"]
    )
    ft = DS.hashed_ngram_features(docs, num_buckets=512, seed=3)
    tm, td = DS.fit_hashed_lm(ft, num_buckets=512, cache_key="t_dsir_meta_t")
    rm, rd = DS.fit_hashed_lm(ft, num_buckets=512, cache_key="t_dsir_meta_r")
    p = str(tmp_path / "m")
    DS.write_dsir_model(tm, td, rm, rd, p, num_buckets=512, seed=3)
    assert DS.read_dsir_model_params(spark, p) == (512, 3)
    # derived params: scoring works with NO caller featurization args
    assert DS.dsir_score_incremental(docs, spark, p).count() == 2
    with pytest.raises(ValueError, match="contradicts"):
        DS.dsir_score_incremental(docs, spark, p, num_buckets=8192)
    with pytest.raises(ValueError, match="contradicts"):
        DS.dsir_score_incremental(docs, spark, p, seed=7)
    # a legacy store with no metadata rows must refuse, not guess
    legacy = str(tmp_path / "legacy")
    DS.model_table(tm, td, rm, rd).write.parquet(legacy)
    with pytest.raises(ValueError, match="no featurization metadata"):
        DS.dsir_score_incremental(docs, spark, legacy)


def test_gumbel_topk_ties_break_by_salted_hash_not_low_id(spark):
    """r11 ADVICE (dsir.py): documents sharing a grid position and an
    equal weight have identical sel_key_micro; the winner among such
    ties must follow the SECOND salted hash of the id, not ascending
    id (which would systematically prefer low ids)."""
    import hashlib

    def md5_long(val: str, salt: str) -> int:
        return int(
            hashlib.md5((val + chr(31) + salt).encode()).hexdigest()[:15], 16
        )

    def pos(i: int) -> int:
        return md5_long(str(i), "13") % DS.GUMBEL_POSITIONS

    # find an id pair sharing a gumbel position whose salted tie-break
    # order INVERTS id order, so the two tie policies disagree
    by_pos: dict[int, list[int]] = {}
    pair = None
    for i in range(100_000):
        by_pos.setdefault(pos(i), []).append(i)
        ids = by_pos[pos(i)]
        if len(ids) >= 2:
            lo, hi = ids[0], ids[-1]
            if md5_long(str(lo), str(DS.GUMBEL_TIE_SALT)) > md5_long(
                str(hi), str(DS.GUMBEL_TIE_SALT)
            ):
                pair = (lo, hi)
                break
    assert pair is not None
    scored = spark.createDataFrame(
        [(pair[0], 0, 1), (pair[1], 0, 1)],
        "doc_id long, logw_micro long, n_grams long",
    )
    picked = DS.gumbel_topk(scored, k=1).collect()[0]["doc_id"]
    assert picked == pair[1]  # the HIGHER id: salted hash rules the tie

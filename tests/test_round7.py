"""Round-7 pins: mixing arithmetic/skew contracts, PQ training
determinism, and the IVFADC composition (VERDICT r6 items 1/4/5 and the
four ADVICE findings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as SF


def test_round_half_up_is_engine_identical():
    """ADVICE r6: Python round() is banker's, DuckDB round() is
    half-away-from-zero — the module pins ONE rule (floor(x+0.5)) so
    weights landing a target on .5 (0.1625 * 200 = 32.5) can't split
    the engines."""
    import duckdb

    from rag_project_with_embeddings_and_vector_database_spark.operators.mixing import (
        _round_half_up,
    )

    cases = [32.5, 0.1625 * 200, 0.5, 1.5, 2.5, 33.4999, 0.0]
    duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(floor(x + 0.5) AS BIGINT) FROM (SELECT unnest(["
            + ",".join(repr(c) for c in cases)
            + "]) AS x)"
        ).fetchall()
    ]
    assert [_round_half_up(c) for c in cases] == duck
    # the specific ADVICE counter-example: banker's would give 32
    assert _round_half_up(0.1625 * 200) == 33


def test_mixture_sample_half_target_weights(spark, sf_dir):
    """Weights that land a target exactly on .5 of a row must follow
    the pinned half-up rule end to end (the latent ADVICE mismatch,
    now exercised rather than avoided)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        mixing as MX,
    )

    d = H._t(spark, sf_dir, "documents").select("lang", "doc_id")
    # 0.1625 * 200 = 32.5 -> 33 (half-up), supply of 'de' is ~70 so no clamp
    out = MX.mixture_sample(d, "lang", {"de": 0.1625}, 200)
    assert out.count() == 33


def test_mixture_upsample_guard_uses_ceil(spark):
    """ADVICE r6: total passes is ceil(t/n), not floor(t/n) — a domain
    needing exactly max_epochs+1 passes (rem > 0) must raise."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        mixing as MX,
    )

    d = spark.createDataFrame([("a", i) for i in range(10)], "dom string, doc_id long")
    # target 25 over supply 10 -> 2 full passes + remainder = 3 passes
    with pytest.raises(ValueError, match="needs 3 epochs"):
        MX.mixture_upsample(d, "dom", {"a": 1.0}, 25, max_epochs=2)
    # exactly 3 passes allowed at max_epochs=3, and the count is exact
    out = MX.mixture_upsample(d, "dom", {"a": 1.0}, 25, max_epochs=3)
    assert out.count() == 25
    by_epoch = {r.epoch: r.n for r in out.groupBy("epoch").agg(SF.count("*").alias("n")).collect()}
    assert by_epoch == {0: 10, 1: 10, 2: 5}


def test_mixture_sample_exact_skew_salted_rank_identical(spark):
    """VERDICT r6 item 5: the two-level salted rank must return the
    IDENTICAL member set as the naive single rank on a 90%-skewed
    domain (the hot-domain case it exists for), and the salt count
    must not affect membership."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        mixing as MX,
    )

    rows = [("hot", i) for i in range(1800)] + [("cold", 10000 + i) for i in range(200)]
    d = spark.createDataFrame(rows, "dom string, doc_id long")
    w = {"hot": 0.6, "cold": 0.4}
    naive = sorted(
        (r.dom, r.doc_id)
        for r in MX.mixture_sample(d, "dom", w, 300, salt_partitions=1).collect()
    )
    salted = sorted(
        (r.dom, r.doc_id)
        for r in MX.mixture_sample(d, "dom", w, 300, salt_partitions=32).collect()
    )
    assert naive == salted
    counts = {}
    for dom, _ in salted:
        counts[dom] = counts.get(dom, 0) + 1
    assert counts == {"hot": 180, "cold": 120}


def test_pq_codebooks_deterministic_and_sample_capped(spark, sf_dir):
    """The in-driver PQ trainer is a pure function of (ids, vectors,
    seed): two builds agree bit-for-bit, and the max_train_rows cap
    picks the smallest-hash rows deterministically (repartitioning the
    input must not change the codebooks)."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    e = H._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def build(df):
        return sorted(
            (r.subspace, r.code, tuple(r.centroid))
            for r in R.build_pq_codebooks(
                df, num_subspaces=8, num_codes=8, id_col="vec_id",
                sample_fraction=0.5, max_train_rows=100,
            ).collect()
        )

    a = build(e)
    b = build(e.repartition(7, "vec_id"))
    assert a == b
    assert len(a) == 64


def test_ann_ivf_pq_recall_and_residual_shapes(spark, sf_dir):
    """IVFADC end to end: the harness query's recall floor holds, and
    the stored index frame carries exactly (id, bucket, codes) — the
    compound-pruning contract's schema half."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    rows = H.SPARK_QUERIES["ann_ivf_pq"](spark, sf_dir).collect()
    assert rows and all(r.recall_floor_met for r in rows), rows

    e = H._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    enc, cdf, cb = R.build_ivf_pq_index(
        e, num_centroids=8, num_subspaces=8, num_codes=8, corpus_id="vec_id"
    )
    assert enc.columns == ["vec_id", "bucket", "pq_codes"]
    assert cb.count() == 64
    first = enc.first()
    assert len(first.pq_codes) == 8 and all(0 <= c < 8 for c in first.pq_codes)


def test_mixture_sample_tokens_two_phase_matches_single_window(spark, sf_dir):
    """The two-phase bucket-quota planner must select EXACTLY the docs
    the naive single-window greedy prefix selects (the rule the DuckDB
    oracle replays): prev-cumulative-tokens < budget in (hash, id)
    order, per domain."""
    from pyspark.sql import Window

    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        mixing as MX,
    )
    from rag_project_with_embeddings_and_vector_database_spark.functions import (
        text as TX,
    )

    weights, total = {"en": 0.45, "es": 0.3, "de": 0.15}, 16000
    d = H._t(spark, sf_dir, "documents").select(
        "lang", "doc_id", SF.size(TX.whitespace_tokens("text")).cast("bigint").alias("n_tokens")
    )
    got = sorted(
        (r.lang, r.doc_id)
        for r in MX.mixture_sample_tokens(
            d, "lang", weights, total, token_col="n_tokens"
        ).collect()
    )
    b = MX.hash_bucket("doc_id")
    w = (
        Window.partitionBy("lang")
        .orderBy(b.asc(), SF.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = SF.create_map(
        *[x for k, v in sorted(weights.items()) for x in (SF.lit(k), SF.lit(MX._round_half_up(v * total)))]
    )
    want = sorted(
        (r.lang, r.doc_id)
        for r in d.filter(SF.col("lang").isin(list(weights)))
        .withColumn("_prev", SF.sum("n_tokens").over(w) - SF.col("n_tokens"))
        .filter(SF.col("_prev") < budget[SF.col("lang")])
        .collect()
    )
    assert got == want and len(got) > 0


def test_mixture_sample_tokens_boundary_and_zero_token_docs(spark):
    """Equality edges: a doc whose preceding cumulative tokens EQUAL
    the budget is excluded (prev < budget is strict) — including
    zero-token docs sitting exactly on the boundary — and the greedy
    prefix includes the single doc that crosses the budget. Verified
    against a Python replay of the rule in true hash order, at
    plan_buckets=1 (pure window path) and 4096 (two-phase path)."""
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        mixing as MX,
    )

    ids = list(range(12))
    base = spark.createDataFrame([("a", i) for i in ids], "dom string, doc_id long")
    order = [
        r.doc_id
        for r in base.select("doc_id", MX.hash_bucket("doc_id").alias("b"))
        .orderBy("b", "doc_id")
        .collect()
    ]
    # tokens assigned by hash-order position: 5, 7, 0, 3, 3, ...
    pos_tokens = {order[0]: 5, order[1]: 7, order[2]: 0}
    tokens = {i: pos_tokens.get(i, 3) for i in ids}
    d = spark.createDataFrame(
        [("a", i, tokens[i]) for i in ids], "dom string, doc_id long, n_tokens long"
    )
    # budget 12 == 5 + 7: doc 3 (zero tokens, prev=12) must be excluded
    for pb in (1, 4096):
        got = sorted(
            r.doc_id
            for r in MX.mixture_sample_tokens(
                d, "dom", {"a": 1.0}, 12, token_col="n_tokens", plan_buckets=pb
            ).collect()
        )
        assert got == sorted(order[:2]), f"plan_buckets={pb}: {got}"
    # budget 13 crosses into the zero-token doc AND the next doc
    # (prev: 12 < 13 for both the 0-token doc and the 3-token doc at
    # prev=12)... the 0-token doc leaves prev unchanged, so the
    # following doc is the boundary-crossing doc
    got13 = sorted(
        r.doc_id
        for r in MX.mixture_sample_tokens(
            d, "dom", {"a": 1.0}, 13, token_col="n_tokens", plan_buckets=1
        ).collect()
    )
    assert got13 == sorted(order[:4])


def test_leakage_safe_split_clusters_never_straddle(spark, sf_dir):
    """Every near-dup pair must land in the SAME split; singleton docs
    key on their own id (cluster == doc_id) and planted near-copies
    share their original's cluster."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        dedup as DD,
    )
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        splits as SP,
    )

    base = (
        H._t(spark, sf_dir, "documents")
        .filter(SF.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    planted = base.select(
        (SF.col("doc_id") + 1000).alias("doc_id"),
        SF.concat(SF.lit("copy "), SF.col("text")).alias("text"),
    )
    corpus = base.unionByName(planted)
    pairs = DD.ngram_jaccard_pairs(corpus, n=3, threshold=0.6)
    out = SP.leakage_safe_split(
        corpus.select("doc_id"), pairs, weights={"train": 0.8, "test": 0.2}
    )
    rows = {r.doc_id: (r.cluster, r.split) for r in out.collect()}
    assert len(rows) == corpus.count()
    pair_rows = pairs.collect()
    assert pair_rows, "fixture must plant near-dup pairs"
    for p in pair_rows:
        assert rows[p.id_a][1] == rows[p.id_b][1], (p.id_a, p.id_b)
        assert rows[p.id_a][0] == rows[p.id_b][0]
    # planted copies cluster with their originals; cluster label is the
    # min member id, so pairs {i, i+1000} carry cluster i
    for i in [r.doc_id for r in base.collect()]:
        if i + 1000 in rows and (i, (rows[i][0], rows[i][1])) and rows[i + 1000][0] == rows[i][0]:
            assert rows[i][0] <= i
    in_pairs = {p.id_a for p in pair_rows} | {p.id_b for p in pair_rows}
    singletons = set(rows) - in_pairs
    for s in singletons:
        assert rows[s][0] == s


def test_quality_classifier_deterministic_and_floor_guarded(spark, sf_dir):
    """The trained quality filter must (a) separate real docs from
    junk on held-out data, (b) be invariant to input partitioning
    (hash-split + L-BFGS, no rand() anywhere), and (c) RAISE when the
    floor is unreachable instead of returning plausible garbage."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        quality_model as QM,
    )

    d = H._t(spark, sf_dir, "documents").select("doc_id", "text")
    pos = d.withColumn("label", SF.lit(1))
    neg = d.select(
        (SF.col("doc_id") + 100000).alias("doc_id"),
        SF.concat_ws(
            " ",
            SF.transform(
                SF.sequence(SF.lit(1), SF.lit(40)),
                lambda i: SF.concat(SF.lit("zz"), SF.pmod(SF.col("doc_id") + i, SF.lit(13))),
            ),
        ).alias("text"),
        SF.lit(0).alias("label"),
    )
    labeled = pos.unionByName(neg)
    r1 = QM.quality_classifier_eval(labeled).collect()
    r2 = QM.quality_classifier_eval(labeled.repartition(16)).collect()
    assert r1 == r2
    assert r1[0].floor_met and r1[0].accuracy >= 0.9
    assert r1[0].n_train + r1[0].n_test == labeled.count()
    # unreachable floor -> raise (labels shuffled to noise via parity)
    noise = labeled.withColumn("label", (SF.col("doc_id") % 2).cast("int"))
    with pytest.raises(AssertionError, match="accuracy"):
        QM.quality_classifier_eval(noise, accuracy_floor=0.99)
    # score path: real docs must score above junk
    model = QM.train_quality_classifier(labeled)
    scored = QM.score_quality(labeled, model, keep_threshold=0.5)
    kept = {r.doc_id: r.keep for r in scored.collect()}
    real_kept = sum(kept[r.doc_id] for r in pos.collect())
    junk_kept = sum(kept[r.doc_id] for r in neg.collect())
    assert real_kept > 0.9 * pos.count() and junk_kept < 0.1 * neg.count()


def test_lm_score_partitioning_invariant_and_buckets_balanced(spark, sf_dir):
    """The fixed-point micro-unit aggregation must make LM scores
    independent of physical partitioning (integer sums are exact in
    any order — the double-avg form was observed flipping the 6th
    decimal), and the per-lang perplexity tiles must be equal-count
    within one doc."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import lm as LM

    d = H._t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ref = d.filter(SF.col("doc_id") < 300)
    model = LM.train_unigram_lm(ref)
    oov = -20_000_000  # far below any in-vocab logp; exact micro-units
    s1 = sorted(
        (r.doc_id, r.lm_nll) for r in LM.lm_score(d, model, oov).collect()
    )
    s2 = sorted(
        (r.doc_id, r.lm_nll)
        for r in LM.lm_score(d.repartition(16), model, oov).collect()
    )
    assert s1 == s2 and len(s1) == d.count()
    # OOV terms must score lower (higher NLL) than a pure in-vocab doc:
    # score a junk doc no model term can match
    junk = spark.createDataFrame(
        [(10**9, "xx", "qqqzzz1 qqqzzz2 qqqzzz3")], "doc_id long, lang string, text string"
    )
    j = LM.lm_score(junk, model, oov).first()
    assert j.lm_nll == 20.0  # -oov/1e6 exactly: every token OOV
    scored = LM.lm_score(d, model, oov)  # lang carried through the spine
    b = LM.perplexity_buckets(scored, partition_cols=["lang"])
    per = {
        (r.lang, r.bucket): r["n"]
        for r in b.groupBy("lang", "bucket").agg(SF.count(SF.lit(1)).alias("n")).collect()
    }
    for lang in {k[0] for k in per}:
        sizes = [per[(lang, t)] for t in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)


def test_corpus_overlap_finds_planted_docs_only(spark, sf_dir):
    """Every planted near-copy of an A-doc must probe as matched; the
    genuine B docs (disjoint id range, distinct synthetic content)
    must overwhelmingly not match; output covers every B doc exactly
    once."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        overlap as OV,
    )

    d = H._t(spark, sf_dir, "documents")
    a = d.filter(SF.col("doc_id") < 40).select("doc_id", "text")
    b = (
        d.filter((SF.col("doc_id") >= 40) & (SF.col("doc_id") < 70))
        .select("doc_id", "text")
        .unionByName(
            d.filter(SF.col("doc_id") < 10).select(
                (SF.col("doc_id") + 2000).alias("doc_id"),
                SF.concat(SF.lit("copy "), SF.col("text")).alias("text"),
            )
        )
    )
    rows = {r.doc_id: r.matched for r in OV.corpus_overlap(a, b).collect()}
    assert len(rows) == b.count()
    planted = [i + 2000 for i in range(10)]
    assert all(rows[p] for p in planted), [p for p in planted if not rows[p]]
    genuine = [k for k in rows if k < 2000]
    false_hits = sum(rows[k] for k in genuine)
    assert false_hits <= len(genuine) // 5, f"{false_hits}/{len(genuine)} false hits"


def test_diversity_sample_covers_every_cluster(spark, sf_dir):
    """The cluster-balanced sample must draw from EVERY non-empty
    embedding cluster (min(quota, cluster size) rows each) and be
    reproducible across runs."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        diversity as DV,
    )
    from rag_project_with_embeddings_and_vector_database_spark.operators import (
        retrieval as R,
    )

    e = H._par(H._t(spark, sf_dir, "embeddings"))
    got = DV.cluster_balanced_sample(e, n_per_cluster=5, num_clusters=4, corpus_id="vec_id")
    rows = sorted((r.bucket, r.vec_id) for r in got.collect())
    # reproducible
    rows2 = sorted(
        (r.bucket, r.vec_id)
        for r in DV.cluster_balanced_sample(
            e, n_per_cluster=5, num_clusters=4, corpus_id="vec_id"
        ).collect()
    )
    assert rows == rows2
    assigned, _ = R.build_ivf_index(e, num_centroids=4, corpus_id="vec_id")
    sizes = {r.bucket: r["n"] for r in assigned.groupBy("bucket").agg(SF.count(SF.lit(1)).alias("n")).collect()}
    per = {}
    for b, _v in rows:
        per[b] = per.get(b, 0) + 1
    for b, size in sizes.items():
        assert per.get(b, 0) == min(5, size), (b, size, per.get(b))


def test_corpus_prep_lm_composition_flags_consistent(spark, sf_dir):
    """The capstone's verdicts must compose: kept implies all three
    gates (LM tile, heuristic quality, Gopher rules) passed; among
    survivors, exactly one keeper per distinct text; a doc failing any
    gate is never kept."""
    from rag_project_with_embeddings_and_vector_database_spark import harness as H

    out = {r.doc_id: r for r in H.SPARK_QUERIES["corpus_prep_lm"](spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in H._t(spark, sf_dir, "documents").select("doc_id", "text").collect()}
    assert set(out) == set(docs)
    kept_texts = {}
    for i, r in out.items():
        if r.kept:
            assert r.kept_lm and r.kept_quality and r.kept_gopher
        if r.kept_lm and r.kept_quality and r.kept_gopher:
            kept_texts.setdefault(docs[i], []).append((i, r.kept))
    assert kept_texts, "fixture must have survivors"
    for text, members in kept_texts.items():
        keepers = [i for i, k in members if k]
        assert len(keepers) == 1 and keepers[0] == min(i for i, _ in members)
    # every gate must actually cut something at every SF (the Gopher
    # gate's word-count floor bites the synthetic corpus's short docs)
    assert any(not r.kept_lm for r in out.values())
    assert any(not r.kept_quality for r in out.values())
    assert any(not r.kept_gopher for r in out.values())

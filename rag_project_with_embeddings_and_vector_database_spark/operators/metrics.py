"""Retrieval-quality metric layer (SURVEY.md §2.6 A1-A7, §2.2 P4-P5).

Reference semantics (/root/reference/src/evaluation.py):
  - is_relevant (16-46): hit relevant iff expected source is a substring
    of source_file AND any expected keyword (case-insensitive) is a
    substring of content.
  - top_k_accuracy (48-60), reciprocal_rank (62-73),
    avg_similarity@5 over relevant hits (75-89).
  - per-config aggregation = mean over queries (160-186).

The reference recomputes is_relevant up to 4x per hit; here ``relevant``
is one boolean column computed once and shared by all aggregates, and the
whole metric layer is a single two-phase (partial+final) hash aggregation
per grain — Catalyst plans the map-side combine automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def relevance(
    source_col: Column | str,
    content_col: Column | str,
    expected_source: Column | str,
    keywords: Column | str,
) -> Column:
    """P4 relevance predicate: source containment AND EXISTS(keyword)."""
    src = F.col(source_col) if isinstance(source_col, str) else source_col
    content = F.lower(F.col(content_col) if isinstance(content_col, str) else content_col)
    exp = F.col(expected_source) if isinstance(expected_source, str) else expected_source
    kws = F.col(keywords) if isinstance(keywords, str) else keywords
    kw_hit = F.exists(kws, lambda k: content.contains(F.lower(k)))
    return src.contains(exp) & kw_hit


def resolve_expected_source(
    chunks: DataFrame,
    queries: DataFrame,
    source_col: str = "source_file",
    patterns_col: str = "expected_source_patterns",
    query_id: str = "query_id",
) -> DataFrame:
    """P5: per query, the first chunk source matching any expected pattern
    (case-insensitive substring), falling back to the globally first
    source (main.py:297-308). "First" = minimum source (deterministic)."""
    q = queries.select(query_id, patterns_col)
    matched = (
        chunks.select(source_col)
        .distinct()
        .join(F.broadcast(q), F.exists(F.col(patterns_col), lambda p: F.lower(F.col(source_col)).contains(F.lower(p))))
        .groupBy(query_id)
        .agg(F.min(source_col).alias("expected_source"))
    )
    fallback = chunks.agg(F.min(source_col).alias("_fallback_source"))
    return (
        q.join(matched, query_id, "left")
        .crossJoin(F.broadcast(fallback))
        .select(
            query_id,
            F.coalesce("expected_source", "_fallback_source").alias("expected_source"),
        )
    )


def per_query_metrics(
    hits: DataFrame,
    group_cols: list[str],
    relevant_col: str = "relevant",
    rank_col: str = "rank",
    score_col: str = "score",
    ks: tuple[int, ...] = (1, 3),
    avg_sim_k: int = 5,
    grid: DataFrame | None = None,
) -> DataFrame:
    """A1-A4: one groupBy emitting top-1/top-3 accuracy, MRR and
    avg-similarity@k — all four metrics in a single exchange.

    ``grid`` (the full expected group_cols combinations, e.g. queries x
    configs) full-outer-joins the aggregates so a group with ZERO
    retrieved hits still emits a 0.0-metric row — the reference scores
    every query per config (evaluation.py:160-186), so downstream means
    and num_queries must include empty groups. The join is FULL outer
    (name-list form, so the key columns coalesce): a group observed in
    ``hits`` but missing from an incomplete grid is kept, never silently
    dropped."""
    rel = F.col(relevant_col)
    rank = F.col(rank_col)
    aggs = []
    for k in ks:
        aggs.append(
            F.max(F.when(rel & (rank <= k), F.lit(1.0)).otherwise(F.lit(0.0))).alias(f"top_{k}")
        )
    aggs.append(
        F.coalesce(1.0 / F.min(F.when(rel, rank)), F.lit(0.0)).alias("mrr")
    )
    # NOTE: deliberately unrounded — downstream means must aggregate the
    # raw value (rounding first would put the mean exactly on .5
    # round-boundaries and make the result engine-dependent).
    aggs.append(
        F.coalesce(F.avg(F.when(rel & (rank <= avg_sim_k), F.col(score_col))), F.lit(0.0)).alias(
            "avg_similarity"
        )
    )
    out = hits.groupBy(*group_cols).agg(*aggs)
    if grid is not None:
        out = grid.join(out, group_cols, "full")
        for c in [f"top_{k}" for k in ks] + ["mrr", "avg_similarity"]:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return out


def per_config_metrics(
    query_metrics: DataFrame,
    config_cols: list[str],
    ks: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """A5: mean of each metric across queries + num_queries count
    (evaluation.py:160-186)."""
    aggs = [F.round(F.avg(f"top_{k}"), 6).alias(f"top_{k}_accuracy") for k in ks]
    aggs.append(F.round(F.avg("mrr"), 6).alias("mrr"))
    aggs.append(F.round(F.avg("avg_similarity"), 6).alias("avg_similarity"))
    aggs.append(F.count(F.lit(1)).alias("num_queries"))
    return query_metrics.groupBy(*config_cols).agg(*aggs)


def summary_stats(config_metrics: DataFrame, ks: tuple[int, ...] = (1, 3)) -> DataFrame:
    """A6: grand means + max combined score (evaluation.py:198-211)."""
    aggs = [F.round(F.avg(f"top_{k}_accuracy"), 6).alias(f"mean_top_{k}_accuracy") for k in ks]
    aggs += [
        F.round(F.avg("mrr"), 6).alias("mean_mrr"),
        F.round(F.avg("avg_similarity"), 6).alias("mean_avg_similarity"),
        F.round(F.max(F.col(f"top_{ks[-1]}_accuracy") + F.col("mrr")), 6).alias("max_combined_score"),
        F.count(F.lit(1)).alias("num_configs"),
    ]
    return config_metrics.agg(*aggs)


def argmax_by_metric(config_metrics: DataFrame, metric: str, config_cols: list[str]) -> DataFrame:
    """A7: best config per metric (evaluation.py:188-192), deterministic
    tie-break on the config key (row_number, not max_by, so ties are
    stable across engines)."""
    w = Window.orderBy(F.desc(metric), *[F.asc(c) for c in config_cols])
    return (
        config_metrics.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*config_cols, F.col(metric), F.lit(metric).alias("metric"))
    )


def combined_score(config_metrics: DataFrame, top_col: str = "top_3_accuracy") -> DataFrame:
    """O1: combined_score = top_3_accuracy + mrr (main.py:349)."""
    return config_metrics.withColumn(
        "combined_score", F.round(F.col(top_col) + F.col("mrr"), 6)
    )


def rank_configs(config_metrics: DataFrame, config_cols: list[str]) -> DataFrame:
    """O2: global sort desc by combined_score with deterministic
    tie-break; emits a dense ranking column."""
    order = [F.desc("combined_score")] + [F.asc(c) for c in config_cols]
    w = Window.orderBy(*order)
    return config_metrics.withColumn("rank", F.row_number().over(w).cast("int")).orderBy("rank")


def ndcg_at_k(
    hits: DataFrame,
    n_rel: DataFrame,
    group_cols: list[str] | tuple[str, ...] = ("qid",),
    relevant_col: str = "relevant",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """nDCG@k with binary relevance (r14 A-family extension; the
    reference's evaluation.py stops at top-k accuracy / MRR / avg-sim —
    nDCG is the standard graded-ranking metric a retrieval-evaluation
    user expects next). ``hits`` carries ranked results with a boolean
    ``relevant``; ``n_rel`` carries per-group TOTAL relevant-candidate
    counts (the ideal ranking puts all of them first, so IDCG sums
    1/log2(i+1) over i = 1..min(n_rel, k)).

    Engine-portability: DCG terms are 1/log2(rank+1) doubles summed in
    nondeterministic group order — the final value is rounded to 6
    decimals (the avg_similarity precedent), which absorbs
    summation-order and libm-ulp differences; IDCG is a DETERMINISTIC
    ordered fold (aggregate over sequence), not a group sum. Groups
    with no relevant candidates emit ndcg = 0.0 (coalesced through the
    left join), matching the zero-filled metric convention.

    Scale: one map-side-combinable groupBy over the hits (already
    top-k-bounded per group) plus a broadcast join of the KB-scale
    per-group counts — no extra shuffle of the corpus."""
    gc = list(group_cols)
    rel, rank = F.col(relevant_col), F.col(rank_col)
    dcg = hits.groupBy(*gc).agg(
        F.sum(
            F.when(rel & (rank <= k), F.lit(1.0) / F.log2(rank + F.lit(1)))
            .otherwise(F.lit(0.0))
        ).alias("dcg")
    )
    idcg = F.expr(
        f"CASE WHEN n_rel >= 1 THEN aggregate(sequence(1, int(least(n_rel, {k}))),"
        " 0D, (acc, i) -> acc + 1D / log2(double(i + 1))) ELSE 0D END"
    )
    side = n_rel.withColumn("idcg", idcg).select(*gc, "idcg")
    return (
        dcg.join(F.broadcast(side), gc, "left")
        .select(
            *gc,
            F.round(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("ndcg"),
        )
    )

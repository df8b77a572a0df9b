"""The full experiment pipeline (reference main() — /root/reference/
main.py:415-461) as lazily-composed DataFrames.

Stage map (each a DataFrame, materialized only at sinks):

    documents -> chunks (5 strategies) -> chunk_vectors (N models)
              -> vector table [(strategy, model)-partitioned parquet]
              -> hits (ONE broadcast top-k job for all configs x queries)
              -> per-query metrics -> per-config metrics -> ranked report

vs the reference's eager stage-at-a-time loops (375 sequential searches,
main.py:261-318): here retrieval is a single partitioned top-k job and
the metric layer is one two-phase hash aggregation — the shuffle map is
SURVEY.md §4 (scan->chunk->embed narrow; one exchange to partition the
vector table; broadcast queries; one exchange for metrics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..operators import chunking as CH
from ..operators import metrics as M
from ..operators import retrieval as R
from ..operators._cache import swap_cache
from ..operators.embedding import embed


@dataclass
class ExperimentResult:
    chunks: DataFrame
    vectors: DataFrame
    hits: DataFrame
    query_metrics: DataFrame
    config_metrics: DataFrame
    report: DataFrame
    summary: DataFrame


def run_experiment(
    spark: SparkSession,
    documents: DataFrame,          # (path, content)
    queries: DataFrame,            # (query_id, query, expected_keywords, expected_source_patterns)
    cfg: EngineConfig | None = None,
    strategies: tuple[str, ...] | None = None,
    models: list[str] | None = None,
    backend: str = "hash",
    vector_table_path: str | None = None,
) -> ExperimentResult:
    cfg = cfg or EngineConfig()
    strategies = strategies or tuple(CH.STRATEGY_FUNCS)
    models = models or list(cfg.models)

    # Parse once: the 5-way strategy fan-out traverses the document set
    # once per branch, and without a cache each branch re-runs the
    # upstream SOURCE. For a binary corpus (load_documents over
    # binaryFile) that means re-reading and re-parsing every file per
    # branch — five concurrent tasks each holding the partition's raw
    # file bytes in JVM Arrow batches, which OOMs a default-heap (1g)
    # local driver on a tens-of-MB corpus. The parsed text is tiny;
    # cache it and the binaries are read exactly once. Scoped via
    # swap_cache so repeated experiment runs in one session swap, not
    # accumulate (same policy as the dedup pair generators).
    documents = swap_cache("pipeline.documents", documents)

    # Stage 3: chunk fan-out (C2-C7) — narrow, no shuffle. The 5-way
    # strategy union multiplies the partition count (5 x input splits);
    # coalesce (shuffle-free branch merge) back to cluster parallelism
    # so the Arrow embed stage runs a few well-filled batches per core
    # instead of hundreds of near-empty pandas-UDF tasks.
    chunks = CH.chunk_documents(documents, strategies, text_col="content", source_col="path", cfg=cfg)
    # cache: the chunk set is traversed once per model plus once for
    # expected-source resolution — without it the pandas-UDF chunker
    # fold re-runs N_models + 1 times.
    chunks = chunks.coalesce(spark.sparkContext.defaultParallelism).cache()

    # Stage 4: embed fan-out (E2-E4) — one pass per model, union tagged
    # by (strategy, model): the 25 reference "collections" become
    # partition values of one DataFrame.
    vectors = None
    for m in models:
        v = embed(chunks, m, text_col="content", backend=backend).withColumn("model", F.lit(m))
        vectors = v if vectors is None else vectors.unionByName(v)

    # Stage 5: vector-table sink (S11/S12) — optional persistence; the
    # collection is a partition.
    if vector_table_path:
        vt = R.VectorTable(spark, vector_table_path, ("strategy", "model"))
        vt.upsert(vectors)
        vectors = vt.read()
    else:
        vectors = vectors.cache()

    # Stage 6 prep: resolve expected source per query (P5) and embed the
    # query text per model (R2).
    expected = M.resolve_expected_source(
        chunks.select("source_file"), queries.select("query_id", "expected_source_patterns")
    )
    q_base = queries.join(expected, "query_id").select(
        "query_id", "query", "expected_keywords", "expected_source"
    )
    q_embedded = None
    for m in models:
        qe = embed(q_base, m, text_col="query", out_col="q_embedding", backend=backend).withColumn(
            "model", F.lit(m)
        )
        q_embedded = qe if q_embedded is None else q_embedded.unionByName(qe)

    # Stage 6: retrieval — ONE broadcast join + windowed top-k covers
    # every (strategy, model, query) combination (R1/R3/R4).
    scored = vectors.join(
        F.broadcast(
            q_embedded.select(
                F.col("query_id"),
                F.col("model").alias("q_model"),
                "q_embedding",
                "expected_source",
                "expected_keywords",
            )
        ),
        F.col("model") == F.col("q_model"),
    ).withColumn(
        "score",
        F.aggregate(
            F.zip_with("embedding", "q_embedding", lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    hits = R.topk(
        scored,
        ["query_id", "strategy", "model"],
        cfg.top_k,
        tiebreak_col="chunk_id",
    ).withColumn(
        "relevant",
        M.relevance("source_file", "content", F.col("expected_source"), F.col("expected_keywords")),
    )

    # Stage 7: metric layer — one exchange on (query, strategy, model),
    # reused by the config aggregation (A1-A5). The query x config grid
    # guarantees a 0.0-metric row even for configs where retrieval
    # returned nothing (reference scores every query per config).
    grid = q_base.select("query_id").crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [(s, m) for s in strategies for m in models], "strategy string, model string"
            )
        )
    )
    query_metrics = M.per_query_metrics(
        hits,
        ["query_id", "strategy", "model"],
        ks=cfg.top_k_accuracy_ks,
        avg_sim_k=cfg.avg_similarity_k,
        grid=grid,
    )
    config_metrics = M.per_config_metrics(query_metrics, ["strategy", "model"], ks=cfg.top_k_accuracy_ks)

    # Stage 8: report (O1-O3, A6-A7).
    report = M.rank_configs(M.combined_score(config_metrics), ["strategy", "model"])
    summary = M.summary_stats(config_metrics, ks=cfg.top_k_accuracy_ks)

    return ExperimentResult(chunks, vectors, hits, query_metrics, config_metrics, report, summary)


def run_full_experiment(
    spark: SparkSession,
    documents_folder: str,
    queries_json: str,
    out_dir: str | None = None,
    cfg: EngineConfig | None = None,
    strategies: tuple[str, ...] | None = None,
    models: list[str] | None = None,
    backend: str = "hash",
    vector_table_path: str | None = None,
) -> ExperimentResult:
    """The one-call equivalent of the reference's ``main()``
    (main.py:415-461): folder of documents + queries.json in, ranked
    report (and optional CSV/JSON sinks) out. A user of the reference
    switches by pointing this at the same inputs.

    Documents whose format parser is unavailable are SKIPPED (matching
    the reference's per-file error tolerance, document_loader.py:63-64)
    rather than evaluated as stub text."""
    from ..sources.documents import load_documents, load_query_set

    docs = (
        load_documents(spark, documents_folder, stub_missing_parsers=False)
        .filter(F.col("error").isNull())
        .select("path", "content")
    )
    queries = load_query_set(spark, queries_json)
    result = run_experiment(
        spark,
        docs,
        queries,
        cfg=cfg,
        strategies=strategies,
        models=models,
        backend=backend,
        vector_table_path=vector_table_path,
    )
    if out_dir:
        write_report(result.report, out_dir)
    return result


def write_report(report: DataFrame, out_dir: str) -> None:
    """S9/S10 sinks: CSV + JSON (reference main.py:352-363). coalesce(1)
    is fine for a 25-row report; large outputs keep their partitioning."""
    report.coalesce(1).write.mode("overwrite").option("header", "true").csv(f"{out_dir}/results_csv")
    report.coalesce(1).write.mode("overwrite").json(f"{out_dir}/results_json")

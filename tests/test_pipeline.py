"""End-to-end experiment pipeline test — replicates the reference's own
harness shape (3 markdown docs + queries with expected keywords/sources,
SURVEY.md §5) with the deterministic hash embedder, and asserts
run-to-run determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.config import EngineConfig
from rag_project_with_embeddings_and_vector_database_spark.plans.pipeline import (
    run_experiment,
    write_report,
)

DOCS = [
    (
        "projects/annual_report.md",
        "# Annual Report\n\nTotal revenue grew 20% to $5M in fiscal 2024. "
        "Profit margins improved across segments.\n\n## Outlook\n\n"
        "We expect continued revenue growth next year.",
    ),
    (
        "projects/quarterly_results.md",
        "# Q3 Results\n\nQuarterly earnings beat expectations. "
        "Operating costs fell 5%.\n\n## Risks\n\nSupply chain pressure remains.",
    ),
    (
        "projects/hr_policy.md",
        "# HR Policy\n\nEmployees receive 25 vacation days. "
        "Remote work is allowed two days per week.",
    ),
]

QUERIES = [
    ("q1", "How much did revenue grow?", ["revenue"], ["annual"]),
    ("q2", "What were the quarterly earnings?", ["earnings"], ["quarterly"]),
    ("q3", "How many vacation days do employees get?", ["vacation"], ["hr"]),
]


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, ["path", "content"])
    queries = spark.createDataFrame(
        QUERIES, "query_id string, query string, expected_keywords array<string>, expected_source_patterns array<string>"
    )
    cfg = EngineConfig(models={"all-MiniLM-L6-v2": 384, "e5-base-v2": 768})
    return run_experiment(spark, docs, queries, cfg=cfg)


def test_config_fanout_complete(result):
    rows = result.config_metrics.collect()
    # 5 strategies x 2 models
    assert len(rows) == 10
    assert all(r.num_queries == 3 for r in rows)


def test_expected_source_resolution(result):
    hits = result.hits.filter(F.col("query_id") == "q1").select("expected_source").distinct().collect()
    assert len(hits) == 1 and "annual_report" in hits[0].expected_source


def test_metrics_in_range_and_report_ranked(result):
    report = result.report.collect()
    assert [r.rank for r in report] == list(range(1, len(report) + 1))
    for r in report:
        assert 0.0 <= r.top_1_accuracy <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        assert abs(r.combined_score - round(r.top_3_accuracy + r.mrr, 6)) < 1e-9
    combined = [r.combined_score for r in report]
    assert combined == sorted(combined, reverse=True)


def test_summary_consistent(result):
    s = result.summary.collect()[0]
    assert s.num_configs == 10
    assert 0.0 <= s.mean_mrr <= 1.0


def test_run_to_run_determinism(spark):
    docs = spark.createDataFrame(DOCS, ["path", "content"])
    queries = spark.createDataFrame(
        QUERIES, "query_id string, query string, expected_keywords array<string>, expected_source_patterns array<string>"
    )
    cfg = EngineConfig(models={"all-MiniLM-L6-v2": 384})
    a = run_experiment(spark, docs, queries, cfg=cfg).report.collect()
    b = run_experiment(spark, docs, queries, cfg=cfg).report.collect()
    assert a == b


def test_vector_table_persistence_and_sinks(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, ["path", "content"])
    queries = spark.createDataFrame(
        QUERIES, "query_id string, query string, expected_keywords array<string>, expected_source_patterns array<string>"
    )
    cfg = EngineConfig(models={"all-MiniLM-L6-v2": 384})
    res = run_experiment(
        spark, docs, queries, cfg=cfg, strategies=("recursive",),
        vector_table_path=str(tmp_path / "vectors"),
    )
    # vectors came back from the partitioned table
    assert {tuple(r) for r in res.vectors.select("strategy", "model").distinct().collect()} == {
        ("recursive", "all-MiniLM-L6-v2")
    }
    write_report(res.report, str(tmp_path / "out"))
    csv = spark.read.option("header", "true").csv(str(tmp_path / "out" / "results_csv"))
    assert csv.count() == res.report.count()


def test_run_full_experiment_from_folder(spark, tmp_path):
    from rag_project_with_embeddings_and_vector_database_spark.plans.pipeline import (
        run_full_experiment,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    for path, content in DOCS:
        f = d / path.split("/")[-1]
        f.write_text(content)
    import json

    (tmp_path / "queries.json").write_text(
        json.dumps(
            [
                {
                    "query_id": q,
                    "query": text,
                    "expected_keywords": kws,
                    "expected_source_patterns": pats,
                }
                for q, text, kws, pats in QUERIES
            ]
        )
    )
    from rag_project_with_embeddings_and_vector_database_spark.config import EngineConfig

    res = run_full_experiment(
        spark,
        str(d),
        str(tmp_path / "queries.json"),
        out_dir=str(tmp_path / "out"),
        cfg=EngineConfig(models={"all-MiniLM-L6-v2": 384}),
    )
    report = res.report.collect()
    assert len(report) == 5  # 5 strategies x 1 model
    assert (tmp_path / "out" / "results_csv").exists()

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the package; this module only adapts it to the
driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rag_project_with_embeddings_and_vector_database_spark import harness


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full retrieval +
    evaluation pipeline core — top-10 cosine retrieval for 50 query
    vectors, per-query quality metrics, per-config aggregation, ranked
    report (SURVEY.md §2.5-§2.7 in one plan)."""
    return harness.report_rank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.9)."""
    return harness.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; rows-only ops
    (pandas-UDF chunker folds, hash-embedding inference, seeded LSH,
    iterative connected components) are intentionally omitted."""
    return harness.oracle_sql()

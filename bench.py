"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full plan
execution, no driver collect cost, no count-only column pruning).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rag_project_with_embeddings_and_vector_database_spark import get_spark, harness

HEADLINE = [
    # relational core
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "rollup_lineitem",
    "cube_lineitem",
    "top_orders_per_customer",
    "semi_anti_join",
    "bucketed_join",
    # events / windows / time
    "events_hourly",
    "window_running_sum",
    "sessionize",
    "asof_join",
    "events_json",
    "events_percentiles",
    "pivot_events",
    # vector retrieval + metrics (the reference's core pipeline)
    "topk_retrieval",
    "knn_bruteforce",
    "topk_retrieval_quantized",
    "bm25_topk",
    "bm25_indexed",
    "ann_ivf_indexed",
    "hybrid_rrf",
    "agg_config",
    "report_rank",
    # dedup / text-analysis (north-star)
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "simhash_pairs",
    "dedup_embedding",
    "dedup_full",
    "dedup_incremental",
    "ngram_jaccard",
    "doc_fingerprint",
    "lang_id",
    "text_quality",
    "token_stats",
    "tfidf_terms",
    "repetition_stats",
    "pii_scan",
    "quality_filter",
    "hash_split_assign",
    "decontaminate",
    "chunk_sections",
    # UDF-path ops
    "chunk_fanout",
    "embed_batch",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    # warm the JVM/codegen path outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    qs = harness.queries()
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)
        # bound cross-query interference (broadcast/codegen/GC debris)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""One-off profiler for the incremental-dedup bench twin (VERDICT r7
item 2): separates index build/write, bucket discovery, pruned read,
and the probe join so the 10 s recorded figure gets an explanation.

Usage: python scripts/profile_dedup_inc.py [sf_dir]
"""

from __future__ import annotations

import functools
import operator
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark import get_spark, harness as H
from rag_project_with_embeddings_and_vector_database_spark.operators import dedup_index as DI


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"[profile] {label}: {time.time() - t0:.3f}s", flush=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = os.path.join(tempfile.gettempdir(), f"spark_rag_profidx_p{os.getpid()}")
    docs = H._par(H._t(spark, sf_dir, "documents"))

    t("index build+write", lambda: DI.build_dedup_index(docs, num_perm=16, num_bands=4, seed=42)
        .withColumn("sig_bucket", F.pmod("band_hash", F.lit(64)))
        .repartition("band", "sig_bucket").write.mode("overwrite")
        .partitionBy("band", "sig_bucket").parquet(f"{base}/dedupidx"))

    for rep in range(3):
        delta = docs.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" incremental delta revision")).alias("text"),
        )
        dbuckets = t(f"r{rep} bucket discovery (delta shingle+collect)", lambda: sorted(
            {(r.band, r.sb)
             for r in DI.build_dedup_index(delta, num_perm=16, num_bands=4, seed=42)
             .select("band", F.pmod("band_hash", F.lit(64)).alias("sb"))
             .distinct().collect()}))
        print(f"[profile] r{rep} n_buckets={len(dbuckets)}")
        pruned = spark.read.parquet(f"{base}/dedupidx").filter(
            functools.reduce(operator.or_,
                [(F.col("band") == b) & (F.col("sig_bucket") == sb) for b, sb in dbuckets])
        ).drop("sig_bucket")
        t(f"r{rep} pruned index count", lambda: print("   rows:", pruned.count()))
        out = DI.dedup_delta(pruned, delta, num_perm=16, num_bands=4, seed=42)
        t(f"r{rep} probe (dedup_delta force)", lambda: out.write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()

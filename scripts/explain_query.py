"""Capture .explain("formatted") for harness queries into plans/$SPARK_GRAFT_PLANS_DIR (default r15)/.

Usage: python scripts/explain_query.py <suffix> <query> [query ...]
       (suffix is e.g. "before" or "after")
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Note: for store-building queries the captured plan is the RETURNED
DataFrame's plan (the probe/query side); the build/write phases are
separate jobs — their cost is profiled by scripts/profile_query.py and
their layout is visible on disk. The plan still shows the pruned scan
locations, join strategies and exchange count of the query path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_project_with_embeddings_and_vector_database_spark import get_spark, harness


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15")
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("explain")
    qs = harness.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()

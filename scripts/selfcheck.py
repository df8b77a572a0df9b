"""Self-check: run every harness query on Spark AND its DuckDB oracle,
compare row count, column names, and order-insensitive rounded values —
a local approximation of the driver's correctness gate.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from rag_project_with_embeddings_and_vector_database_spark import get_spark, harness
from rag_project_with_embeddings_and_vector_database_spark.sources.tables import TABLES


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, list):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def norm_rows(rows):
    return sorted("|".join(norm_val(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = harness.queries()
    oracles = harness.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: ORACLE ERROR {str(e)[:300]}")
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {spark_cols} vs {duck_cols}")
        else:
            # align column order by name
            perm = [spark_cols.index(c) for c in sorted(spark_cols)]
            s_n = norm_rows([[r[i] for i in perm] for r in spark_rows])
            perm_d = [duck_cols.index(c) for c in sorted(duck_cols)]
            d_n = norm_rows([[r[i] for i in perm_d] for r in duck_rows])
            if s_n != d_n:
                diff = [(a, b) for a, b in zip(s_n, d_n) if a != b][:3]
                extra_s = [x for x in s_n if x not in set(d_n)][:2]
                extra_d = [x for x in d_n if x not in set(s_n)][:2]
                problems.append(f"values differ; first diffs {diff} spark-only {extra_s} duck-only {extra_d}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

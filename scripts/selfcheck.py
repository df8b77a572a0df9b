"""Self-check: run every harness query on Spark AND its DuckDB oracle,
compare row count, column names, and order-insensitive rounded values —
a local approximation of the driver's correctness gate.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
       python scripts/selfcheck.py --vanilla [sf_dir] [query ...]
       python scripts/selfcheck.py --check-window [since_ref]

--vanilla runs on a PLAIN SparkSession (default heap, no tuned
configs) — the session shape the driver actually uses; run it before
round end to catch config/memory assumptions the tuned factory hides.

--check-window enforces the rotation POLICY (VERDICT r3 item 8): every
query whose code changed since ``since_ref`` (default: the last commit
that touched a CORRECTNESS_r*.json — i.e. the round boundary) must sit
inside the FIRST 50 queries() entries, because the driver's correctness
gate only checks that window. Dependencies are derived, not hand-kept:
harness.py diff hunks map to their enclosing @register function;
package-module diffs map to every query whose function source uses that
module (via the harness import aliases + local imports), transitively
through the package's internal import graph.
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


PKG = "rag_project_with_embeddings_and_vector_database_spark"

# fixture/SQL-builder code in harness.py that lives OUTSIDE any
# @register span feeds these queries (kept small and explicit; the
# module-level fallback below catches anything unmapped by warning)
_HARNESS_MODULE_LEVEL_DEPS = {
    "_FIXTURE": {"scan_docs", "scan_queries"},
    "_fixture_pdf": {"scan_docs"},
    "_fixture_corpus": {"scan_docs", "scan_queries", "pipeline_reference_corpus"},
    "_minhash_sql": {"dedup_minhash", "dedup_minhash_pairs", "bucket_stats", "dedup_full"},
    "_minhash_pairs_sql": {"dedup_minhash_pairs"},
    "_simhash_sql": {"dedup_simhash", "simhash_pairs", "simhash_incremental"},
    "_simhash_incremental_sql": {"simhash_incremental"},
    "_dedup_full_sql": {"dedup_full"},
    "_CC_SQL": {"connected_components"},
    "_TOPK_QUANT_SQL": {"topk_retrieval_quantized"},
    "_BM25": {"bm25_topk", "hybrid_rrf"},
    "_bm25": {
        "bm25_topk", "hybrid_rrf", "bm25_indexed",
        "bm25_indexed_incremental", "bm25_indexed_delete",
        "bm25_indexed_delete_logical",
    },
    "_quality_filter_sql": {"quality_filter", "corpus_prep"},
    "_dedup_spans_sql": {"dedup_spans"},
    "_DEDUP_SPANS_K": {"dedup_spans"},
    "_MIXTURE_WEIGHTS": {"mixture_sample"},
    "_MIXTURE_TOTAL": {"mixture_sample"},
    "_corpus_prep_sql": {"corpus_prep"},
    "_mmr_sql": {"mmr_rerank"},
    "_ndcg_sql": {"metric_ndcg", "agg_ndcg"},
    "_per_query_ndcg": {"metric_ndcg", "agg_ndcg"},
    "_EMBED_CACHED_SQL": {"embed_cached"},
    "_LM_SC_CTES": {"lm_score", "lm_buckets"},
    "_overlap_sql": {"corpus_overlap", "corpus_overlap_indexed"},
    "_gopher_sql": {"corpus_prep_lm", "gopher_rules"},
    "_corpus_prep_lm_sql": {"corpus_prep_lm"},
    "_html_sql": {"html_extract"},
    "_HTML_FIX": {"html_extract"},
    # per-process scratch helpers: every harness query that writes a
    # _proc_tmp/_stream_tmp store
    "_sweep_stale_tmp": {
        "sessionize_stateful", "stream_dedup", "stream_upsert",
        "stream_windowed_counts", "stream_windowed_append",
        "stream_dedup_gated", "embed_cached", "dedup_incremental",
        "simhash_incremental", "semantic_dedup_incremental",
        "corpus_overlap_indexed", "dsir_score_day2",
        "stream_sketch_rollup",
    },
    "_proc_tmp": {
        "sessionize_stateful", "stream_dedup", "stream_upsert",
        "stream_windowed_counts", "stream_windowed_append",
        "stream_dedup_gated", "embed_cached", "dedup_incremental",
        "simhash_incremental", "semantic_dedup_incremental",
        "corpus_overlap_indexed", "dsir_score_day2",
        "stream_sketch_rollup",
    },
    "_ann_recall": {
        "ann_lsh", "ann_ivf", "ann_ivf_quantized", "ann_ivf_indexed",
        "ann_ivf_indexed_int8", "ann_ivf_append", "ann_pq",
    },
    "_synthetic_docs": {"chunk_fanout", "embed_batch", "embed_values", "pipeline_e2e"},
    "_events": {
        "asof_join", "events_hourly", "events_json", "events_percentiles",
        "grouped_mad", "pivot_events", "range_join_events", "salted_join",
        "sessionize", "sessionize_stateful", "stream_dedup",
        "stream_windowed_counts", "window_lag_delta", "window_range_frame",
        "window_running_sum", "window_suite", "window_value_functions",
    },
}


def _git(*args: str) -> str:
    import subprocess

    return subprocess.check_output(["git", *args], text=True)


def _module_import_graph() -> dict[str, set[str]]:
    """module file (pkg-relative) -> set of pkg-relative module files it
    imports, resolved from ``from .``/``from ..`` statements."""
    import os
    import re

    graph: dict[str, set[str]] = {}
    for dirpath, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG)
            pkg_dir = os.path.dirname(rel)
            deps: set[str] = set()
            with open(path) as f:
                src = f.read()
            for m in re.finditer(r"^\s*from\s+(\.+)([\w.]*)\s+import\s+([\w, ]+)", src, re.M):
                dots, modpath, names = m.group(1), m.group(2), m.group(3)
                base = pkg_dir
                for _ in range(len(dots) - 1):
                    base = os.path.dirname(base)
                if modpath:
                    cand = os.path.join(base, modpath.replace(".", "/"))
                    for c in (f"{cand}.py", f"{cand}/__init__.py"):
                        if os.path.exists(os.path.join(PKG, c)):
                            deps.add(c)
                    # `from .pkg import module` form
                    for nm in (n.strip() for n in names.split(",")):
                        c2 = os.path.join(base, modpath.replace(".", "/"), f"{nm}.py")
                        if os.path.exists(os.path.join(PKG, c2)):
                            deps.add(c2)
                else:
                    for nm in (n.strip() for n in names.split(",")):
                        c = os.path.join(base, f"{nm}.py")
                        if os.path.exists(os.path.join(PKG, c)):
                            deps.add(c)
            graph[rel] = deps
    return graph


def _query_module_deps() -> dict[str, set[str]]:
    """query name -> set of pkg-relative module files its harness
    function depends on (direct via alias/local-import, then closed
    over the internal import graph)."""
    import inspect
    import re

    from rag_project_with_embeddings_and_vector_database_spark import harness

    # harness import aliases -> module file
    alias_to_mod = {}
    hsrc = inspect.getsource(harness)
    for m in re.finditer(r"^from \.([\w.]+) import (\w+)(?: as (\w+))?$", hsrc, re.M):
        modpath, name, alias = m.groups()
        cand = f"{modpath.replace('.', '/')}/{name}.py"
        import os

        if os.path.exists(os.path.join(PKG, cand)):
            alias_to_mod[alias or name] = cand
        else:
            alias_to_mod[alias or name] = f"{modpath.replace('.', '/')}.py"

    graph = _module_import_graph()

    def closure(mods: set[str]) -> set[str]:
        out, stack = set(), list(mods)
        while stack:
            m = stack.pop()
            if m in out:
                continue
            out.add(m)
            stack.extend(graph.get(m, ()))
        return out

    deps: dict[str, set[str]] = {}
    for qname, fn in harness.SPARK_QUERIES.items():
        src = inspect.getsource(fn)
        direct: set[str] = set()
        for alias, mod in alias_to_mod.items():
            if re.search(rf"\b{alias}\.", src):
                direct.add(mod)
        for m in re.finditer(r"from \.([\w.]+) import ([\w, ]+)", src):
            cand = m.group(1).replace(".", "/")
            import os

            # `from .pkg import submodule` resolves to the submodule
            # file; only fall back to the package __init__ (whose
            # closure is the whole subpackage) when no name is a module
            resolved_name = False
            for nm in (n.strip().split(" as ")[0] for n in m.group(2).split(",")):
                c2 = f"{cand}/{nm}.py"
                if os.path.exists(os.path.join(PKG, c2)):
                    direct.add(c2)
                    resolved_name = True
            if not resolved_name:
                for c in (f"{cand}.py", f"{cand}/__init__.py"):
                    if os.path.exists(os.path.join(PKG, c)):
                        direct.add(c)
                        break
        deps[qname] = closure(direct)
    return deps


def _harness_register_spans() -> list[tuple[int, int, str]]:
    """(start_line, end_line, query_name) spans of @register blocks in
    harness.py, 1-indexed inclusive."""
    import re

    with open(f"{PKG}/harness.py") as f:
        lines = f.readlines()
    starts = []  # (line_no, name)
    for i, ln in enumerate(lines, start=1):
        m = re.match(r"@register\(\s*$|@register\(\s*\"([\w]+)\"", ln)
        if m:
            name = m.group(1)
            if name is None:  # multi-line form: name on the next line
                m2 = re.match(r"\s*\"([\w]+)\"", lines[i])
                name = m2.group(1) if m2 else None
            if name:
                starts.append((i, name))
    spans = []
    for idx, (start, name) in enumerate(starts):
        end = starts[idx + 1][0] - 1 if idx + 1 < len(starts) else len(lines)
        spans.append((start, end, name))
    return spans


def check_window(since_ref: str | None) -> int:
    import re

    from rag_project_with_embeddings_and_vector_database_spark import harness

    if since_ref is None:
        since_ref = _git("log", "--format=%H", "-n", "1", "--", "CORRECTNESS_r*.json").strip()
        if not since_ref:
            print("no round boundary found (no commit touches CORRECTNESS_r*.json); pass a ref")
            return 2
    # diff ref -> WORKING TREE in one pass: hunk "+" line numbers are
    # then positions in the current files, matching the register spans
    # computed from the same files (a ref->HEAD diff would skew once
    # uncommitted edits shift lines)
    touched = [
        p for p in _git("diff", "--name-only", since_ref, "--", PKG).splitlines() if p
    ]
    touched = sorted({p for p in touched if p.endswith(".py")})
    if not touched:
        print(f"window-check: no package changes since {since_ref[:12]} — OK")
        return 0

    affected: set[str] = set()
    deps = _query_module_deps()
    harness_rel = f"{PKG}/harness.py"
    for path in touched:
        rel = path[len(PKG) + 1 :]
        if path == harness_rel:
            spans = _harness_register_spans()
            hunk_lines: set[int] = set()
            for m in re.finditer(
                r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@",
                _git("diff", "-U0", since_ref, "--", path),
                re.M,
            ):
                a, n = int(m.group(1)), int(m.group(2) or "1")
                hunk_lines.update(range(a, a + max(n, 1)))
            in_span: set[int] = set()
            for start, end, name in spans:
                if any(start <= ln <= end for ln in hunk_lines):
                    affected.add(name)
                in_span.update(range(start, end + 1))
            module_level = hunk_lines - in_span
            if module_level:
                with open(path) as f:
                    hlines = f.readlines()
                matched_any = False
                for key, qnames in _HARNESS_MODULE_LEVEL_DEPS.items():
                    for ln in module_level:
                        ctx = "".join(hlines[max(ln - 30, 0) : ln])
                        if key in ctx:
                            affected.update(qnames)
                            matched_any = True
                            break
                if not matched_any:
                    print(
                        f"window-check WARNING: module-level harness.py lines "
                        f"{sorted(module_level)[:10]}... match no known fixture/SQL "
                        f"builder; review manually"
                    )
        else:
            hits = {q for q, mods in deps.items() if rel in mods}
            affected.update(hits)
            if not hits:
                print(f"window-check WARNING: {path} maps to no query; review manually")

    window = set(list(harness.queries())[:50])
    missing = sorted(affected - window)
    if missing:
        if len(affected) > 50:
            # r14-opt: a module-wide optimization round can touch more
            # queries than the window holds (93 this round — the
            # cosine/dedup/ranking modules sit under half the
            # registry), so containment is unsatisfiable. The
            # strongest satisfiable form of the policy is FULL
            # PACKING: every one of the 50 slots must be spent on a
            # touched query, and the overflow is printed as recorded
            # rotation debt for the next round's front-load.
            unused = sorted(window - affected)
            if unused:
                print(
                    f"window-check FAIL: {len(affected)} touched queries "
                    f"overflow the 50-slot window, but these slots are "
                    f"spent on UNTOUCHED queries: {unused}\n"
                    f"Swap them for names from: {missing}"
                )
                return 1
            print(
                f"window-check OVERFLOW OK: {len(affected)} queries touched "
                f"since {since_ref[:12]} exceed the 50-slot window; window "
                f"is fully packed with touched queries.\n"
                f"ROTATION DEBT ({len(missing)} for next round): {missing}"
            )
            return 0
        print(
            f"window-check FAIL: queries touched since {since_ref[:12]} but OUTSIDE "
            f"the 50-slot driver window: {missing}\nFront-load them in harness._PRIORITY."
        )
        return 1
    print(
        f"window-check OK: {len(affected)} affected queries all inside the window "
        f"({sorted(affected)})"
    )
    return 0


def main():
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--check-window":
        sys.exit(check_window(argv[1] if len(argv) > 1 else None))
    vanilla = False
    if argv and argv[0] == "--vanilla":
        vanilla = True
        argv = argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    if vanilla:
        # driver-faithful mode: the driver runs the contract on a PLAIN
        # SparkSession (default 1g heap, no tuned configs) — this mode
        # catches bugs the tuned factory hides (e.g. the r4 fan-out
        # re-parse OOM: green under get_spark's 8g, JVM-fatal at 1g)
        import os

        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
            )
            .config("spark.ui.enabled", "false")
            .appName("selfcheck-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = harness.queries()
    oracles = harness.oracle_sql()
    failures = []

    def _hygiene():
        # session hygiene between queries (r14): streaming queries leave
        # their memory-sink tables registered for the session's lifetime
        # — ~195 queries' worth OOM'd the 1g vanilla heap late in a full
        # run (rows are already collected/compared by the time this
        # runs, so the views are dead weight). The driver's 50-query
        # gate never gets this deep, but the full-registry certification
        # should not depend on that.
        try:
            for tbl in spark.catalog.listTables():
                if tbl.isTemporary:
                    spark.catalog.dropTempView(tbl.name)
            spark.catalog.clearCache()
        except Exception:
            pass

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
            _hygiene()
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            _hygiene()
            continue
        try:
            rel = con.sql(oracles[name])
            # r11 VERDICT: the driver's checker reads oracle output via
            # Arrow, where an uncast DuckDB integer sum() (HUGEINT)
            # arrives as decimal128(38,0) and hash-mismatches Spark's
            # int64 even when every VALUE is identical — fetchall()
            # flattens it to int so value comparison can't see it.
            # Assert NO oracle emits HUGEINT/DECIMAL output columns.
            bad_types = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")
                or str(t).upper().startswith("DECIMAL")
            ]
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: ORACLE ERROR {str(e)[:300]}")
            continue
        problems = []
        if bad_types:
            problems.append(
                f"oracle output type(s) {bad_types} would arrive as Arrow "
                f"decimal128 on the driver — add an explicit CAST"
            )
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
        _hygiene()

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

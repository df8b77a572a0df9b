"""Per-job wall-clock profile of one (or more) harness queries.

Usage: python scripts/profile_query.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Runs each query twice (cold + warm) against the bench's noop-sink
methodology with the Spark event log enabled, then parses the event log
into a per-Spark-job table (duration, first stage name/callsite) so the
time of a multi-job operator (store writes, planning collects, probe
joins) is attributable job by job — the guide-§1 "measure first" step
for operators whose cost is job-count, not data volume.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_project_with_embeddings_and_vector_database_spark import get_spark, harness


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = f"/tmp/sparkevents_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = harness.queries()
    marks = []  # (query, rep, t0, t1)
    for name in names:
        for rep in range(2):
            spark.sparkContext.setJobDescription(f"{name}#rep{rep}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t1 = time.time()
            marks.append((name, rep, t0, t1))
            print(f"[profile] {name} rep{rep}: {t1 - t0:.3f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: job start/end + first stage name per job.
    # Spark 4 writes a rolling-log DIRECTORY eventlog_v2_<appid>/ with
    # events_N_<appid> part files; older layouts are a single file.
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [
            p for p in os.listdir(evdir)
            if app_id in p and not p.startswith("appstatus")
        ]
        path = os.path.join(evdir, cands[0])
    def _open(p):
        if p.endswith(".zstd"):
            import zstandard

            return zstandard.open(p, "rt")
        return open(p)

    if os.path.isdir(path):
        lines = []
        for part in sorted(os.listdir(path)):
            if part.startswith("events_"):
                with _open(os.path.join(path, part)) as fh:
                    lines.extend(fh)
    else:
        with _open(path) as fh:
            lines = list(fh)
    jobs = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description", "")
                stages = ev.get("Stage Infos") or []
                sname = stages[-1]["Stage Name"] if stages else ""
                jobs[jid] = {
                    "t0": ev["Submission Time"] / 1000.0,
                    "desc": desc,
                    "stage": sname,
                    "nstages": len(stages),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"] / 1000.0

    for name, rep, t0, t1 in marks:
        tag = f"{name}#rep{rep}"
        # streaming micro-batches run on their own threads and do not
        # inherit the thread-local description — attribute by time
        # window instead (all reps run sequentially, so it's exact)
        all_tags = {f"{n}#rep{r}" for n, r, _, _ in marks}
        mine = [
            (jid, j) for jid, j in sorted(jobs.items())
            if "t1" in j
            and (
                j.get("desc") == tag
                or (j.get("desc") not in all_tags and t0 <= j["t0"] <= t1)
            )
        ]
        total_jobs = sum(j["t1"] - j["t0"] for _, j in mine)
        print(f"\n=== {tag}: wall {t1 - t0:.3f}s, {len(mine)} jobs, "
              f"sum(job) {total_jobs:.3f}s, gap {t1 - t0 - total_jobs:.3f}s")
        prev_end = t0
        for jid, j in mine:
            idle = j["t0"] - prev_end
            prev_end = j["t1"]
            print(f"  job {jid:4d} {j['t1'] - j['t0']:7.3f}s  "
                  f"(+{idle:6.3f}s idle) [{j['nstages']}st] {j['stage'][:90]}")


if __name__ == "__main__":
    main()

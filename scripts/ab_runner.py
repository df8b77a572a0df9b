import sys, os, json, time
tree, sf, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = sys.argv[4:]
os.chdir(tree); sys.path.insert(0, tree)
from rag_project_with_embeddings_and_vector_database_spark import get_spark, harness
spark = get_spark("ab")
qs = harness.queries()
harness._t(spark, sf, "documents").count()  # warm scan
out = {}
for n in names:
    ts = []
    for _ in range(reps):
        t0 = time.time()
        qs[n](spark, sf).write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 2))
    out[n] = ts
print("ABRESULT " + json.dumps({"tree": os.path.basename(tree), "queries": out}), flush=True)

# Usage (the interleaved checkout A/B discipline — SCALING.md "Round 11"):
#   git worktree add .ab_rN <round-boundary-sha>
#   for i in 1 2; do
#     python scripts/ab_runner.py /root/repo/.ab_rN /root/testdata/sf0.1 3 q1 q2 ...
#     python scripts/ab_runner.py /root/repo       /root/testdata/sf0.1 3 q1 q2 ...
#   done
#   git worktree remove --force .ab_rN
# Compare per-tree min-of-reps; same-box alternation cancels ambient drift.

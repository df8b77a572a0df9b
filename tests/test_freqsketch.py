"""Relational Count-Min sketch pins (operators/freqsketch.py — r12;
registration queued for the r13 window): exact mergeability (counter
addition IS the merge), the one-sided never-undercount guarantee, the
paper's overestimate bound on a fixture far from it, heavy-hitter
no-false-negatives, and cross-engine hash parity (the whole sketch
replays in DuckDB — the property binary sketches cannot offer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    freqsketch as CM,
)


@pytest.fixture(scope="module")
def stream(spark):
    # skewed occurrence stream: value v_k appears ~1200/(k+1) times
    # (zipf-ish head), 60 distinct values, 2 groups
    return spark.range(6000).selectExpr(
        "id % 2 AS g",
        "concat('v_', CAST(CAST(floor(sqrt(id % 3000)) AS BIGINT) % 60 AS STRING)) AS v",
    )


def _counters(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_build_on_union_bitwise(spark, stream):
    """rollup(build(A) ∪ build(B)) == build(A ∪ B) EXACTLY — counter
    addition is the CMS merge, with no randomness to blur it."""
    a = stream.filter(F.col("id") < 2500).drop("id")
    b = stream.filter(F.col("id") >= 2500).drop("id")
    merged = CM.cms_rollup(
        CM.cms_build(a, "v", ["g"]).unionByName(CM.cms_build(b, "v", ["g"])),
        ["g"],
    )
    direct = CM.cms_build(stream.drop("id"), "v", ["g"])
    assert _counters(merged) == _counters(direct)


def test_rollup_to_total_equals_ungrouped_build(spark, stream):
    total = CM.cms_rollup(CM.cms_build(stream, "v", ["g"]), [])
    direct = CM.cms_build(stream, "v", [])
    assert _counters(total) == _counters(direct)


def test_estimates_never_undercount_and_hit_eps_bound(spark, stream):
    """The hard one-sided guarantee must hold for EVERY value, and at
    width=2048 over 6000 occurrences the eps bound (e/w * N ≈ 8) holds
    with overwhelming margin for depth=4."""
    sk = CM.cms_build(stream, "v", ["g"])
    audit = CM.cms_error_audit(stream, sk, "v", ["g"]).collect()
    assert len(audit) > 0
    bad_under = [r for r in audit if not r.never_undercounts]
    assert bad_under == [], bad_under
    bad_eps = [r for r in audit if not r.within_eps]
    assert bad_eps == [], bad_eps


def test_exact_in_collision_free_regime(spark, stream):
    """60 distinct values in a 2048-wide row collide rarely; with
    depth=4 the min across rows is EXACT for this fixture — the CMS
    sparse-regime analogue of the Theta/HLL exactness pins."""
    sk = CM.cms_build(stream, "v", ["g"])
    audit = CM.cms_error_audit(stream, sk, "v", ["g"]).collect()
    exact = sum(1 for r in audit if r.est == r.true_cnt)
    assert exact == len(audit), [
        (r.v, r.true_cnt, r.est) for r in audit if r.est != r.true_cnt
    ][:5]


def test_absent_value_estimates_zero(spark, stream):
    sk = CM.cms_build(stream, "v", ["g"])
    items = spark.createDataFrame([(0, "never_seen")], ["g", "v"])
    got = CM.cms_point_query(sk, items, "v", ["g"]).collect()
    assert got[0]["est"] == 0


def test_heavy_hitters_no_false_negatives(spark, stream):
    """Every TRUE >= phi*N value must appear in the candidate set (the
    one-sided bound makes misses impossible; extras are allowed)."""
    phi = 0.02
    sk = CM.cms_rollup(CM.cms_build(stream, "v", ["g"]), [])
    got = {
        r.v for r in CM.cms_heavy_hitters(stream, sk, "v", phi).collect()
    }
    n = stream.count()
    true_heavy = {
        r.v
        for r in stream.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
        if r.c >= phi * n
    }
    assert true_heavy, "fixture must contain heavy hitters"
    assert true_heavy <= got, true_heavy - got


def test_sketch_replays_bit_for_bit_in_duckdb(spark, stream):
    """The whole counter table must be reproducible by DuckDB from the
    same rows — the portable-md5 bucket hash makes the CMS a
    HASH-ORACLE-ABLE sketch (the r13 registration contract)."""
    import duckdb

    rows = stream.select("g", "v").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g BIGINT, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(r.g, r.v) for r in rows])
    depth, width, seed = 4, 2048, 7
    probes = " UNION ALL ".join(
        f"SELECT g, {i} AS depth, "
        f"('0x' || substr(md5(v || chr(31) || '{seed * 1000 + i}'), 1, 15))::BIGINT "
        f"% {width} AS bucket FROM t"
        for i in range(depth)
    )
    duck = con.execute(
        f"SELECT g, depth, bucket, count(*)::BIGINT AS cnt FROM ({probes}) "
        "GROUP BY g, depth, bucket"
    ).fetchall()
    got = _counters(CM.cms_build(stream, "v", ["g"]))
    assert sorted(duck) == got


def test_store_day2_roundtrip_and_idempotent_retry(spark, stream, tmp_path):
    """Stored CMS: day-1 + day-2 batches through the parquet store
    must equal the direct build over the union bit-for-bit, and
    REPLAYING a batch write (the crash-retry shape) must change
    nothing — counter rows are additive, so idempotence has to come
    from the batch key, not from blind appends."""
    path = str(tmp_path / "cms_store")
    day1 = stream.filter(F.col("id") < 3000).drop("id")
    day2 = stream.filter(F.col("id") >= 3000).drop("id")
    CM.write_cms_store(CM.cms_build(day1, "v", ["g"]), path, "d1")
    CM.write_cms_store(CM.cms_build(day2, "v", ["g"]), path, "d2")
    direct = _counters(CM.cms_build(stream.drop("id"), "v", ["g"]))
    assert _counters(CM.read_cms_store(spark, path, ["g"])) == direct
    # retry day-2 (same batch id): store must be unchanged
    CM.write_cms_store(CM.cms_build(day2, "v", ["g"]), path, "d2")
    assert _counters(CM.read_cms_store(spark, path, ["g"])) == direct

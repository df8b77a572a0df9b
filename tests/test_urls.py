"""URL normalization / registered-domain / domain-cap pins
(operators/urls.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    urls as U,
)


def _norm(spark, *urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    rows = U.url_normalize_table(df).orderBy("doc_id").collect()
    return [r.url_norm for r in rows], [r.registered_domain for r in rows]


def test_normalization_steps(spark):
    norms, _ = _norm(
        spark,
        "HTTP://WWW.Example.COM:80/Path/1/?utm_source=x&b=2&a=1#frag",
        "https://site.org:443/x",
        "https://site.org:8443/x",          # non-default port survives
        "https://a.net/deep/path/",          # trailing slash dropped
        "https://a.net/",                    # root slash kept
        "http://h.io/p?a=1&b=2",
        "http://h.io/p?b=2&a=1",             # param order canonicalized
        "http://h.io/p?utm_campaign=z",      # query emptied -> no '?'
    )
    assert norms[0] == "http://example.com/Path/1?a=1&b=2"
    assert norms[1] == "https://site.org/x"
    assert norms[2] == "https://site.org:8443/x"
    assert norms[3] == "https://a.net/deep/path"
    assert norms[4] == "https://a.net/"
    assert norms[5] == norms[6] == "http://h.io/p?a=1&b=2"
    assert norms[7] == "http://h.io/p"


def test_null_url_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, url string")
    r = U.url_normalize_table(df).collect()[0]
    assert r.url_norm is None
    assert r.registered_domain is None


def test_poison_rows_degrade_instead_of_crashing(spark):
    """ADVICE r10: single-label hosts and scheme-less/malformed/empty
    URLs split to a 1-element label list, and the old ``_n - 1``
    indexing evaluated try_element_at index 0 — one poison row aborted
    the whole job (INVALID_INDEX_OF_ZERO). They must degrade to the
    lone label (or '') with every well-formed row unaffected."""
    norms, doms = _norm(
        spark,
        "http://localhost/x",
        "HTTP://Localhost:80/health?utm_source=x&b=2",
        "not a url",
        "relative/path.html",
        "",
        "https://ok.example.com/x",
    )
    assert norms[0] == "http://localhost/x"
    assert norms[1] == "http://localhost/health?b=2"
    assert doms[0] == doms[1] == "localhost"
    assert norms[2] == "not a url" and doms[2] == ""
    assert norms[3] == "relative/path.html" and doms[3] == ""
    assert norms[4] == "" and doms[4] == ""
    assert doms[5] == "example.com"


def test_registered_domain_psl_subset(spark):
    _, doms = _norm(
        spark,
        "https://news.bbc.co.uk/x",
        "https://a.b.example.com/x",
        "https://example.com/x",
        "https://blog.shop.com.au/x",
    )
    assert doms == ["bbc.co.uk", "example.com", "example.com", "shop.com.au"]


def test_domain_cap_and_url_dup(spark):
    rows = [(i, f"https://host.com/page/{i % 4}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = U.domain_cap(U.url_normalize_table(df), max_per_domain=5).collect()
    kept = [r.doc_id for r in out if r.kept]
    assert len(kept) == 5  # quota enforced on the single domain
    # exactly 4 distinct normalized urls -> 8 rows flagged as dups,
    # never the smallest doc_id of a url group
    dups = sorted(r.doc_id for r in out if r.url_dup)
    assert len(dups) == 8 and 0 not in dups and 1 not in dups
    # determinism under repartitioning
    out2 = (
        U.domain_cap(U.url_normalize_table(df.repartition(7)), max_per_domain=5)
        .collect()
    )
    assert sorted((r.doc_id, r.kept, r.url_dup) for r in out) == sorted(
        (r.doc_id, r.kept, r.url_dup) for r in out2
    )


def test_normalization_is_scan_local(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    plan = (
        U.url_normalize_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_normalization_is_idempotent_over_adversarial_inputs(spark):
    """normalize(normalize(x)) == normalize(x) — the canonical
    normalization property, swept over crafted adversarial inputs AND
    a seeded compositional family (every combination of scheme case,
    www, default/explicit port, path shape, tracking/real params,
    fragment), in ONE DataFrame pass: the already-normalized column is
    re-normalized and any row where the two disagree fails with its
    input named."""
    import itertools

    crafted = [
        "HTTP://WWW.Example.COM:80/Path//x/?utm_source=a&b=2&a=1#f",
        "https://www.WWW.example.co.uk:443/?ref=x",
        "http://localhost:80/",
        "http://localhost/x/",
        "https://a.b.c.d.example.com.au/deep/path/?z=1&y=2&utm_a=3",
        "ftp://Mixed.Case.Host/Path",
        "not a url", "", "  ", "relative/p.html", "?just=query",
        "https://h.io/p?&&&", "https://h.io/p?a=1&a=1&A=1",
        "http://h.io:8080/p/", "https://h.io/#only-fragment",
        "https://h.io/p?utm_=1", "https://h.io//",
    ]
    parts = itertools.product(
        ["http://", "HTTPS://"], ["", "www."], ["Example7.com", "Host.co.uk"],
        ["", ":80", ":443", ":9090"], ["/", "/A/b/", "/A/b"],
        ["", "?b=2&a=1", "?utm_x=1&k=v", "?utm_only=1"], ["", "#frag"],
    )
    urls = crafted + ["".join(p) for p in parts]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = U.url_normalize_table(df).select(
        "doc_id", F.col("url").alias("orig"),
        F.col("url_norm").alias("n1"), F.col("registered_domain").alias("d1"),
    )
    twice = U.url_normalize_table(
        once.select("doc_id", F.col("n1").alias("url"))
    ).select("doc_id", F.col("url_norm").alias("n2"),
             F.col("registered_domain").alias("d2"))
    bad = (
        once.join(twice, "doc_id")
        .filter((F.col("n1") != F.col("n2")) | (F.col("d1") != F.col("d2")))
        .collect()
    )
    assert not bad, bad[:5]

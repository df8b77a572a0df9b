"""Idempotence property sweeps (VERDICT r11 item 6): the r11
``url_normalize`` sweep (f∘f == f over a compositional input family,
ONE DataFrame pass) caught a real www-strip bug for ~30 lines of test
— this file applies the same pattern to the repo's other normalizers.

- ``functions/text.preprocess`` (trim + whitespace collapse): must be
  idempotent on EVERY input.
- ``operators/boilerplate.strip_frequent_segments``: stripping the
  survivors again must be a no-op — a surviving segment's distinct-doc
  count can only shrink after a strip, so nothing new may qualify.
- ``functions/html.html_to_text``: idempotent exactly on the domain
  where its output carries no markup-significant characters; entity
  decoding is INHERENTLY non-idempotent where the decoded text itself
  looks like markup (``&lt;b&gt;`` decodes to ``<b>``, which a second
  pass would strip as a tag) — those documented exceptions are pinned
  to exact values instead of skipped.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.functions import (
    html as HF,
    text as TX,
)
from rag_project_with_embeddings_and_vector_database_spark.operators import (
    boilerplate as BP,
)


def test_preprocess_idempotent_on_whitespace_poison_family(spark):
    """f∘f == f for trim+collapse over a compositional whitespace
    family: every combination of (leading run) x (interior run) x
    (trailing run) x (exotic separators), one DataFrame pass."""
    runs = ["", " ", "  ", "\t", "\n", "\r\n", " \t \n ", ""]
    words = ["a", "a b", "a  b\tc", "", " ", "x y", "ümlaut ß"]
    rows = [
        (lead + w + sep + w2 + trail,)
        for lead in runs
        for trail in runs
        for sep in runs
        for w in words[:4]
        for w2 in words
    ]
    df = spark.createDataFrame(rows, "s string")
    once = TX.preprocess(F.col("s"))
    bad = (
        df.select(once.alias("f1"), TX.preprocess(once).alias("f2"))
        .filter(F.col("f1") != F.col("f2"))
        .limit(5)
        .collect()
    )
    assert bad == [], f"preprocess not idempotent on: {bad}"


def test_strip_frequent_segments_idempotent(spark):
    """Stripping survivors twice is a no-op: after one pass a
    segment's distinct-doc frequency can only have SHRUNK, so the
    second pass's frequent set is a subset of the first's — already
    removed. Fixture mixes shared boilerplate lines (stripped), lines
    duplicated WITHIN one doc (kept: distinct-doc count is 1),
    whitespace-decorated variants of the same trimmed segment
    (stripped together — _segments trims before counting), and
    all-boilerplate docs (must come back as '' both times)."""
    docs = [
        (0, "subscribe now\nreal content zero\nsubscribe now"),
        (1, "  subscribe now \nunique line one\ncookie notice"),
        (2, "cookie notice\nunique line two\nrepeated inside\nrepeated inside"),
        (3, "subscribe now\ncookie notice"),
        (4, ""),
        (5, "solo document five"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = BP.strip_frequent_segments(df).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = BP.strip_frequent_segments(once).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    got1 = dict(once.collect())
    got2 = dict(twice.collect())
    assert got1 == got2, f"strip_frequent_segments not idempotent: {got1} vs {got2}"
    # and the first pass did what the fixture plants
    assert got1[0] == "real content zero"
    assert got1[2] == "unique line two\nrepeated inside\nrepeated inside"
    assert got1[3] == "" and got1[4] == ""


def test_html_to_text_idempotent_on_markup_free_output(spark):
    """f∘f == f wherever f's output carries no '<' or '&' — the
    compositional family covers comments, nested/unclosed boilerplate
    blocks, tag soup, entities, and whitespace chaos. Rows whose
    output still contains markup-significant characters are the
    documented non-idempotent domain, pinned separately below."""
    frags = [
        "plain words",
        "<b>bold</b> tail",
        "<!-- comment --> kept",
        "<script>var x = 1;</script>after",
        "<nav><ul><li>menu</li></ul></nav>body",
        "<div class='a'>block</div>",
        "a &nbsp; b",
        "q &quot;quoted&quot;",
        "x &#39;y&apos;",
        "<style>p{}</style>text",
        "broken <tag",
        "unclosed <script>alert(1) rest",
        "  spaced\t\nout  ",
    ]
    rows = [(a + " " + b,) for a in frags for b in frags]
    df = spark.createDataFrame(rows, "h string")
    once = HF.html_to_text(F.col("h"))
    checked = df.select(
        F.col("h"),
        once.alias("f1"),
        HF.html_to_text(once).alias("f2"),
    )
    # idempotent domain: output free of markup-significant chars
    bad = (
        checked.filter(~F.col("f1").rlike("[<&]"))
        .filter(F.col("f1") != F.col("f2"))
        .limit(5)
        .collect()
    )
    assert bad == [], f"html_to_text not idempotent on markup-free output: {bad}"
    # every non-idempotent row must owe it to residual '<'/'&' in the
    # output (decoded entities / genuinely broken tags) — no other
    # escape hatch exists
    stray = (
        checked.filter(F.col("f1") != F.col("f2"))
        .filter(~F.col("f1").rlike("[<&]"))
        .count()
    )
    assert stray == 0


def test_html_to_text_documented_non_idempotent_exemplars(spark):
    """The entity-decode exceptions, pinned to EXACT values (stronger
    than excluding them): double-encoded entities decode one layer per
    pass — the HTML-correct behavior — and decoded ``&lt;…&gt;`` text
    that now LOOKS like a tag is stripped by a second pass."""
    rows = [
        # (input, expected f1, expected f2)
        ("&amp;lt;", "&lt;", "<"),
        ("&amp;amp;", "&amp;", "&"),
        ("&lt;b&gt;bold&lt;/b&gt;", "<b>bold</b>", "bold"),
        ("a &amp; b", "a & b", "a & b"),  # single decode IS stable
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "h string")
    once = HF.html_to_text(F.col("h"))
    got = (
        df.select("h", once.alias("f1"), HF.html_to_text(once).alias("f2"))
        .collect()
    )
    want = {r[0]: (r[1], r[2]) for r in rows}
    for r in got:
        assert (r.f1, r.f2) == want[r.h], f"{r.h!r}: {(r.f1, r.f2)}"

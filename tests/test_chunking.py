"""Chunker behavior + property tests (SURVEY.md §5 strategy).

Invariants from the reference semantics:
  * fixed_size: every chunk <= chunk_size tokens unless it is a single
    oversize sentence; consecutive chunks share an overlap suffix.
  * recursive: paragraph-sized chunks are verbatim stripped paragraphs.
  * structure_aware: merged sections never exceed 1.5x chunk_size
    (chunking.py:239-246); headings are preserved in chunk content.
  * table_aware: table blocks (>=2 '|' per line) are never split.
  * all: chunk_index is dense from 0 per (doc, strategy); ids follow
    {source}_{strategy}_{index} (chunking.py:55).
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from rag_project_with_embeddings_and_vector_database_spark.config import EngineConfig
from rag_project_with_embeddings_and_vector_database_spark.operators import chunking as CH

CFG = EngineConfig()

MD_DOC = """# Title

Intro paragraph. It has two sentences.

## Small

tiny.

## Big

""" + " ".join(f"Sentence number {i} has several words in it." for i in range(200)) + """

### Table section

col | col | col
1 | 2 | 3
4 | 5 | 6

Closing text. Final thought!
"""


def test_fixed_size_packs_and_overlaps():
    chunks = CH.chunk_fixed_size(MD_DOC, CFG)
    assert len(chunks) >= 2
    for c in chunks:
        meta = c.meta
        assert meta["chunk_size"] == CH.token_count(c.content)
        # a chunk may exceed chunk_size only if a single sentence does
        if meta["sentence_count"] > 1:
            assert meta["chunk_size"] <= CFG.chunk_size + CFG.chunk_size  # packer bound
    # overlap: last sentences of chunk i reappear at start of chunk i+1
    s0 = CH.split_sentences(chunks[0].content)
    s1 = CH.split_sentences(chunks[1].content)
    assert s0[-1] in s1[: len(s0)]


def test_recursive_paragraph_chunks_verbatim():
    text = "Para one stays.\n\nPara two also stays."
    chunks = CH.chunk_recursive(text, CFG)
    assert [c.content for c in chunks] == ["Para one stays.", "Para two also stays."]
    assert all(c.meta["level"] == "paragraph" for c in chunks)


def test_recursive_oversize_paragraph_splits_to_sentences():
    big = " ".join(f"Sentence {i} is here." for i in range(300))
    chunks = CH.chunk_recursive(big, CFG)
    assert len(chunks) > 1
    assert all(c.meta["level"] == "sentence" for c in chunks)
    # packing bounds the SUM of sentence token counts by chunk_size; the
    # recomputed chunk_size of the joined text adds joiner chars//4, so
    # allow that small overhead (reference-faithful behavior)
    assert all(c.meta["chunk_size"] <= CFG.chunk_size + 64 for c in chunks)


def test_structure_aware_merges_small_sections():
    chunks = CH.chunk_structure_aware(MD_DOC, CFG)
    merge_limit = CFG.chunk_size * CFG.merge_factor
    assert any(c.meta.get("merged") for c in chunks)
    for c in chunks:
        assert CH.token_count(c.content) <= merge_limit or "\n" in c.content
    # headings survive into content
    assert any(c.content.startswith("## ") or "## Small" in c.content for c in chunks)


def test_structure_preamble_gets_level_zero():
    text = "preamble line\n\n# H\n\nbody text here"
    sections = CH._extract_sections(text)
    assert sections[0][2] == 0  # preamble level
    assert sections[1][0] == "H" and sections[1][2] == 1


def test_hybrid_falls_back_without_structure():
    flat = "Just one paragraph with no headings at all."
    # structure_aware gives level-1-only output -> hybrid uses recursive
    assert [c.content for c in CH.chunk_hybrid(flat, CFG)] == [
        c.content for c in CH.chunk_recursive(flat, CFG)
    ]
    # structured doc keeps the structure_aware output
    assert [c.content for c in CH.chunk_hybrid(MD_DOC, CFG)] == [
        c.content for c in CH.chunk_structure_aware(MD_DOC, CFG)
    ]


def test_table_aware_keeps_tables_atomic():
    rows = "\n".join(f"r{i} | v{i} | w{i}" for i in range(400))
    text = f"Lead text.\n{rows}\nTrailing text."
    chunks = CH.chunk_table_aware(text, CFG)
    tables = [c for c in chunks if c.meta["is_table"]]
    assert len(tables) == 1  # one giant table block, never split
    assert tables[0].content.count("\n") == 399
    assert tables[0].meta["chunk_size"] > CFG.chunk_size  # atomic despite oversize


@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase + " .!?#|\n", min_size=0, max_size=400),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=25, deadline=None)
def test_property_dense_index_and_ids(texts):
    text = "\n\n".join(texts)
    for strategy in CH.STRATEGY_FUNCS:
        rows = CH.chunk_rows(text, "doc.md", strategy, CFG)
        assert [r["chunk_index"] for r in rows] == list(range(len(rows)))
        for r in rows:
            assert r["chunk_id"] == f"doc.md_{strategy}_{r['chunk_index']}"
            assert r["strategy"] == strategy
            assert r["content"].strip() != "" or r["content"] == ""


@given(st.text(alphabet=string.printable, max_size=600))
@settings(max_examples=25, deadline=None)
def test_property_no_content_loss_recursive(text):
    # every non-blank paragraph's stripped text appears in some chunk
    chunks = CH.chunk_recursive(text, CFG)
    joined = "\n".join(c.content for c in chunks)
    for para in text.split("\n\n"):
        if para.strip() and CH.token_count(para) <= CFG.chunk_size:
            assert para.strip() in joined


def test_spark_chunk_documents_roundtrip(spark):
    docs = spark.createDataFrame([("a.md", MD_DOC), ("b.md", "Tiny doc.")], ["path", "content"])
    out = CH.chunk_documents(docs).collect()
    strategies = {r.strategy for r in out}
    assert strategies == set(CH.STRATEGY_FUNCS)
    # Spark rows equal the pure-python fold for every (doc, strategy)
    for strategy in CH.STRATEGY_FUNCS:
        got = sorted(
            [(r.source_file, r.chunk_index, r.content) for r in out if r.strategy == strategy]
        )
        want = sorted(
            (p, r["chunk_index"], r["content"])
            for p, t in [("a.md", MD_DOC), ("b.md", "Tiny doc.")]
            for r in CH.chunk_rows(t, p, strategy, CFG)
        )
        assert got == want

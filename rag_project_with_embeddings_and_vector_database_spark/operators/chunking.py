"""The five chunking strategies (SURVEY.md §2.3 C0-C7).

Behavioral parity with the reference chunkers
(/root/reference/src/chunking.py):

  fixed_size       — greedy sentence packing to <=512 tokens with a >=100
                     token sentence-suffix overlap carried back
                     (chunking.py:28-106).
  recursive        — paragraph split on '\\n\\n'; oversize paragraphs
                     sentence-packed without overlap (chunking.py:109-213).
  structure_aware  — markdown-heading sections; <100-token sections merge
                     into the previous chunk up to 1.5x chunk_size;
                     oversize sections sentence-split with the heading
                     prepended (chunking.py:216-344).
  hybrid           — structure_aware unless >50 chunks or no real
                     hierarchy, else recursive; rebranded ids
                     (chunking.py:347-380).
  table_aware      — alternating table/non-table line blocks (a line is
                     "table" iff it contains >=2 '|'); tables stay atomic
                     (chunking.py:383-501).

Execution model: each strategy is an order-dependent per-document fold, so
it runs as pure Python over one document inside an Arrow-batched pandas
UDF returning ``array<struct>``, then ``posexplode`` — a UDTF-shaped
flatMap. One document = one row; no shuffle is introduced (the fold never
crosses documents), so the operator scales embarrassingly-parallel with
input partitions. The paragraph branch of ``recursive`` and the island
detection of ``table_aware`` also exist as pure-SQL equivalents in the
harness (chunk_recursive_para / chunk_table_islands) for oracle checking.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EngineConfig

_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_HEADING_RE = re.compile(r"^(#{1,3})\s+(.+)$")


def token_count(text: str) -> int:
    """words + chars//4 (reference utils.py:30-35)."""
    return len(text.split()) + len(text) // 4


def split_sentences(text: str) -> list[str]:
    """Sentence segmentation, stripped + de-blanked (reference
    chunking.py:102-106 — used by fixed_size and recursive)."""
    return [s.strip() for s in _SENT_RE.split(text) if s.strip()]


def split_sentences_raw(text: str) -> list[str]:
    """Raw sentence segmentation (reference chunking.py:249,423 — the
    structure_aware and table_aware oversize branches split WITHOUT
    stripping, so leading newlines stay attached to sentences and empty
    tails survive; chunk text is stripped only at emission)."""
    return _SENT_RE.split(text)


@dataclass
class _Chunk:
    content: str
    meta: dict = field(default_factory=dict)


def _pack_sentences(
    sentences: Iterable[str],
    limit: int,
    joiner: str = " ",
    seed: list[str] | None = None,
    overlap: int = 0,
) -> list[list[str]]:
    """Greedy sentence packer shared by all strategies. Returns groups of
    sentences; ``overlap > 0`` carries back a sentence suffix totalling at
    least ``overlap`` tokens (fixed_size behavior, chunking.py:68-77)."""
    groups: list[list[str]] = []
    cur: list[str] = list(seed or [])
    cur_tokens = token_count(joiner.join(cur)) if cur else 0
    for s in sentences:
        s_tokens = token_count(s)
        if cur and cur_tokens + s_tokens > limit:
            groups.append(cur)
            if overlap > 0:
                kept: list[str] = []
                kept_tokens = 0
                for prev in reversed(cur):
                    kept_tokens += token_count(prev)
                    kept.insert(0, prev)
                    if kept_tokens >= overlap:
                        break
                cur, cur_tokens = kept, kept_tokens
            else:
                cur, cur_tokens = [], 0
        cur.append(s)
        cur_tokens += s_tokens
    if cur:
        groups.append(cur)
    return groups


# ---------------------------------------------------------------------------
# Per-document strategy folds (pure functions: str -> list[_Chunk])
# ---------------------------------------------------------------------------


def chunk_fixed_size(text: str, cfg: EngineConfig) -> list[_Chunk]:
    out = []
    for group in _pack_sentences(split_sentences(text), cfg.chunk_size, overlap=cfg.chunk_overlap):
        content = " ".join(group)
        out.append(
            _Chunk(content, {"chunk_size": token_count(content), "sentence_count": len(group)})
        )
    return out


def chunk_recursive(text: str, cfg: EngineConfig) -> list[_Chunk]:
    out = []
    for para in text.split("\n\n"):
        if not para.strip():
            continue
        para_tokens = token_count(para)
        if para_tokens <= cfg.chunk_size:
            out.append(_Chunk(para.strip(), {"chunk_size": para_tokens, "level": "paragraph"}))
        else:
            for group in _pack_sentences(split_sentences(para), cfg.chunk_size):
                content = " ".join(group)
                out.append(
                    _Chunk(
                        content,
                        {
                            "chunk_size": token_count(content),
                            "level": "sentence",
                            "sentence_count": len(group),
                        },
                    )
                )
    return out


def _extract_sections(text: str) -> list[tuple[str, str, int]]:
    """(heading, content, level) triples; preamble before the first
    heading gets level 0 (chunking.py:317-344)."""
    sections: list[tuple[str, str, int]] = []
    heading, level = None, 0
    content: list[str] = []
    for line in text.split("\n"):
        m = _HEADING_RE.match(line)
        if m:
            if content:
                sections.append((heading or "", "\n".join(content), level))
            level = len(m.group(1))
            heading = m.group(2)
            content = []
        else:
            content.append(line)
    if content:
        sections.append((heading or "", "\n".join(content), level or 1))
    return sections if sections else [("", text, 1)]


def chunk_structure_aware(text: str, cfg: EngineConfig) -> list[_Chunk]:
    out: list[_Chunk] = []
    merge_limit = int(cfg.chunk_size * cfg.merge_factor)
    for heading, content, level in _extract_sections(text):
        if not content.strip():
            continue
        content_tokens = token_count(content)
        heading_str = f"{'#' * level} {heading}" if heading else ""

        if content_tokens < cfg.min_chunk_size and out and heading:
            merged = f"{out[-1].content}\n\n{heading_str}\n{content}"
            if token_count(merged) <= merge_limit:
                out[-1].content = merged
                out[-1].meta["merged"] = True
                continue

        if content_tokens > cfg.chunk_size:
            seed = [heading_str] if heading else []
            for group in _pack_sentences(split_sentences_raw(content), cfg.chunk_size, joiner="\n", seed=seed):
                chunk_text = "\n".join(group).strip()
                out.append(
                    _Chunk(
                        chunk_text,
                        {"chunk_size": token_count(chunk_text), "heading": heading, "level": level},
                    )
                )
        else:
            chunk_text = f"{heading_str}\n{content}".strip()
            out.append(
                _Chunk(chunk_text, {"chunk_size": content_tokens, "heading": heading, "level": level})
            )
    return out


def chunk_hybrid(text: str, cfg: EngineConfig) -> list[_Chunk]:
    structured = chunk_structure_aware(text, cfg)
    if len(structured) > 50 or all(c.meta.get("level", 1) == 1 for c in structured):
        return chunk_recursive(text, cfg)
    return structured


def _split_table_blocks(text: str) -> list[tuple[bool, str]]:
    """Alternating (is_table, block) runs — the gaps-and-islands
    segmentation (chunking.py:473-501)."""
    blocks: list[tuple[bool, str]] = []
    cur: list[str] = []
    in_table = False
    for line in text.split("\n"):
        line_is_table = line.count("|") >= 2
        if line_is_table != in_table:
            if cur:
                blocks.append((in_table, "\n".join(cur)))
                cur = []
            in_table = line_is_table
        cur.append(line)
    if cur:
        blocks.append((in_table, "\n".join(cur)))
    return blocks


def chunk_table_aware(text: str, cfg: EngineConfig) -> list[_Chunk]:
    out = []
    for is_table, content in _split_table_blocks(text):
        if not content.strip():
            continue
        content_tokens = token_count(content)
        if is_table or content_tokens <= cfg.chunk_size:
            out.append(
                _Chunk(
                    content,
                    {
                        "chunk_size": content_tokens,
                        "is_table": is_table,
                        "chunk_type": "table" if is_table else "text",
                    },
                )
            )
        else:
            for group in _pack_sentences(split_sentences_raw(content), cfg.chunk_size):
                chunk_text = " ".join(group)
                out.append(
                    _Chunk(
                        chunk_text,
                        {
                            "chunk_size": token_count(chunk_text),
                            "is_table": False,
                            "chunk_type": "text",
                        },
                    )
                )
    return out


STRATEGY_FUNCS: dict[str, Callable[[str, EngineConfig], list[_Chunk]]] = {
    "fixed_size": chunk_fixed_size,
    "recursive": chunk_recursive,
    "structure_aware": chunk_structure_aware,
    "hybrid": chunk_hybrid,
    "table_aware": chunk_table_aware,
}

CHUNK_STRUCT = T.StructType(
    [
        T.StructField("chunk_id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("strategy", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _meta_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return "" if v is None else str(v)


def chunk_rows(
    text: str,
    source_file: str,
    strategy: str,
    cfg: EngineConfig,
    fn: Callable[[str, EngineConfig], list[_Chunk]] | None = None,
) -> list[dict]:
    """Finished chunk rows with reference-format ids
    ``{source}_{strategy}_{index}`` (chunking.py:55)."""
    fn = fn or STRATEGY_FUNCS[strategy]
    return [
        {
            "chunk_id": f"{source_file}_{strategy}_{i}",
            "content": c.content,
            "source_file": source_file,
            "chunk_index": i,
            "strategy": strategy,
            "metadata": {k: _meta_str(v) for k, v in c.meta.items()},
        }
        for i, c in enumerate(fn(text, cfg))
    ]


def chunker_udf(strategy: str, cfg: EngineConfig | None = None):
    """Arrow-batched pandas UDF: (text, source) -> array<chunk struct>.

    The strategy FUNCTION is captured by value at build time, so
    runtime-registered strategies (STRATEGY_FUNCS mutations) work even
    though executor workers import the shipped module fresh."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped()
    cfg = cfg or EngineConfig()
    fn = STRATEGY_FUNCS[strategy]

    @F.pandas_udf(T.ArrayType(CHUNK_STRUCT))
    def _udf(text: pd.Series, source: pd.Series) -> pd.Series:
        return pd.Series(
            [
                chunk_rows(t if t is not None else "", s, strategy, cfg, fn=fn)
                for t, s in zip(text, source)
            ]
        )

    return _udf


def chunk_documents(
    docs: DataFrame,
    strategies: tuple[str, ...] = tuple(STRATEGY_FUNCS),
    text_col: str = "content",
    source_col: str = "path",
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """C7 fan-out: one chunk DataFrame covering every strategy.

    Implemented as a union of per-strategy flatMaps; each branch is
    narrow (no shuffle), so Spark runs all strategies in one pass over
    the scan when the plan is materialized."""
    out = None
    for strategy in strategies:
        branch = (
            docs.select(
                F.explode(chunker_udf(strategy, cfg)(F.col(text_col), F.col(source_col))).alias("c")
            )
            .select("c.*")
        )
        out = branch if out is None else out.unionByName(branch)
    return out

"""HTML -> text extraction as native Catalyst expressions (north-star).

Web-crawl corpora arrive as HTML, and the first transform of every
training-data pipeline is tag/boilerplate stripping (what trafilatura/
jusText do with DOM heuristics; CCNet/RefinedWeb-style pipelines run a
cheap tag-strip first and push quality decisions to downstream
scorers). Here the whole extraction is a CHAIN OF regexp_replace
EXPRESSIONS — no Python UDF, no per-row parser object — so it stays
inside whole-stage codegen and scales as a pure scan-local map at any
corpus size.

Engine portability: the steps are data (``HTML_STRIP_STEPS``), applied
in order by both the Spark expression builder (``html_to_text``) and
the harness's DuckDB oracle SQL — patterns are restricted to the
Java-regex/RE2 COMMON SUBSET (inline ``(?is)`` flags, lazy
quantifiers, character classes; no lookaround, no backreferences, no
``\\x0B``-sensitive ``\\s`` edge cases), so the same strings mean the
same thing in both engines and the oracle replays extraction
bit-for-bit.

Semantics (deliberately simple and deterministic, not a DOM parser):
1. HTML comments removed;
2. boilerplate ELEMENTS removed WITH their content — script, style,
   noscript, nav, header, footer, aside (the standard chrome/junk
   set; extend per corpus);
3. every remaining tag becomes a space (block structure is then just
   whitespace — chunkers downstream re-segment on sentences anyway);
4. the common named/numeric entities decode, ``&amp;`` LAST so
   double-encoded text does not double-decode;
5. whitespace collapses to single spaces, trimmed.
Malformed HTML degrades gracefully: an unclosed boilerplate tag keeps
its content (lazy match finds no close) rather than eating the rest
of the document.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Boilerplate elements whose CONTENT is dropped along with the tags.
DROP_BLOCK_TAGS: tuple[str, ...] = (
    "script", "style", "noscript", "nav", "header", "footer", "aside",
)

#: Ordered (regex_pattern, replacement) steps; regex=False rows are
#: literal string replacements (entity decoding). Shared verbatim by
#: the Spark expression chain and the DuckDB oracle.
HTML_STRIP_STEPS: list[tuple[str, str, bool]] = (
    [("(?s)<!--.*?-->", " ", True)]
    + [(rf"(?is)<{t}\b.*?</{t}\s*>", " ", True) for t in DROP_BLOCK_TAGS]
    + [("(?s)<[^>]*>", " ", True)]
    + [
        ("&nbsp;", " ", False),
        ("&lt;", "<", False),
        ("&gt;", ">", False),
        ("&quot;", '"', False),
        ("&#39;", "'", False),
        ("&apos;", "'", False),
        ("&amp;", "&", False),  # last: no double-decode
    ]
)


def html_to_text(col: Column | str) -> Column:
    """Extract readable text from an HTML column — the codegen'd
    regexp_replace chain described in the module docstring, ending in
    whitespace collapse + trim. At 100 TB this is a pure scan-local
    projection: no shuffle, no Python, no per-row object churn."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep, is_regex in HTML_STRIP_STEPS:
        if is_regex:
            c = F.regexp_replace(c, pat, rep)
        else:
            # literal entity replacement: replace() is a plain
            # substring substitution, cheaper than a regex engine pass
            c = F.replace(c, F.lit(pat), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))

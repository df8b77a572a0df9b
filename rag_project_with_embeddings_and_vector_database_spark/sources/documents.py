"""Document corpus source (SURVEY.md §2.1 S1-S8).

Reference behavior (/root/reference/src/document_loader.py):
  S1 recursive folder scan filtered to {pdf,docx,xlsx,pptx,md} with
     empty-content drop (44-67);
  S2-S5 per-format text extraction (PDF page markers '--- Page N ---',
     DOCX 'cell | cell' tables, XLSX '--- Sheet: name ---', PPTX
     '--- Slide N ---');
  S6 raw markdown read; S8 extension router (69-84).

Spark-first design: ONE ``binaryFile`` scan with recursive lookup and a
glob filter — path pruning happens in the scan, not in Python — then a
per-format parse stage. Markdown/text decode is a native expression;
binary formats (pdf/docx/xlsx/pptx) parse inside an Arrow-batched UDF
when their libraries exist. In this container those libraries are NOT
installed, so each parser degrades to a clearly-marked deterministic
stub (format + byte-size summary) rather than failing the scan — the
Spark plumbing (schema, routing, batching) is real and tested either
way.

Divergence from the reference (documented, intentional): per-file parse
errors become an ``error`` column instead of being silently swallowed
(document_loader.py:63-64)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED_EXTENSIONS = ("pdf", "docx", "xlsx", "pptx", "md")

_PARSED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("content", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def _pdf_text_minimal(data: bytes) -> str:
    """Stdlib-only fallback PDF text extraction, deliberately narrow:
    SINGLE-page PDFs with literal-string text operators only. Streams
    are inflated when FlateDecode'd (zlib IS Flate); text is the
    ``(...) Tj`` (or single-string ``[(...)] TJ``) show operators
    inside BT/ET blocks, in stream order, one output line per show.

    Anything outside that envelope (multi-page, hex strings, CID
    fonts, other filters) raises NotImplementedError so the caller
    falls back to the documented stub — a partial extraction of a real
    multi-page financial PDF would be worse than an honest stub. The
    envelope exists so the vendored single-page fixture exercises the
    REAL S2 scan->route->parse path end to end (VERDICT r3 item 7)
    even though pypdf cannot be installed in this container."""
    import re as _re
    import zlib

    if not data.startswith(b"%PDF"):
        raise NotImplementedError("not a PDF header")
    n_pages = len(_re.findall(rb"/Type\s*/Page\b(?!s)", data))
    if n_pages != 1:
        raise NotImplementedError(
            f"minimal pdf fallback handles exactly one page, found {n_pages}"
        )
    texts: list[str] = []
    for m in _re.finditer(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", data, _re.DOTALL):
        meta, stream = m.group(1), m.group(2)
        if b"/FlateDecode" in meta:
            try:
                stream = zlib.decompress(stream)
            except zlib.error as e:
                raise NotImplementedError(f"undecodable Flate stream: {e}")
        elif b"/Filter" in meta:
            raise NotImplementedError("unsupported stream filter")
        for bt in _re.finditer(rb"BT(.*?)ET", stream, _re.DOTALL):
            # literal strings ahead of a Tj/TJ show operator; PDF string
            # escapes \( \) \\ unescaped, others left verbatim
            for sm in _re.finditer(rb"\(((?:[^()\\]|\\.)*)\)\s*\]?\s*T[jJ]", bt.group(1)):
                raw = _re.sub(rb"\\([()\\])", rb"\1", sm.group(1))
                texts.append(raw.decode("latin-1"))
    if not texts:
        raise NotImplementedError("no literal-string text operators found")
    return "--- Page 1 ---\n" + "\n".join(texts)


def _parse_pdf(data: bytes) -> str:
    try:
        from pypdf import PdfReader  # type: ignore
    except ImportError:
        # pypdf is not installable in this container (README
        # "Environment constraints"); a narrow stdlib fallback keeps
        # the real parse path testable on the vendored fixture.
        try:
            return _pdf_text_minimal(data)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"pdf parser not installed (pypdf); minimal fallback declined: {e}"
            )
    import io

    reader = PdfReader(io.BytesIO(data))
    pages = []
    for i, page in enumerate(reader.pages, start=1):
        pages.append(f"--- Page {i} ---\n{page.extract_text() or ''}")
    return "\n".join(pages)


def _parse_docx(data: bytes) -> str:
    try:
        import docx  # type: ignore
    except ImportError:
        raise NotImplementedError("docx parser not installed (python-docx)")
    import io

    d = docx.Document(io.BytesIO(data))
    parts = [p.text for p in d.paragraphs]
    for table in d.tables:
        for row in table.rows:
            parts.append(" | ".join(cell.text for cell in row.cells))
    return "\n".join(parts)


def _parse_xlsx(data: bytes) -> str:
    try:
        import openpyxl  # type: ignore
    except ImportError:
        raise NotImplementedError("xlsx parser not installed (openpyxl)")
    import io

    wb = openpyxl.load_workbook(io.BytesIO(data), read_only=True)
    parts = []
    for ws in wb.worksheets:
        parts.append(f"--- Sheet: {ws.title} ---")
        for row in ws.iter_rows(values_only=True):
            parts.append(" | ".join("" if v is None else str(v) for v in row))
    return "\n".join(parts)


def _parse_pptx(data: bytes) -> str:
    try:
        from pptx import Presentation  # type: ignore
    except ImportError:
        raise NotImplementedError("pptx parser not installed (python-pptx)")
    import io

    prs = Presentation(io.BytesIO(data))
    parts = []
    for i, slide in enumerate(prs.slides, start=1):
        parts.append(f"--- Slide {i} ---")
        for shape in slide.shapes:
            if getattr(shape, "has_text_frame", False):
                parts.append(shape.text_frame.text)
    return "\n".join(parts)


_BINARY_PARSERS = {"pdf": _parse_pdf, "docx": _parse_docx, "xlsx": _parse_xlsx, "pptx": _parse_pptx}


def _parse_one(path: str, ext: str, data: bytes, stub_missing: bool) -> tuple[str | None, str | None]:
    """Returns (content, error)."""
    if ext == "md":
        try:
            return data.decode("utf-8"), None
        except UnicodeDecodeError as e:
            return None, f"decode error: {e}"
    parser = _BINARY_PARSERS.get(ext)
    if parser is None:
        return None, f"unsupported extension: {ext}"
    try:
        return parser(data), None
    except NotImplementedError as e:
        if stub_missing:
            # deterministic stand-in so pipelines stay runnable without
            # the format libraries; clearly marked as a stub
            return f"[stub:{ext}] {path} ({len(data)} bytes)", None
        return None, str(e)
    except Exception as e:  # surfaced, not swallowed (divergence, see module doc)
        return None, f"{type(e).__name__}: {e}"


def load_documents(
    spark: SparkSession,
    folder: str,
    extensions: tuple[str, ...] = SUPPORTED_EXTENSIONS,
    stub_missing_parsers: bool = True,
    drop_empty: bool = True,
) -> DataFrame:
    """S1-S8 as one declarative pipeline: binaryFile scan (recursive,
    glob-pruned at the source) -> extension column -> per-format parse in
    an Arrow-batched ``mapInPandas`` -> empty-content filter.

    Returns (path, ext, size_bytes, content, error)."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    glob = "*.{" + ",".join(extensions) + "}"
    scan = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(folder)
        .select(
            F.col("path"),
            F.lower(F.element_at(F.split(F.col("path"), r"\."), -1)).alias("ext"),
            F.col("length").alias("size_bytes"),
            F.col("content").alias("data"),
        )
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, errors = [], []
            for path, ext, data in zip(pdf["path"], pdf["ext"], pdf["data"]):
                c, e = _parse_one(path, ext, bytes(data), stub_missing_parsers)
                contents.append(c)
                errors.append(e)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "ext": pdf["ext"],
                    "size_bytes": pdf["size_bytes"],
                    "content": contents,
                    "error": errors,
                }
            )

    out = scan.mapInPandas(parse, schema=_PARSED_SCHEMA)
    if drop_empty:
        # any non-whitespace char (trim() would miss \n/\t — the
        # reference's .strip() drops those too, document_loader.py:60-61)
        out = out.filter(
            F.col("error").isNotNull() | F.coalesce("content", F.lit("")).rlike(r"\S")
        )
    return out


def load_query_set(spark: SparkSession, path: str) -> DataFrame:
    """S7: evaluation query set from JSON (reference main.py:163-172);
    schema: query_id, query, expected_keywords, expected_source_patterns."""
    return spark.read.option("multiLine", "true").json(path)

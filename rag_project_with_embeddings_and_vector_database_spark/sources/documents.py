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
installed, so each format has a NARROW stdlib fallback (PDF: a paged
Catalog->Kids walker over Flate/raw literal-Tj content streams — it
extracts real text from the reference checkout's own text-layer
financial PDFs — with a single-page minimal parser behind it;
DOCX/XLSX/PPTX: OPC zip + XML via zipfile/ElementTree) that handles
the vendored fixture corpus for
real — and anything outside its envelope degrades to a clearly-marked
deterministic stub (format + byte-size summary) rather than failing
the scan or risking garbage partial extraction. The Spark plumbing
(schema, routing, batching) is identical on every path.

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


def _pdf_unescape(raw: bytes) -> str:
    """PDF literal-string escapes: \\( \\) \\\\ n r t plus octal
    \\ddd; unknown escapes pass the escaped byte through (spec
    behavior)."""
    import re as _re

    def sub(m: "_re.Match[bytes]") -> bytes:
        g = m.group(1)
        if g[:1].isdigit():
            return bytes([int(g, 8) & 0xFF])
        return {b"n": b"\n", b"r": b"\r", b"t": b"\t"}.get(g, g)

    return _re.sub(rb"\\([0-7]{1,3}|.)", sub, raw).decode("latin-1")


def _pdf_hex_decode(raw: bytes) -> str:
    """Hex-string show payload -> text, assuming a SIMPLE single-byte
    font encoding (the caller only enables hex decoding when the
    document has no composite /Type0 fonts, whose hex strings are
    glyph ids that would decode to garbage). Whitespace inside the hex
    is legal; an odd final digit is padded with 0 per spec."""
    h = b"".join(raw.split())
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def _pdf_parse_tounicode(stream: bytes) -> dict[int, str]:
    """Parse a /ToUnicode CMap stream into {2-byte CID -> unicode str}:
    ``beginbfchar <src> <dst>`` pairs and ``beginbfrange <lo> <hi>
    (<dstbase>|[<dst> ...])`` runs, dst hex decoded as UTF-16BE (dst
    may be multi-unit — ligatures map to multi-char strings). This is
    the mapping PyPDF2 applies to composite-font (/Type0 Identity-H)
    shows; with it, glyph-id hex strings become real text."""
    import re as _re

    def u16(h: bytes) -> str:
        if len(h) % 2:
            h += b"0"
        try:
            return bytes.fromhex(h.decode("ascii")).decode("utf-16-be", "ignore")
        except ValueError:
            return ""

    cmap: dict[int, str] = {}
    for m in _re.finditer(rb"beginbfchar(.*?)endbfchar", stream, _re.DOTALL):
        for pm in _re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]*)>", m.group(1)):
            cmap[int(pm.group(1), 16)] = u16(pm.group(2))
    for m in _re.finditer(rb"beginbfrange(.*?)endbfrange", stream, _re.DOTALL):
        for pm in _re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
            m.group(1),
            _re.DOTALL,
        ):
            lo, hi = int(pm.group(1), 16), int(pm.group(2), 16)
            if hi < lo or hi - lo > 0xFFFF:  # malformed range; bound the loop
                continue
            if pm.group(3) is not None:
                width = len(pm.group(3))
                base = int(pm.group(3), 16)
                for i in range(hi - lo + 1):
                    cmap[lo + i] = u16(format(base + i, f"0{width}x").encode())
            else:
                for i, d in enumerate(
                    _re.findall(rb"<([0-9A-Fa-f]*)>", pm.group(4))[: hi - lo + 1]
                ):
                    cmap[lo + i] = u16(d)
    return cmap


def _pdf_cids_decode(bs: bytes, cmap: dict[int, str]) -> str:
    """Show-payload bytes under an Identity-H composite font are
    big-endian 2-byte CIDs; map each through the font's ToUnicode
    CMap (unmapped CIDs contribute nothing, per extractor convention)."""
    return "".join(
        cmap.get((bs[i] << 8) | bs[i + 1], "") for i in range(0, len(bs) - 1, 2)
    )


def _pdf_stream_texts(
    obj_body: bytes,
    decode_hex: bool = True,
    fonts: dict[bytes, object] | None = None,
    cur: object = "unset",
) -> tuple[list[str], object]:
    """Text-show operators from one content-stream object: literal
    ``(...) Tj`` and hex ``<...> Tj``, one line each; ``[...] TJ``
    arrays with their string segments joined (kerning numbers
    dropped). Scanner-produced PDFs (e.g. the reference checkout's
    Canon-scanned financial filings) carry their OCR text layer as
    render-mode-3 hex shows over the page images — the same text
    PyPDF2 extracts from them.

    Font resolution: ``fonts`` maps a page's font resource names to a
    decoder — ``"simple"`` (single-byte font: hex/literal bytes decode
    latin-1), a ToUnicode CMap dict (composite /Type0 Identity-H font:
    payload bytes are 2-byte CIDs mapped through the CMap), or
    ``None`` (composite font WITHOUT a ToUnicode CMap: its shows are
    undecodable glyph ids and are skipped rather than emitted as
    garbage). ``/name size Tf`` operators switch the decoder; ``cur``
    carries the text-font state across the content-stream segments of
    one page and is returned updated. While no font has been selected
    (or the name is unresolvable) the document-wide ``decode_hex``
    flag decides hex handling — the pre-CMap behavior. Flate or raw
    streams only — any other /Filter raises so the caller degrades
    honestly."""
    import re as _re
    import zlib

    m = _re.search(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", obj_body, _re.DOTALL)
    if m is None:
        return [], cur
    meta, stream = m.group(1), m.group(2)
    if b"/FlateDecode" in meta:
        try:
            stream = zlib.decompress(stream)
        except zlib.error as e:
            raise NotImplementedError(f"undecodable Flate content stream: {e}")
    elif b"/Filter" in meta:
        raise NotImplementedError("unsupported content-stream filter")
    fonts = fonts or {}

    def hex_text(raw: bytes) -> str | None:
        if isinstance(cur, dict):
            h = b"".join(raw.split())
            if len(h) % 2:
                h += b"0"
            try:
                return _pdf_cids_decode(bytes.fromhex(h.decode("ascii")), cur)
            except ValueError:
                return ""
        if cur == "simple":
            return _pdf_hex_decode(raw)
        if cur is None:  # known-undecodable composite font
            return None
        return _pdf_hex_decode(raw) if decode_hex else None

    def lit_text(raw: bytes) -> str | None:
        if isinstance(cur, dict):
            return _pdf_cids_decode(_pdf_unescape(raw).encode("latin-1"), cur)
        if cur is None:
            return None
        return _pdf_unescape(raw)

    texts: list[str] = []
    for bt in _re.finditer(rb"BT(.*?)ET", stream, _re.DOTALL):
        for sm in _re.finditer(
            rb"\(((?:[^()\\]|\\.)*)\)\s*Tj"
            rb"|<([0-9A-Fa-f\s]*)>\s*Tj"
            rb"|\[((?:[^\]\\]|\\.)*?)\]\s*TJ"
            rb"|/([\w.]+)\s+[\d.]+\s+Tf",
            bt.group(1),
            _re.DOTALL,
        ):
            if sm.group(4) is not None:
                cur = fonts.get(sm.group(4), "unset")
            elif sm.group(1) is not None:
                t = lit_text(sm.group(1))
                if t is not None:
                    texts.append(t)
            elif sm.group(2) is not None:
                t = hex_text(sm.group(2))
                if t is not None:
                    texts.append(t)
            else:
                segs = []
                for pm in _re.finditer(
                    rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>", sm.group(3)
                ):
                    t = (
                        lit_text(pm.group(1))
                        if pm.group(1) is not None
                        else hex_text(pm.group(2))
                    )
                    if t is not None:
                        segs.append(t)
                texts.append("".join(segs))
    return [t for t in texts if t.strip()], cur


def _pdf_text_paged(data: bytes) -> str:
    """Multi-page stdlib PDF extraction: walk Catalog -> /Pages ->
    /Kids to the page objects IN TREE ORDER, pull each page's
    /Contents stream(s), and emit the text-show text under the
    reference's ``--- Page N ---`` markers (document_loader.py:
    86-102 joins PyPDF2 page texts exactly so). Envelope: plain
    (uncompressed-xref) object structure, Flate/raw content streams,
    literal-string Tj/TJ always, hex-string Tj/TJ decoded PER FONT:
    latin-1 under simple single-byte fonts, ToUnicode-CMap CID
    mapping under composite /Type0 Identity-H fonts that carry one
    (a Type0 WITHOUT a ToUnicode CMap has undecodable glyph-id shows
    — those are skipped rather than emitted as garbage). Covers 22 of
    the reference checkout's 28 real financial PDFs: 11 literal-show
    files, 9 Canon-scanned filings whose OCR layer is render-mode-3
    hex shows under simple fonts, and 2 whose ObjStm-packed composite
    fonts carry ToUnicode CMaps; the remaining 6 carry ONLY vector
    path operators (text drawn as outlines — nothing for any
    extractor) and decline (census pinned by tests/test_round5.py). Anything outside raises
    NotImplementedError and the caller degrades to the single-page
    fallback, then the stub. No positioning model: text order is
    stream order, which is what substring-match relevance
    (evaluation.py:41-45) needs."""
    import re as _re
    import zlib

    if not data.startswith(b"%PDF"):
        raise NotImplementedError("not a PDF header")
    objs: dict[int, bytes] = {}
    for m in _re.finditer(rb"(\d+)\s+0\s+obj\b(.*?)endobj", data, _re.DOTALL):
        objs[int(m.group(1))] = m.group(2)  # last wins (incremental updates)
    # index objects hidden in object streams (/Type /ObjStm — PDF 1.5+
    # packs non-stream dicts, often the page tree, into one compressed
    # stream): decompressed layout is /First header bytes of
    # "num offset" int pairs, then the bare dict bodies at
    # First-relative offsets. Content streams themselves can't live in
    # an ObjStm, so they are always found by the plain scan above.
    for body in list(objs.values()):
        if not _re.search(rb"/Type\s*/ObjStm\b", body):
            continue
        sm = _re.search(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", body, _re.DOTALL)
        if sm is None:
            continue
        meta, stream = sm.group(1), sm.group(2)
        if b"/FlateDecode" in meta:
            try:
                stream = zlib.decompress(stream)
            except zlib.error:
                continue
        nm = _re.search(rb"/N\s+(\d+)", meta)
        fm = _re.search(rb"/First\s+(\d+)", meta)
        if not (nm and fm):
            continue
        first = int(fm.group(1))
        try:
            nums = [int(x) for x in stream[:first].split()]
        except ValueError:
            continue
        pairs = list(zip(nums[0::2], nums[1::2]))
        ends = [off for _, off in pairs[1:]] + [len(stream) - first]
        for (num, off), end in zip(pairs, ends):
            objs.setdefault(num, stream[first + off : first + end])
    cat = next(
        (b for b in objs.values() if _re.search(rb"/Type\s*/Catalog\b", b)), None
    )
    if cat is None:
        raise NotImplementedError("no plain catalog object (compressed xref?)")
    root = _re.search(rb"/Pages\s+(\d+)\s+0\s+R", cat)
    if root is None:
        raise NotImplementedError("catalog without /Pages reference")

    page_bodies: list[bytes] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 32:
            raise NotImplementedError("page tree too deep")
        body = objs.get(num)
        if body is None:
            raise NotImplementedError(f"unresolvable page-tree object {num}")
        if _re.search(rb"/Type\s*/Pages\b", body):
            kids = _re.search(rb"/Kids\s*\[(.*?)\]", body, _re.DOTALL)
            if kids is None:
                raise NotImplementedError("Pages node without /Kids")
            for km in _re.finditer(rb"(\d+)\s+0\s+R", kids.group(1)):
                walk(int(km.group(1)), depth + 1)
        elif _re.search(rb"/Type\s*/Page\b", body):
            page_bodies.append(body)
        else:
            raise NotImplementedError("non-page object in page tree")

    walk(int(root.group(1)))
    if not page_bodies:
        raise NotImplementedError("empty page tree")
    # hex shows are character codes only under simple single-byte
    # fonts; under a composite /Type0 font they are 2-byte glyph ids.
    # Per-page font resources are resolved below so each show decodes
    # by ITS font: simple -> latin-1, Type0 WITH a ToUnicode CMap ->
    # CID-mapped text, Type0 without one -> skipped. The document-wide
    # flag survives only as the fallback for shows whose font cannot
    # be resolved (no Tf seen yet, or an unresolvable resource name) —
    # it scans the MERGED object bodies, not the raw bytes, because a
    # /Type0 font dict can live inside a Flate-compressed ObjStm
    decode_hex = not any(
        _re.search(rb"/Type0\b|/Identity-H\b", body) for body in objs.values()
    )

    def obj_stream(body: bytes) -> bytes | None:
        sm2 = _re.search(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", body, _re.DOTALL)
        if sm2 is None:
            return None
        meta2, stream2 = sm2.group(1), sm2.group(2)
        if b"/FlateDecode" in meta2:
            try:
                return zlib.decompress(stream2)
            except zlib.error:
                return None
        if b"/Filter" in meta2:
            return None
        return stream2

    _decoder_cache: dict[int, object] = {}

    def font_decoder(num: int) -> object:
        """'simple' | ToUnicode CMap dict | None (undecodable Type0)."""
        if num not in _decoder_cache:
            fb = objs.get(num, b"")
            dec: object = "simple"
            if _re.search(rb"/Type0\b|/Identity-H\b", fb):
                dec = None
                tum = _re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", fb)
                if tum is not None:
                    cstream = obj_stream(objs.get(int(tum.group(1)), b""))
                    cmap = _pdf_parse_tounicode(cstream) if cstream else {}
                    if cmap:
                        dec = cmap
            _decoder_cache[num] = dec
        return _decoder_cache[num]

    def page_fonts(body: bytes, depth: int = 0) -> dict[bytes, object]:
        """Resource name -> decoder for one page: /Font inline dict,
        /Font as an indirect dict, or via an indirect /Resources.
        Unresolvable shapes return {} — shows then fall back to the
        document-wide flag (never garbage)."""
        if depth > 4:
            return {}
        fm = _re.search(rb"/Font\s*<<(.*?)>>", body, _re.DOTALL)
        if fm is None:
            fr = _re.search(rb"/Font\s+(\d+)\s+0\s+R", body)
            if fr is not None:
                fm_body = objs.get(int(fr.group(1)), b"")
                return {
                    name: font_decoder(int(num))
                    for name, num in _re.findall(rb"/([\w.]+)\s+(\d+)\s+0\s+R", fm_body)
                }
            rm2 = _re.search(rb"/Resources\s+(\d+)\s+0\s+R", body)
            if rm2 is not None:
                return page_fonts(objs.get(int(rm2.group(1)), b""), depth + 1)
            return {}
        return {
            name: font_decoder(int(num))
            for name, num in _re.findall(rb"/([\w.]+)\s+(\d+)\s+0\s+R", fm.group(1))
        }

    pages, any_text = [], False
    for i, body in enumerate(page_bodies, start=1):
        cm = _re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+0\s+R)", body)
        texts: list[str] = []
        fonts = page_fonts(body)
        cur: object = "unset"  # text font resets at each page's start
        if cm is not None:
            for rm in _re.finditer(rb"(\d+)\s+0\s+R", cm.group(1)):
                part, cur = _pdf_stream_texts(
                    objs.get(int(rm.group(1)), b""), decode_hex, fonts, cur
                )
                texts.extend(part)
        any_text = any_text or bool(texts)
        pages.append(f"--- Page {i} ---\n" + "\n".join(texts))
    if not any_text:
        raise NotImplementedError("no text-show operators in any page")
    return "\n".join(pages)


def _parse_pdf(data: bytes) -> str:
    try:
        from pypdf import PdfReader  # type: ignore
    except ImportError:
        # pypdf is not installable in this container (README
        # "Environment constraints"); stdlib fallbacks keep the real
        # parse path live — the paged walker for well-formed multi-page
        # files (the reference's own corpus), the single-page minimal
        # parser for streams-only fixtures, then the documented stub.
        try:
            return _pdf_text_paged(data)
        except NotImplementedError:
            pass
        try:
            return _pdf_text_minimal(data)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"pdf parser not installed (pypdf); stdlib fallbacks declined: {e}"
            )
    import io

    reader = PdfReader(io.BytesIO(data))
    pages = []
    for i, page in enumerate(reader.pages, start=1):
        pages.append(f"--- Page {i} ---\n{page.extract_text() or ''}")
    return "\n".join(pages)


_NS_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_NS_X = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_NS_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


def _office_zip(data: bytes, required_part: str):
    """Open an OPC (zip) payload and return the archive, refusing
    non-zip payloads or archives missing the format's main part — the
    caller then degrades to the documented stub, never a garbage
    partial extraction."""
    import io
    import zipfile

    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise NotImplementedError(f"not an OPC zip: {e}")
    if required_part not in z.namelist():
        raise NotImplementedError(f"missing part {required_part}")
    return z


def _docx_text_minimal(data: bytes) -> str:
    """Stdlib fallback DOCX extraction (OOXML is zip + XML): body
    paragraphs in order, then tables flattened 'cell | cell' — the same
    output shape as the python-docx path (reference
    document_loader.py:104-127: paragraphs list, then table rows)."""
    from xml.etree import ElementTree as ET

    z = _office_zip(data, "word/document.xml")
    body = ET.fromstring(z.read("word/document.xml")).find(f"{_NS_W}body")
    if body is None:
        raise NotImplementedError("document.xml has no body")
    paras, table_rows = [], []
    for child in body:
        if child.tag == f"{_NS_W}p":
            paras.append("".join(t.text or "" for t in child.iter(f"{_NS_W}t")))
        elif child.tag == f"{_NS_W}tbl":
            for tr in child.iter(f"{_NS_W}tr"):
                cells = [
                    "".join(t.text or "" for t in tc.iter(f"{_NS_W}t"))
                    for tc in tr.findall(f"{_NS_W}tc")
                ]
                table_rows.append(" | ".join(cells))
    return "\n".join(paras + table_rows)


def _xlsx_text_minimal(data: bytes) -> str:
    """Stdlib fallback XLSX extraction: per-sheet '--- Sheet: name ---'
    header + rows as 'v | v' (reference document_loader.py:129-149).
    Handles shared and inline string cells plus raw numeric <v> text;
    sheets resolve as sheetN.xml in workbook order."""
    from xml.etree import ElementTree as ET

    z = _office_zip(data, "xl/workbook.xml")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
        shared = [
            "".join(t.text or "" for t in si.iter(f"{_NS_X}t"))
            for si in ss.findall(f"{_NS_X}si")
        ]
    sheets_el = ET.fromstring(z.read("xl/workbook.xml")).find(f"{_NS_X}sheets")
    if sheets_el is None:
        raise NotImplementedError("workbook.xml has no sheets")
    parts = []
    for i, sh in enumerate(sheets_el.findall(f"{_NS_X}sheet"), start=1):
        part = f"xl/worksheets/sheet{i}.xml"
        if part not in z.namelist():
            raise NotImplementedError(f"missing worksheet part {part}")
        parts.append(f"--- Sheet: {sh.get('name')} ---")
        sx = ET.fromstring(z.read(part))
        for row in sx.iter(f"{_NS_X}row"):
            vals = []
            for c in row.findall(f"{_NS_X}c"):
                v = c.find(f"{_NS_X}v")
                if c.get("t") == "s" and v is not None and v.text is not None:
                    vals.append(shared[int(v.text)])
                elif c.get("t") == "inlineStr":
                    vals.append("".join(t.text or "" for t in c.iter(f"{_NS_X}t")))
                else:
                    vals.append("" if v is None or v.text is None else v.text)
            parts.append(" | ".join(vals))
    return "\n".join(parts)


def _pptx_text_minimal(data: bytes) -> str:
    """Stdlib fallback PPTX extraction: per-slide '--- Slide N ---'
    header + one line per text-bearing shape, paragraphs inside a shape
    joined by newline — mirroring python-pptx text_frame.text
    (reference document_loader.py:151-167)."""
    import re as _re
    from xml.etree import ElementTree as ET

    z = _office_zip(data, "ppt/presentation.xml")
    slides = sorted(
        (n for n in z.namelist() if _re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(_re.search(r"\d+", n).group()),
    )
    if not slides:
        raise NotImplementedError("no slide parts")
    parts = []
    for i, sname in enumerate(slides, start=1):
        parts.append(f"--- Slide {i} ---")
        root = ET.fromstring(z.read(sname))
        for sp in root.iter(f"{_NS_P}sp"):
            tx = sp.find(f"{_NS_P}txBody")
            if tx is None:
                continue
            parts.append(
                "\n".join(
                    "".join(t.text or "" for t in ap.iter(f"{_NS_A}t"))
                    for ap in tx.findall(f"{_NS_A}p")
                )
            )
    return "\n".join(parts)


def _parse_docx(data: bytes) -> str:
    try:
        import docx  # type: ignore
    except ImportError:
        try:
            return _docx_text_minimal(data)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"docx parser not installed (python-docx); minimal fallback declined: {e}"
            )
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
        try:
            return _xlsx_text_minimal(data)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"xlsx parser not installed (openpyxl); minimal fallback declined: {e}"
            )
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
        try:
            return _pptx_text_minimal(data)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"pptx parser not installed (python-pptx); minimal fallback declined: {e}"
            )
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

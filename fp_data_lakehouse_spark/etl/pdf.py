"""Stdlib-only PDF text layer: synthesize transcript PDFs and decode
them back to page-concatenated text (SURVEY.md §2.1 S2; reference
``ETL_FINAL.py:144-145``, where pdfplumber flattens each PDF as
``"\\n".join(page.extract_text() for page in pages)``).

The container ships no PDF library, but the S2 operator's essence —
"PDF bytes in, extraction-ready text out" — needs only two public
facts: FlateDecode content streams are zlib, and text is shown by the
``Tj`` / ``TJ`` / ``'`` operators carrying parenthesized string
literals. So this module:

- **writes** well-formed PDF 1.4 (catalog → pages tree → per-page
  FlateDecode content stream, valid xref table) with one show op per
  text line — ``build_pdf``;
- **decodes** any PDF of that grammar back to text — stream objects
  located by scanning for ``stream``/``endstream``, inflated when the
  dict says ``/FlateDecode``, show-op strings collected in content
  order, lines joined with ``\\n`` per page, pages concatenated with
  ``\\n`` (the exact pdfplumber shape the reference relied on) —
  ``extract_pdf_text``;
- wraps both as distributed operators: ``write_pdf_corpus`` (one PDF
  file per document, written from executors) and ``decode_pdf_docs``
  (Arrow ``mapInPandas`` over a ``binaryFile`` scan — the 100 TB
  shape: the scan parallelizes per file, the kernel is pure CPU per
  batch, nothing touches the driver).

Scope: the decoder covers the generated grammar plus the common
single-byte escapes — it is NOT a general PDF parser (no xref-driven
object resolution, no LZW/DCT filters, no encrypted files). Real-world
corpora with arbitrary producers still want a real PDF library; the
``multimodal/binaryops.py`` codec seam stays the documented upgrade
path. What this closes is S2's end-to-end hard signal: bytes →
text → T1–T11 extraction → star schema, certified against a DuckDB
oracle that never sees the PDFs (operators/etlquery.py et08).
"""

from __future__ import annotations

import os
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_PAGE_LINES = 20  # transcript pages: header + ~20 course lines per page


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def _content_stream(page_text: str, use_tj: bool) -> bytes:
    """One FlateDecode content stream; one show op per line. Alternating
    pages use ``TJ`` (array form) so the decoder's handling of both
    operators is exercised by every multi-page document."""
    ops = ["BT", "/F1 10 Tf", "1 0 0 1 50 780 Tm", "12 TL"]
    for i, line in enumerate(page_text.split("\n")):
        if i:
            ops.append("T*")
        lit = f"({_esc(line)})"
        ops.append(f"[{lit} 0] TJ" if use_tj else f"{lit} Tj")
    ops.append("ET")
    # STRICT encode: silently degrading non-latin-1 text to '?' would
    # break the lossless decode(encode(text)) == text property et08's
    # certificate depends on — fail loudly at write time instead.
    try:
        payload = "\n".join(ops).encode("latin-1")
    except UnicodeEncodeError as e:
        raise ValueError(
            "build_pdf content must be latin-1 encodable (the stdlib "
            "writer emits unescaped PDF string literals); got "
            f"non-latin-1 text: {e}"
        ) from e
    return zlib.compress(payload)


def paginate(text: str, lines_per_page: int = _PAGE_LINES) -> list[str]:
    """Split on line boundaries only, so decode(encode(text)) == text:
    per-page "\\n".join of the chunks re-concatenates losslessly."""
    lines = text.split("\n")
    return [
        "\n".join(lines[i : i + lines_per_page])
        for i in range(0, len(lines), lines_per_page)
    ] or [""]


def build_pdf(pages: list[str]) -> bytes:
    """Minimal but well-formed PDF 1.4: catalog, pages tree, shared
    Type1 font, one page + one FlateDecode content stream per entry,
    correct xref offsets and trailer."""
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(len(pages)))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode()
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, page in enumerate(pages):
        data = _content_stream(page, use_tj=(i % 2 == 1))
        objs[4 + 2 * i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>"
        ).encode()
        objs[5 + 2 * i] = (
            f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    maxn = max(objs)
    out += f"xref\n0 {maxn + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {maxn + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

# Stream LOCATOR only — the payload is sliced by the dict's /Length,
# never by scanning for "endstream": compressed bytes ending in 0x0D
# would make a "\r?\nendstream" terminator eat the payload's last byte
# (a 1-in-256-per-stream truncation, caught by the sf0.01 certificate
# and pinned in tests/test_etl_pipeline.py).
_STREAM_START_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
# show-text operators, in content order: "(str) Tj", "(str) '",
# '(str) "'-with-params is not generated, and "[(s1) n (s2)] TJ"
_SHOW_RE = re.compile(
    r"(\((?:[^()\\]|\\.)*\)\s*(?:Tj|'))|(\[(?:\((?:[^()\\]|\\.)*\)|[^\]()])*\]\s*TJ)"
)
_STR_RE = re.compile(r"\(((?:[^()\\]|\\.)*)\)")
_UNESC = {"\\(": "(", "\\)": ")", "\\\\": "\\", "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def _unescape(s: str) -> str:
    return re.sub(r"\\[()\\nrt]", lambda m: _UNESC[m.group(0)], s)


def _shows_of_stream(head: bytes, payload: bytes) -> str | None:
    """Decode one content stream's show-op text, or None when the
    stream does not inflate / carries no show ops (fonts, images)."""
    if b"/FlateDecode" in head:
        try:
            content = zlib.decompress(payload)
        except zlib.error:
            return None
    else:
        content = payload
    try:
        text_ops = content.decode("latin-1")
    except UnicodeDecodeError:  # pragma: no cover - latin-1 total
        return None
    shows: list[str] = []
    for sm in _SHOW_RE.finditer(text_ops):
        lits = _STR_RE.findall(sm.group(0))
        shows.append("".join(_unescape(x) for x in lits))
    return "\n".join(shows) if shows else None


# ---- xref-driven resolution (foreign producers: arbitrary object order) ----

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_XREF_SUB_RE = re.compile(rb"\s*(\d+)\s+(\d+)[ ]*\r?\n")
_REF_RE = re.compile(rb"/(Root|Pages|Contents|Kids|Type)\s*")
_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")


def _xref_offsets(data: bytes) -> dict[int, int]:
    """Object number -> byte offset from the LAST classic xref table
    (the one startxref points to). Raises on anything it cannot parse
    — the caller falls back to the linear scan."""
    m = _STARTXREF_RE.search(data, max(0, len(data) - 256))
    if m is None:  # trailing garbage may push startxref further back
        m = _STARTXREF_RE.search(data)
    if m is None:
        raise ValueError("no startxref")
    pos = int(m.group(1))
    if not data.startswith(b"xref", pos):
        raise ValueError("startxref does not point at a classic xref table")
    cur = pos + 4
    offsets: dict[int, int] = {}
    while True:
        sub = _XREF_SUB_RE.match(data, cur)
        if sub is None:
            break
        first, count = int(sub.group(1)), int(sub.group(2))
        cur = sub.end()
        for i in range(count):
            entry = data[cur : cur + 20]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            if entry[17:18] == b"n":
                offsets[first + i] = int(entry[:10])
            cur += 20
    if not offsets:
        raise ValueError("empty xref")
    return offsets


def _object_at(data: bytes, off: int) -> bytes:
    """The object body at a byte offset (``N G obj`` .. ``endobj``);
    stream payloads are skipped via /Length so binary content can
    never alias the endobj keyword."""
    m = _OBJ_HEAD_RE.match(data, off)
    if m is None:
        raise ValueError(f"no object at offset {off}")
    start = m.end()
    naive_end = data.find(b"endobj", start)  # may alias stream bytes
    sm = _STREAM_START_RE.search(
        data, start, naive_end if naive_end >= 0 else len(data)
    )
    search_from = start
    if sm is not None:
        lengths = _LENGTH_RE.findall(sm.group(1))
        if lengths:
            search_from = sm.end() + int(lengths[-1])
    end = data.find(b"endobj", search_from)
    if end < 0:
        raise ValueError("unterminated object")
    return data[start:end]


def _ref_of(body: bytes, key: bytes) -> int:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    if m is None:
        raise ValueError(f"missing {key.decode()} reference")
    return int(m.group(1))


def _page_content_refs(data: bytes, offsets: dict[int, int]) -> list[int]:
    """Content-stream object numbers in PAGE-TREE order (catalog ->
    pages -> kids, recursing /Pages nodes) — the order pdfplumber
    reads, independent of where objects sit in the file."""
    trailer_at = data.rfind(b"trailer")
    if trailer_at < 0:
        raise ValueError("no trailer")
    root = _ref_of(data[trailer_at:], b"/Root")
    catalog = _object_at(data, offsets[root])
    out: list[int] = []

    def _walk(node_num: int, depth: int) -> None:
        if depth > 32:
            raise ValueError("page tree too deep")
        body = _object_at(data, offsets[node_num])
        if b"/Kids" in body:
            kids_src = body[body.find(b"/Kids") :]
            lb, rb_ = kids_src.find(b"["), kids_src.find(b"]")
            for km in re.finditer(rb"(\d+)\s+\d+\s+R", kids_src[lb : rb_ + 1]):
                _walk(int(km.group(1)), depth + 1)
        elif b"/Contents" in body:
            out.append(_ref_of(body, b"/Contents"))

    _walk(_ref_of(catalog, b"/Pages"), 0)
    if not out:
        raise ValueError("page tree names no content streams")
    return out


def _extract_via_xref(data: bytes) -> str:
    offsets = _xref_offsets(data)
    pages: list[str] = []
    for num in _page_content_refs(data, offsets):
        body = _object_at(data, offsets[num])
        sm = _STREAM_START_RE.search(body)
        if sm is None:
            continue
        lengths = _LENGTH_RE.findall(sm.group(1))
        payload = (
            body[sm.end() : sm.end() + int(lengths[-1])]
            if lengths
            else body[sm.end() :].rstrip(b"\r\n")
        )
        shows = _shows_of_stream(sm.group(1), payload)
        if shows is not None:
            pages.append(shows)
    return "\n".join(pages)


def extract_pdf_text(data: bytes) -> str:
    """Page-concatenated text: per content stream, the show-op strings
    in order joined with ``\\n``; pages joined with ``\\n`` —
    pdfplumber's flatten shape at ``ETL_FINAL.py:144-145``.

    Resolution order (round-8 robustness, VERDICT r7 #6): first the
    xref/page-tree path — startxref -> classic xref table -> catalog
    -> pages -> kids -> per-page /Contents — which reads pages in TREE
    order, so a foreign producer's arbitrary object placement (e.g.
    objects emitted in reverse) still decodes losslessly; when any of
    that fails to parse (damaged xref, truncation, exotic trailers),
    fall back to the byte-order linear stream scan, which handles
    length-less and xref-less producers. Files neither path can read
    yield '' / garbled text and flow to the et04 reject quarantine
    (certified by et09) — never a silent census shrink."""
    try:
        return _extract_via_xref(data)
    except Exception:
        pass
    pages: list[str] = []
    for m in _STREAM_START_RE.finditer(data):
        head, start = m.group(1), m.end()
        # the non-greedy head can span preceding objects; the LAST
        # /Length in it belongs to this stream's own dict
        lengths = _LENGTH_RE.findall(head)
        if lengths:
            payload = data[start : start + int(lengths[-1])]
        else:  # length-less producer: scan, trimming the EOL we add
            end = data.find(b"endstream", start)
            if end < 0:
                continue
            payload = data[start:end].rstrip(b"\r\n")
        shows = _shows_of_stream(head, payload)
        if shows is not None:
            pages.append(shows)
    return "\n".join(pages)


def rewrite_objects_reversed(data: bytes) -> bytes:
    """Re-emit a generated-grammar PDF with its objects in REVERSED
    numeric order (body layout only — the xref table is rebuilt to the
    new offsets, the trailer kept). Simulates the foreign producers
    whose object placement does not follow page order: a byte-order
    stream scan would read such a file's pages backwards; only the
    xref/page-tree path decodes it correctly."""
    offsets = _xref_offsets(data)
    objs = {num: _object_at(data, off) for num, off in offsets.items()}
    out = bytearray(b"%PDF-1.4\n")
    new_offsets: dict[int, int] = {}
    for num in sorted(objs, reverse=True):
        new_offsets[num] = len(out)
        out += f"{num} 0 obj".encode() + objs[num] + b"endobj\n"
    xref_pos = len(out)
    maxn = max(objs)
    out += f"xref\n0 {maxn + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        out += f"{new_offsets[num]:010d} 00000 n \n".encode()
    trailer_at = data.rfind(b"trailer")
    startxref_at = data.rfind(b"startxref")
    out += data[trailer_at:startxref_at]
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# distributed operators
# ---------------------------------------------------------------------------


def write_pdf_corpus(docs: DataFrame, out_dir: str) -> int:
    """Write one ``{doc_id}.pdf`` per row of (doc_id, text) into
    ``out_dir`` from the executors (local/shared filesystem — this is
    fixture synthesis; production corpora arrive on storage already).
    Returns the file count."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = 0
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                with open(os.path.join(out_dir, f"{doc_id}.pdf"), "wb") as f:
                    f.write(build_pdf(paginate(text)))
                n += 1
            yield pd.DataFrame({"n": [n]})

    counts = docs.select("doc_id", "text").mapInPandas(_write, "n long")
    return counts.agg(F.sum("n")).collect()[0][0] or 0


def decode_pdf_docs(binary_df: DataFrame) -> DataFrame:
    """``binaryFile`` scan rows -> (doc_id, text): the S2 decode as an
    Arrow batch kernel. doc_id is the file stem, matching
    ``write_pdf_corpus``'s naming (the reference keyed documents by
    filename the same way)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": [
                        os.path.splitext(os.path.basename(p))[0]
                        for p in pdf["path"]
                    ],
                    "text": [extract_pdf_text(b) for b in pdf["content"]],
                }
            )

    return binary_df.select("path", "content").mapInPandas(
        _decode, "doc_id string, text string"
    )

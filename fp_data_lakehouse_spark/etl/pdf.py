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


def extract_pdf_text(data: bytes) -> str:
    """Page-concatenated text of a generated-grammar PDF: per content
    stream, the show-op strings in order joined with ``\\n``; streams
    (= pages, in object order) joined with ``\\n`` — pdfplumber's
    flatten shape at ``ETL_FINAL.py:144-145``. Streams that do not
    inflate or carry no show ops (fonts, images) are skipped."""
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
        if b"/FlateDecode" in head:
            try:
                content = zlib.decompress(payload)
            except zlib.error:
                continue
        else:
            content = payload
        try:
            text_ops = content.decode("latin-1")
        except UnicodeDecodeError:  # pragma: no cover - latin-1 total
            continue
        shows: list[str] = []
        for sm in _SHOW_RE.finditer(text_ops):
            lits = _STR_RE.findall(sm.group(0))
            shows.append("".join(_unescape(x) for x in lits))
        if shows:
            pages.append("\n".join(shows))
    return "\n".join(pages)


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

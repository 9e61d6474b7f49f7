"""PDF text extraction: from-scratch minimal PDF writer + content parser.

The north rule's extraction tier names "PDF/layout parse" next to HTML
boilerplate stripping: a crawl corpus carries PDFs as opaque binary, and the
pipeline must recover their text layer distributed, with the same execution
shape as the html extraction UDF (Arrow-batched ``mapInPandas``, per-doc
failure isolation, no per-row Python fallback).

Everything here is built on the **public PDF 1.4 file format** (ISO 32000 /
the classic Adobe spec) with stdlib only:

- :func:`build_pdf` — a minimal but *valid* single- or multi-page PDF:
  catalog → page tree → page objects → FlateDecode content streams →
  correct xref offsets + trailer. Text is emitted with the standard text
  operators (``BT``/``Tf``/``Td``/``TL``, ``Tj``, ``TJ`` arrays with
  kerning numbers, ``T*`` line advance) and proper string-literal escaping.
- :func:`extract_pdf_text` — the reader: locate ``stream…endstream``
  objects, inflate FlateDecode streams, and walk the content with a real
  string-literal scanner (escape sequences ``\\( \\) \\\\ \\n \\r \\t``,
  octal ``\\ddd``, balanced unescaped parens, backslash-newline
  continuation). ``Tj``/``'`` emit the pending string, ``TJ`` concatenates
  its array's strings (kerning numbers ignored), ``T*``/``'`` break lines.

This is a text-layer extractor, not a renderer: no font/CMap decoding (the
builder writes WinAnsi/ASCII Type1 text, which is what the synthetic corpus
contains) and no OCR. Real-crawl PDFs with ToUnicode CMaps or scanned pages
would need those layers on top; the distributed plumbing and the stream/
operator walk below are the part Spark cares about and are fully real.

Scale shape: pure projection (mapInPandas) — no shuffle, linear scans of
each document's bytes, memory bounded by one inflated stream at a time.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PDF_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("n_pages", IntegerType(), True),
        StructField("text", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("ok", BooleanType(), False),
        StructField("err", StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def escape_pdf_string(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif " " <= ch <= "~":
            out.append(ch)
        else:
            out.append("\\%03o" % (ord(ch) & 0xFF))
    return "".join(out).encode("ascii")


def _content_stream(lines: Sequence[str]) -> bytes:
    """BT … ET block: first line via a TJ array split mid-string (kerning
    number between the halves — parsers must concatenate), the rest via Tj,
    T* between lines."""
    ops: List[bytes] = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            ops.append(b"T*")
        if i == 0 and len(line) > 1:
            cut = max(1, len(line) // 2)
            ops.append(
                b"[("
                + escape_pdf_string(line[:cut])
                + b") -250 ("
                + escape_pdf_string(line[cut:])
                + b")] TJ"
            )
        else:
            ops.append(b"(" + escape_pdf_string(line) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def build_pdf(pages: Sequence[Sequence[str]], compress: bool = True) -> bytes:
    """pages = list of pages, each a list of text lines → valid PDF bytes.
    Deterministic (no timestamps, no ids)."""
    n = len(pages)
    # object numbering: 1 catalog, 2 pages, 3..3+n-1 page objs,
    # 3+n..3+2n-1 content streams, 3+2n font
    font_num = 3 + 2 * n
    objs: List[Tuple[int, bytes]] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n))
    objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objs.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("ascii"))
    )
    for i in range(n):
        objs.append(
            (
                3 + i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                    f"/Contents {3 + n + i} 0 R >>"
                ).encode("ascii"),
            )
        )
    for i, page_lines in enumerate(pages):
        raw = _content_stream(page_lines)
        data = zlib.compress(raw, 9) if compress else raw
        filt = b" /Filter /FlateDecode" if compress else b""
        body = (
            b"<< /Length " + str(len(data)).encode("ascii") + filt + b" >>\n"
            b"stream\n" + data + b"\nendstream"
        )
        objs.append((3 + n + i, body))
    objs.append(
        (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("ascii") + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode("ascii")
    out += b"0000000000 65535 f \n"
    for num in range(1, len(objs) + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode("ascii")
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("ascii")
    return bytes(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![s/])")


def _scan_string(data: bytes, i: int) -> Tuple[str, int]:
    """Parse a PDF literal string starting at data[i] == '(' → (text, next_i).
    Handles escapes, octal, balanced unescaped parens, and line continuations."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out: List[str] = []
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b", 0x66: "\f"}[e])
                i += 1
            elif e in b"()\\":
                out.append(chr(e))
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                j = i
                while j < n and j < i + 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # ( — balanced nesting
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    raise ValueError("unterminated PDF string literal")


_OP_RE = re.compile(rb"[A-Za-z']+\*?|\S")


def parse_content_text(content: bytes) -> List[str]:
    """Walk a decoded content stream; return text lines."""
    lines: List[str] = []
    cur: List[str] = []
    pending: List[str] = []
    i = 0
    n = len(content)
    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n":
            i += 1
            continue
        if c == b"(":
            s, i = _scan_string(content, i)
            pending.append(s)
            continue
        if c == b"%":  # comment to end of line
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        m = _OP_RE.match(content, i)
        if not m:
            i += 1
            continue
        tok = m.group()
        i = m.end()
        if tok in (b"Tj", b"TJ"):
            cur.extend(pending)
            pending = []
        elif tok == b"T*":
            lines.append("".join(cur))
            cur = []
        elif tok == b"'":  # move to next line and show
            lines.append("".join(cur))
            cur = list(pending)
            pending = []
        elif tok == b"ET":
            pending = []
    if cur or pending:
        lines.append("".join(cur + pending))
    return lines


def extract_pdf_text(data: bytes) -> Tuple[int, str]:
    """PDF bytes → (n_pages, text). Text lines joined with \\n; pages joined
    with \\n as well (form-feed separation is a policy choice; the synthetic
    oracle uses single-page docs)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    n_pages = len(_PAGE_RE.findall(data))
    all_lines: List[str] = []
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            break
        dict_part = m.group(1)
        start = m.end()
        # slice by /Length when present (stream data is binary and may
        # contain 'endstream'-lookalike bytes); scan resumes past the stream
        lm = re.search(rb"/Length\s+(\d+)", dict_part)
        if lm:
            raw = data[start : start + int(lm.group(1))]
            end = data.find(b"endstream", start + int(lm.group(1)))
        else:
            end = data.find(b"endstream", start)
            raw = data[start:end] if end >= 0 else b""
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n"):
                raw = raw[:-1]
        if end < 0:
            raise ValueError("stream without endstream")
        pos = end + len(b"endstream")
        if b"/FlateDecode" in dict_part:
            raw = zlib.decompress(raw)
        all_lines.extend(parse_content_text(raw))
    return n_pages, "\n".join(all_lines)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def synthesize_pdfs(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, pdf binary). Single-page, FlateDecode. The text
    layout is a deterministic, SQL-replicable function of (doc_id, text):
    a parenthesized header line (exercises string escaping), then the text
    split at column 80 (exercises multi-line T*)."""
    import pandas as pd

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [StructField("doc_id", LongType(), True), StructField("pdf", BinaryType(), True)]
    )

    def batches(it: Iterator) -> Iterator:
        for pdf_batch in it:
            rows = []
            for doc_id, text in zip(
                pdf_batch["doc_id"].to_numpy(), pdf_batch["text"].to_numpy()
            ):
                rows.append(
                    {"doc_id": int(doc_id), "pdf": build_pdf([doc_lines(doc_id, text)])}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

    return docs.select("doc_id", "text").mapInPandas(batches, schema)


def doc_lines(doc_id: int, text: str) -> List[str]:
    """The synthetic per-doc text layout (mirrored by the SQL oracle)."""
    lines = [f"(doc {doc_id})"]
    if len(text) > 80:
        lines.append(text[:80])
        lines.append(text[80:])
    else:
        lines.append(text)
    return lines


def pdf_extract(df: DataFrame, content_col: str = "pdf") -> DataFrame:
    """(doc_id, pdf) → PDF_TEXT_SCHEMA. Same contract as the html extract
    operator: per-doc failure isolation, Arrow batches, no shuffle."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        cols = [f.name for f in PDF_TEXT_SCHEMA.fields]
        for pdf_batch in it:
            rows = []
            for doc_id, blob in zip(
                pdf_batch["doc_id"].to_numpy(), pdf_batch[content_col].to_numpy()
            ):
                row = {
                    "doc_id": int(doc_id),
                    "n_pages": None,
                    "text": None,
                    "n_bytes": None,
                    "ok": False,
                    "err": None,
                }
                try:
                    data = bytes(blob)
                    row["n_bytes"] = len(data)
                    n_pages, text = extract_pdf_text(data)
                    row.update(n_pages=n_pages, text=text, ok=True)
                except Exception as exc:  # noqa: BLE001 — per-doc isolation
                    row["err"] = f"{type(exc).__name__}: {exc}"[:500]
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", content_col).mapInPandas(batches, PDF_TEXT_SCHEMA)

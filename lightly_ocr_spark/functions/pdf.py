"""Dependency-free PDF text extraction — the "PDF/layout parse" leg of
main-content extraction (north_rule), alongside the HTML tokenizer.

Reference analog: the recognizer turns an opaque byte buffer into text
(`ocr/pipeline.py:106-119` decodes image buffers; here the buffer is a PDF
content stream).  No PDF library ships in this container and none is
needed: the subset below covers the operators real text-bearing PDFs use.

Extraction contract (deterministic; fuzz-tested via the `make_pdf`
round-trip in tests/test_pdf.py):

* Only content inside ``BT .. ET`` text objects is extracted.
* Show operators contribute text: ``Tj``, ``'`` and ``"`` show the
  preceding literal/hex string; ``TJ`` shows its array — string elements
  CONCATENATED, numeric kerning elements ignored (kerning adjustments are
  intra-word; word gaps in real PDFs come as separate show ops or explicit
  spaces).
* Literal strings ``( .. )`` decode the escapes \\n \\r \\t \\b \\f \\( \\)
  \\\\ and \\ooo octal, drop backslash-newline continuations, pass balanced
  unescaped parens through, and ignore a lone backslash (PDF 32000 §7.3.4).
  Hex strings ``< .. >`` decode hex pairs, odd final digit padded with 0.
* Within one BT block, show results are joined by a single space; blocks
  are joined by a newline.  Positioning operators (Td/TD/T*/Tm) create no
  further structure: the engine's final whitespace canonicalization
  (R3, `functions/extract._normalize_block_text` discipline) collapses runs
  anyway, so only word boundaries matter.
* Content streams with ``/FlateDecode`` are inflated with zlib; streams
  with other filters, undecodable bytes, or truncation are SKIPPED, never
  raised — a corrupt object costs its own text only.
* String bytes decode as UTF-8 with latin-1 fallback, the same discipline
  as the HTML path (`contract.decode_page_bytes`).

Output is whitespace-canonicalized like the HTML engine's blocks: runs of
whitespace become single spaces within a block, blocks separated by a
single newline, leading/trailing whitespace trimmed.
"""

from __future__ import annotations

import re
import zlib

PDF_MAGIC = b"%PDF-"

# the stream keyword must directly follow its dictionary's '>>' (PDF 32000
# §7.3.8.1) — anchoring on that prevents BOTH 'endstream\n' (which contains
# 'stream\n') and any literal '...stream' at end-of-line inside an
# uncompressed object from fabricating a pseudo-stream that spans into the
# next object and duplicates its text
_STREAM_RE = re.compile(rb">>[ \t\r\n]*stream\r?\n")

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}

_DELIMS = b"()<>[]{}/%"
_WHITESPACE = b"\x00\t\n\x0c\r "


def _decode_bytes(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


# backstop for pathological inputs: a real stream dict (even with long
# /DecodeParms or inline metadata) fits well under this; without a cap a
# crafted payload of '>>' runs would make the backwards scan quadratic
_DICT_SCAN_CAP = 1 << 20


def _dict_before(payload: bytes, close_start: int) -> bytes | None:
    """The balanced << ... >> dictionary whose closing '>>' begins at
    `close_start`; None when no balanced opener exists (not a real stream
    object).  Nested dictionaries (/DecodeParms << ... >>) are handled by
    depth counting; delimiters inside literal strings can in principle
    fool a backwards scan, but stream dicts carry names/numbers, and the
    failure mode is a skipped stream, never a crash."""
    depth = 1
    j = close_start - 1
    lo = max(0, close_start - _DICT_SCAN_CAP)
    while j >= lo:
        pair = payload[j:j + 2]
        if pair == b">>":
            depth += 1
            j -= 2
        elif pair == b"<<":
            depth -= 1
            if depth == 0:
                return payload[j:close_start + 2]
            j -= 2
        else:
            j -= 1
    return None


def _content_streams(payload: bytes) -> list[bytes]:
    """All stream payloads, FlateDecode inflated; broken ones skipped."""
    out = []
    for m in _STREAM_RE.finditer(payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            continue
        raw = payload[start:end]
        # the spec puts ONE EOL before `endstream`; compressed data may
        # itself end in 0x0a/0x0d bytes, so strip a single EOL, not a run
        if raw.endswith(b"\r\n"):
            data = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            data = raw[:-1]
        else:
            data = raw
        # the stream dict is the balanced << ... >> whose closing '>>'
        # is the start of the `stream` keyword match — scan it backwards
        # by nesting depth instead of a fixed-size window (a dict longer
        # than the window hid its /Filter, so raw deflate bytes were
        # token-scanned as 'text').  No balanced dict -> not a real
        # stream object, skip it rather than guess.
        head = _dict_before(payload, m.start())
        if head is None:
            continue
        if b"/Filter" in head:
            if b"/FlateDecode" not in head:
                continue          # unsupported filter: skip, don't guess
            try:
                data = zlib.decompress(data)
            except zlib.error:
                try:  # writer omitted the EOL: the stripped byte was real
                    data = zlib.decompress(raw)
                except zlib.error:
                    continue
        out.append(data)
    return out


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at the '(' byte; returns (decoded
    bytes, index past the closing paren)."""
    assert data[i] == 0x28  # (
    i += 1
    depth = 1
    buf = bytearray()
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                i += 1
                break
            e = data[i + 1]
            if e in _ESCAPES:
                buf += _ESCAPES[e]
                i += 2
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                j = i + 1
                o = 0
                while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    o = o * 8 + (data[j] - 0x30)
                    j += 1
                buf.append(o & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 2
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # lone backslash: ignored
                buf.append(e)
                i += 2
        elif c == 0x28:
            depth += 1
            buf.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(buf), i + 1
            buf.append(c)
            i += 1
        else:
            buf.append(c)
            i += 1
    return bytes(buf), i  # unterminated: keep what we have


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a hex string starting at '<'; returns (bytes, index past '>')."""
    end = data.find(b">", i + 1)
    if end < 0:
        end = len(data)
    digits = bytes(
        c for c in data[i + 1:end]
        if c in b"0123456789abcdefABCDEF"
    )
    if len(digits) % 2:
        digits += b"0"
    try:
        raw = bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        raw = b""
    return raw, min(end + 1, len(data))


def _is_number(tok: bytes) -> bool:
    """PDF numeric operand: digits with optional sign/decimal point."""
    t = tok.lstrip(b"+-")
    return bool(t) and all(c in b"0123456789." for c in t)


def _skip_dict(data: bytes, i: int) -> int:
    """Skip a << .. >> dictionary (balanced), starting at the first '<'."""
    depth = 0
    n = len(data)
    while i < n - 1:
        if data[i:i + 2] == b"<<":
            depth += 1
            i += 2
        elif data[i:i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        else:
            i += 1
    return n


def _text_blocks(content: bytes) -> list[list[bytes]]:
    """Per BT..ET block: the byte-strings shown, in stream order."""
    blocks: list[list[bytes]] = []
    cur: list[bytes] | None = None
    last_string: bytes | None = None
    arr: list[bytes] | None = None       # open [ ... ] being collected
    last_array: list[bytes] | None = None  # most recently closed array
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c in _WHITESPACE:
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # literal string
            s, i = _parse_literal(content, i)
            if arr is not None:
                arr.append(s)
            else:
                last_array = None  # anything between ] and TJ voids it
            last_string = s
        elif c == 0x3C:  # '<': dict or hex string
            if content[i:i + 2] == b"<<":
                i = _skip_dict(content, i)
            else:
                s, i = _parse_hex(content, i)
                if arr is not None:
                    arr.append(s)
                else:
                    last_array = None
                last_string = s
        elif c == 0x5B:  # [
            arr = []
            i += 1
        elif c == 0x5D:  # ]  — close: only a CLOSED array may feed TJ
            last_array = arr
            arr = None
            i += 1
        elif c == 0x2F:  # /name
            i += 1
            while i < n and content[i] not in _DELIMS \
                    and content[i] not in _WHITESPACE:
                i += 1
        else:  # operator word or number
            j = i
            while j < n and content[j] not in _DELIMS \
                    and content[j] not in _WHITESPACE:
                j += 1
            tok = content[i:j]
            if tok == b"BT":
                cur = []
            elif tok == b"ET":
                if cur:
                    blocks.append(cur)
                cur = None
            elif tok in (b"Tj", b"'", b"\""):
                if cur is not None and last_string is not None:
                    cur.append(last_string)
            elif tok == b"TJ":
                if cur is not None and last_array:
                    cur.append(b"".join(last_array))
            if tok and not _is_number(tok):
                # any non-numeric token other than the ] itself sits between
                # the array and a later TJ — TJ must not replay it then
                # (numbers are legitimate operands, e.g. `0 -14 Td`... but a
                # Td between ] and TJ is an operator and voids the array)
                last_array = None
            i = j if j > i else i + 1
    if cur:
        blocks.append(cur)  # unterminated BT: keep the text
    return blocks


def extract_pdf_text(payload: bytes | None) -> str:
    """PDF bytes -> canonicalized text ('' for non-PDF/empty/corrupt)."""
    if not payload or not payload.startswith(PDF_MAGIC):
        return ""
    contents = _content_streams(payload)
    lines = []
    for content in contents:
        for block in _text_blocks(content):
            text = " ".join(_decode_bytes(s) for s in block)
            text = " ".join(text.split())  # R3 whitespace canonicalization
            if text:
                lines.append(text)
    return "\n".join(lines)


# --- deterministic synthesizer (test/bench corpus; also the fuzz oracle) ---

def _escape_literal(raw: bytes) -> bytes:
    return (
        raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def make_pdf(text: str, compress: bool = True, wrap: int = 60) -> bytes:
    """Minimal one-page PDF whose extraction round-trips `text` up to
    whitespace canonicalization.  Lines alternate between plain ``Tj``
    shows and kerned ``TJ`` arrays (split at a word boundary with the space
    kept inside the first element) so both show paths are exercised."""
    words = text.split()
    lines: list[list[str]] = [[]]
    width = 0
    for w in words:
        if width and width + 1 + len(w) > wrap:
            lines.append([])
            width = 0
        lines[-1].append(w)
        width += len(w) + (1 if width else 0)
    ops = [b"BT", b"/F1 11 Tf", b"72 720 Td"]
    for k, line in enumerate(ln for ln in lines if ln):
        raw = _escape_literal(" ".join(line).encode("utf-8"))
        if k % 2 == 0 or len(line) < 2:
            ops.append(b"(" + raw + b") Tj")
        else:
            head = _escape_literal((" ".join(line[:-1]) + " ").encode("utf-8"))
            tail = _escape_literal(line[-1].encode("utf-8"))
            ops.append(b"[(" + head + b") -120 (" + tail + b")] TJ")
        ops.append(b"0 -14 Td")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for k, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(k).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)

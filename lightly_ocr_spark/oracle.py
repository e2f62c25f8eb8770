"""Pure-Python reference extractor (the oracle).

Deliberately simple, single-threaded, step-by-step implementation of the
extraction contract (`lightly_ocr_spark.contract`).  This plays the role of
the reference's ground-truth labels in its evaluation loop
(`/root/reference/ocr/train/crnn.py:222-235`): the vectorized engine
(`functions/extract.py`) must produce byte-identical text per url.

The algorithm is intentionally *different* from the engine's fused scanner:
it materializes a visible-character stream with explicit block/link marker
sentinels, then runs each contract step as its own pass over plain lists.
Only the contract constants and the byte->str decode primitive are shared.
"""

from __future__ import annotations

import unicodedata
from bisect import bisect_right
from html import unescape

from lightly_ocr_spark.contract import (
    BLOCK_SEP,
    BLOCK_TAGS,
    CJK_RE,
    CONTROL_RE,
    EOS,
    EXPAND_MAX_LINK,
    EXPAND_MAX_WORDS,
    EXPAND_MIN_WORDS,
    MASTER_RE,
    MIN_SEG_CHARS,
    NONWS_RE,
    SEGMENT_SEP,
    TAG_NAME_RE,
    TAU_CONF,
    TAU_LINK,
    TAU_LOW,
    TAU_TEXT,
    WORD_CAP,
    WS_RUN_RE,
    canonicalize_newlines,
    decode_page_bytes,
    segment_score,
)

_BLOCK_MARK = ("B", -1)
_LINK_OPEN = ("L", -1)
_LINK_CLOSE = ("l", -1)
# Literal U+0000/0001/0002 in page text would collide with marker kinds; the
# normalizer strips all non-ws C0 controls anyway, so remap them to DEL
# (also stripped) before streaming.  EOS (U+0003) must survive for R8.
_MARKER_REMAP = {"\x00": "\x7f", "\x01": "\x7f", "\x02": "\x7f"}


def _visible_stream(canon: str) -> list[tuple[str, int]]:
    """Step A: (char, canonical_index) for visible text, with marker tuples
    for block boundaries and link open/close."""
    stream: list[tuple[str, int]] = []

    def emit_text(run: str, off: int) -> None:
        for k, ch in enumerate(run):
            stream.append((_MARKER_REMAP.get(ch, ch), off + k))

    pos = 0
    for m in MASTER_RE.finditer(canon):
        if m.start() > pos:
            emit_text(canon[pos : m.start()], pos)
        pos = m.end()
        tok = m.group(0)
        if len(tok) > 1 and tok[1] in "!?":
            continue  # comment / CDATA / doctype / processing instruction
        if m.group(1) is not None:
            continue  # raw-text element (script/style/noscript/template)
        nm = TAG_NAME_RE.match(tok)
        if nm is None:
            continue
        name = nm.group(1).lower()
        if name == "a":
            stream.append(_LINK_CLOSE if tok[1] == "/" else _LINK_OPEN)
        elif name in BLOCK_TAGS:
            stream.append(_BLOCK_MARK)
    if pos < len(canon):
        emit_text(canon[pos:], pos)
    return stream


def _split_blocks(stream: list[tuple[str, int]]) -> list[list[tuple[str, int]]]:
    """Step B: split the stream on block markers (link markers stay inline)."""
    regions: list[list[tuple[str, int]]] = []
    cur: list[tuple[str, int]] = []
    for item in stream:
        if item == _BLOCK_MARK:
            regions.append(cur)
            cur = []
        else:
            cur.append(item)
    regions.append(cur)
    return regions


def _region_pieces(
    region: list[tuple[str, int]], depth: int = 0
) -> tuple[list[tuple[str, bool]], int]:
    """Step C: maximal index-contiguous char runs -> (raw_piece, is_link).

    `depth` is the anchor nesting level carried IN from previous regions —
    `<a>` is transparent content, so a block boundary does not close it;
    returns the level carried OUT."""
    pieces: list[tuple[str, bool]] = []
    buf: list[str] = []
    prev_idx: int | None = None
    buf_link = False

    def close() -> None:
        nonlocal buf
        if buf:
            pieces.append(("".join(buf), buf_link))
        buf = []

    for item in region:
        if item == _LINK_OPEN:
            close()
            depth += 1
            prev_idx = None
            continue
        if item == _LINK_CLOSE:
            close()
            depth = max(0, depth - 1)
            prev_idx = None
            continue
        ch, idx = item
        if prev_idx is not None and idx != prev_idx + 1:
            close()
        if not buf:
            buf_link = depth > 0
        buf.append(ch)
        prev_idx = idx
    close()
    return pieces, depth


def _normalize(raw: str) -> str:
    """Step D: R8 truncate, R9 charset scrub, R3 whitespace, NFC — each its
    own pass (independent restatement of the contract order)."""
    if EOS in raw:
        raw = raw.split(EOS, 1)[0]
    kept: list[str] = []
    for ch in raw:
        o = ord(ch)
        if o == 0xA0:
            kept.append(" ")
        elif o in (0x200B, 0xFEFF):
            continue
        elif CONTROL_RE.match(ch):
            continue
        else:
            kept.append(ch)
    collapsed = " ".join(p for p in WS_RUN_RE.split("".join(kept)) if p)
    return unicodedata.normalize("NFC", collapsed)


class OracleBlock:
    def __init__(self, region: list[tuple[str, int]], link_depth_in: int = 0):
        pieces, self.link_depth_out = _region_pieces(region, link_depth_in)
        unescaped = [(unescape(p), is_link) for p, is_link in pieces]
        self.link_chars = sum(
            len(WS_RUN_RE.sub("", u)) for u, is_link in unescaped if is_link
        )
        self.total_chars = sum(len(WS_RUN_RE.sub("", u)) for u, _ in unescaped)
        self.text = _normalize("".join(u for u, _ in unescaped))
        self.words = len(self.text.split()) + len(CJK_RE.findall(self.text))
        self.r = min(1.0, self.words / WORD_CAP)
        self.link_density = (
            self.link_chars / self.total_chars if self.total_chars > 0 else 0.0
        )
        visible = [
            (ch, idx) for ch, idx in region
            if idx >= 0 and NONWS_RE.match(ch)
        ]
        self.start = visible[0][1] if visible else -1
        self.end = visible[-1][1] + 1 if visible else -1


def oracle_extract(raw_html: bytes | None) -> dict:
    """Run the full contract, one explicit step at a time."""
    decoded = decode_page_bytes(raw_html)
    canon, removals = canonicalize_newlines(decoded)

    regions = _split_blocks(_visible_stream(canon))
    blocks = []
    depth = 0
    for r in regions:
        b = OracleBlock(r, depth)
        depth = b.link_depth_out
        if b.text:
            blocks.append(b)

    # D4: dual threshold
    on = [(b.r >= TAU_LOW) and (b.link_density <= TAU_LINK) for b in blocks]

    # D5: maximal runs
    runs: list[list[int]] = []
    for i, flag in enumerate(on):
        if flag:
            if runs and runs[-1][-1] == i - 1:
                runs[-1].append(i)
            else:
                runs.append([i])

    # D6: expansion, one short link-light neighbor per side, left-to-right
    taken = set(i for run in runs for i in run)
    segments: list[dict] = []
    for run in runs:
        members = list(run)
        lo, hi = run[0], run[-1]
        if lo - 1 >= 0 and (lo - 1) not in taken:
            b = blocks[lo - 1]
            if EXPAND_MIN_WORDS <= b.words <= EXPAND_MAX_WORDS and b.link_density <= EXPAND_MAX_LINK:
                members = [lo - 1] + members
                taken.add(lo - 1)
        if hi + 1 < len(blocks) and (hi + 1) not in taken:
            b = blocks[hi + 1]
            if EXPAND_MIN_WORDS <= b.words <= EXPAND_MAX_WORDS and b.link_density <= EXPAND_MAX_LINK:
                members = members + [hi + 1]
                taken.add(hi + 1)
        segments.append({"members": members, "core": run})

    # F5 / F6 / R10 / F4 — one filter per pass
    segments = [
        s for s in segments
        if sum(len(blocks[i].text) for i in s["members"]) >= MIN_SEG_CHARS
    ]
    segments = [
        s for s in segments if max(blocks[i].r for i in s["core"]) >= TAU_TEXT
    ]
    for s in segments:
        s["score"] = segment_score(
            [(blocks[i].r, blocks[i].words) for i in s["core"]]
        )
    segments = [s for s in segments if s["score"] > TAU_CONF]

    # R6 collapse + R11 stitch + D9 remap
    seg_texts: list[str] = []
    spans: list[tuple[int, int, float]] = []
    for s in segments:
        lines: list[str] = []
        for i in s["members"]:
            if not lines or lines[-1] != blocks[i].text:
                lines.append(blocks[i].text)
        seg_texts.append(BLOCK_SEP.join(lines))
        c0 = blocks[s["members"][0]].start
        c1 = blocks[s["members"][-1]].end
        spans.append(
            (
                c0 + bisect_right(removals, c0),
                # exclusive end: a removal AT c1 is past the span
                c1 + bisect_right(removals, c1 - 1),
                s["score"],
            )
        )

    return {
        "text": SEGMENT_SEP.join(seg_texts),
        "spans": spans,
        "n_blocks": len(blocks),
    }

"""The frozen extraction contract — every constant the engine and the oracle share.

This module is the graft's analog of the reference's ``ocr/config.yml`` plus the
frozen label alphabet (``/root/reference/ocr/net.py:119``,
``/root/reference/ocr/tools/recog_utils.py:22``): the *specification* both the
vectorized Spark path and the pure-Python oracle implement.  Implementations
live elsewhere (``functions/extract.py`` vs ``oracle.py``) and are written
independently; ONLY the constants and the byte→str decode primitive below are
shared, so a divergence in logic is caught by the byte-identity tests while a
divergence in the *spec* is impossible by construction.

Threshold lineage (reference → graft):

==================  =====================================  =====
graft constant      reference origin                       value
==================  =====================================  =====
TAU_LOW             ``low_text`` (net.py:48, config)        0.4
TAU_LINK            graft-specific choice (the reference's
                    ``linkThreshold`` at net.py:49 is 0.4;
                    0.35 was tuned for link-density semantics
                    and is frozen into the goldens)           0.35
TAU_TEXT            ``text_threshold`` (net.py:47)          0.7
TAU_CONF            serve threshold (pipeline.py:119)       0.7
MIN_SEG_CHARS       CC area >= 10 (det_utils.py:50-52)      10
WORD_CAP            score saturation (softmax max≈1)        10
EXPAND_MIN_WORDS    dilation budget (det_utils.py:58-71)    2
EXPAND_MAX_WORDS    dilation budget                         6
EXPAND_MAX_LINK     same graft-specific 0.35 as TAU_LINK    0.35
EOS                 ``[s]`` token (recog_utils.py:57)       U+0003
==================  =====================================  =====
"""

from __future__ import annotations

import math
import re

# ---------------------------------------------------------------------------
# Thresholds (D4 dual-threshold, F4-F6 filters, D6 expansion budget)
# ---------------------------------------------------------------------------
TAU_LOW = 0.4          # block "on" if region score r >= TAU_LOW          (D4)
TAU_LINK = 0.35        # ... and link_density <= TAU_LINK                 (D4)
TAU_TEXT = 0.7         # segment kept if max core r >= TAU_TEXT           (F6)
TAU_CONF = 0.7         # segment kept if score (prod of core r) > TAU_CONF (F4)
MIN_SEG_CHARS = 10     # segment kept if total normalized chars >= this   (F5)
WORD_CAP = 10.0        # r = min(1.0, words / WORD_CAP)                   (D3)
EXPAND_MIN_WORDS = 2   # absorb neighbor block only if words >= this      (D6)
EXPAND_MAX_WORDS = 6   # ... and words <= this; 1-word neighbors are
                       # "Share"/"Tweet"-style chrome, never headlines     (D6)
EXPAND_MAX_LINK = 0.35 # ... and its link_density <= this                 (D6)
EOS = "\x03"           # span text truncated at first EOS sentinel        (R8)

# ---------------------------------------------------------------------------
# Tokenizer grammar (D3).  A single master scanner: everything that is not a
# match is a text run.  Raw-text elements (script/style/...) and comments are
# consumed whole so their contents never become text.
# ---------------------------------------------------------------------------
# script/style/noscript/template/title are HTML raw-text/metadata elements;
# svg/math are foreign content whose text nodes (axis labels, formula
# source) are never main content — all consumed whole as invisible.
RAW_TEXT_ELEMENTS = (
    "script", "style", "noscript", "template", "title", "svg", "math"
)

# Group 1: raw-text element name; group 2: "/" for close tags; group 3: tag
# name (None for every invisible construct) — classification happens in the
# C regex engine, not in per-match Python.
#
# Tag bodies are quote-aware (`ATTRS`): a '>' inside a quoted attribute value
# does NOT end the tag (HTML5 attribute-value-quoted state) — real pages
# carry '>' in inline handlers/JSON attributes.  A tag with an UNBALANCED
# quote fails the tag branch entirely and its '<' is treated as literal text
# (conservative; deterministic).  Alternatives are disjoint on their first
# character, so matching stays linear.
ATTRS = "(?:\"[^\"]*\"|'[^']*'|[^>'\"])*"
MASTER_PATTERN = (
    r"<!--.*?(?:-->|$)"                                          # comment
    r"|<(script|style|noscript|template|title|svg|math)\b" + ATTRS  # raw text
    + r">.*?(?:</\1\s*>|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"                                # CDATA
    r"|<\?.*?(?:\?>|$)"                                          # proc. instr.
    r"|<(/?)([a-zA-Z][a-zA-Z0-9]*)" + ATTRS + r">"               # tag
    r"|<![a-zA-Z][^>]*>"                                         # doctype etc.
)
MASTER_RE = re.compile(MASTER_PATTERN, re.DOTALL | re.IGNORECASE)

# Tags that terminate the current block (both open and close forms).
BLOCK_TAGS = frozenset(
    """p div br h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tfoot tr
    td th section article header footer nav aside main blockquote pre form
    fieldset hr head body html figure figcaption details summary address
    center""".split()
)

TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)", re.ASCII)

# ---------------------------------------------------------------------------
# Normalization contract (R3, R9): applied per block, in this exact order.
#   1. HTML-entity unescape (stdlib html.unescape on each text run)
#   2. truncate at first EOS sentinel                                    (R8)
#   3. NBSP -> space; ZWSP / BOM-in-text removed                         (R9)
#   4. non-whitespace C0 controls + DEL removed                          (R9)
#   5. all whitespace runs -> single space, strip ends                   (R3)
#   6. unicodedata NFC                                                   (R9)
# ---------------------------------------------------------------------------
TRANSLATE_MAP = {0x00A0: " ", 0x200B: None, 0xFEFF: None}
CONTROL_RE = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")  # keeps \t\n\v\f\r (ws)
WS_RUN_RE = re.compile(r"\s+")
NONWS_RE = re.compile(r"\S")  # "visible char" for span bounds (D7)

# CJK scripts carry no spaces; for density purposes each CJK codepoint counts
# as a word on top of whitespace tokenization (D3 region score):
#   words(text) = len(text.split()) + len(CJK_RE.findall(text))
CJK_RE = re.compile(
    r"[぀-ヿ㐀-䶿一-鿿가-힯豈-﫿]"
)

# Stitching (R11): blocks within a segment joined by BLOCK_SEP after collapsing
# consecutive duplicate lines (R6, the CTC-collapse analog); segments joined by
# SEGMENT_SEP in reading order (D10 = document order).
BLOCK_SEP = "\n"
SEGMENT_SEP = "\n\n"

# UTF-8 BOM for the decode primitive.
BOM = b"\xef\xbb\xbf"

_CR_RE = re.compile(r"\r\n?")


def segment_score(core: list[tuple[float, int]]) -> float:
    """R10/A6: segment confidence = word-weighted product of core block
    densities, ``exp(fsum(w_i * log d_i) / fsum(w_i))``.

    The reference's confidence is the product of per-step max softmax probs
    (``ocr/net.py:190``); in the graft each *word* is a decode step and every
    word of block i carries that block's density d_i, so the per-step product
    normalized by step count is a word-weighted geometric mean.  A 4-word
    headline (d=0.4) next to a 60-word paragraph (d=1.0) barely dents the
    confidence, while a run of uniformly thin blocks stays below the F4
    threshold (0.7, ``pipeline.py:119``).  This exact float recipe is part of
    the contract: oracle and engine both call it, so scores are bit-equal.

    `core`: (density, words) per core block; words >= 1 by construction.
    """
    tot = float(sum(w for _, w in core))
    return math.exp(
        math.fsum(w * math.log(max(d, 1e-12)) for d, w in core) / tot
    )


def decode_page_bytes(raw: bytes | bytearray | memoryview | None) -> str:
    """D1: deterministic ``html: binary`` → ``str`` decode.

    Strict UTF-8 first (BOM stripped), byte-preserving latin-1 fallback —
    never chardet (nondeterministic).  Shared by oracle and engine: this is
    part of the *contract*, like the reference's fixed mean/variance
    normalization constants (``ocr/tools/imgproc.py:19-25``).
    """
    if raw is None:
        return ""
    b = bytes(raw)
    if b.startswith(BOM):
        b = b[len(BOM):]
    try:
        return b.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def canonicalize_newlines(s: str) -> tuple[str, list[int]]:
    """D1/D9: ``\\r\\n`` → ``\\n``, lone ``\\r`` → ``\\n``; returns the canonical
    string plus the sorted canonical positions where a character was *removed*
    (each ``\\r\\n`` collapse), so span offsets can be remapped back to
    original decoded-string coordinates (the reference's inverse-ratio
    rescale, ``ocr/tools/det_utils.py:259-265``).

    Original offset of an INCLUSIVE canonical offset ``i`` is
    ``i + bisect_right(removals, i)``; an EXCLUSIVE end ``e`` maps to
    ``e + bisect_right(removals, e - 1)`` — a removal sitting exactly at
    ``e`` (the block ends right before a collapsed ``\\r\\n``) lies past
    the span and must not shift it, else the original-coordinate slice
    gains a stray trailing ``\\r``.
    """
    if "\r" not in s:
        return s, []
    removals: list[int] = []
    shift = 0
    for m in _CR_RE.finditer(s):
        if m.group() == "\r\n":
            removals.append(m.start() - shift)  # canonical pos of the \n
            shift += 1
    return s.replace("\r\n", "\n").replace("\r", "\n"), removals

"""Unit tests for the frozen contract primitives (SURVEY.md §5.1)."""

import math
from bisect import bisect_right

from lightly_ocr_spark.contract import (
    canonicalize_newlines,
    decode_page_bytes,
    segment_score,
)


class TestDecode:
    def test_utf8(self):
        assert decode_page_bytes("héllo".encode()) == "héllo"

    def test_bom_stripped(self):
        assert decode_page_bytes(b"\xef\xbb\xbfabc") == "abc"

    def test_latin1_fallback_byte_preserving(self):
        raw = b"caf\xe9 \xff\xfe"
        out = decode_page_bytes(raw)
        assert out == "café ÿþ"
        assert out.encode("latin-1") == raw  # byte-preserving

    def test_none_and_empty(self):
        assert decode_page_bytes(None) == ""
        assert decode_page_bytes(b"") == ""


class TestNewlines:
    def test_crlf_collapsed(self):
        c, rem = canonicalize_newlines("ab\r\ncd\re\n")
        assert c == "ab\ncd\ne\n"
        assert rem == [2]

    def test_remap_identity_without_cr(self):
        c, rem = canonicalize_newlines("plain text\n")
        assert rem == [] and c == "plain text\n"

    def test_remap_roundtrip(self):
        orig = "ab\r\ncd\r\nef"
        c, rem = canonicalize_newlines(orig)
        # canonical index of 'e' is 6 -> original index 8
        i = c.index("e")
        assert orig[i + bisect_right(rem, i)] == "e"
        i = c.index("c")
        assert orig[i + bisect_right(rem, i)] == "c"


def test_ws_class_equals_isspace():
    """The engine's `' '.join(s.split())` fast path is only valid if `\\s`
    and `str.isspace` agree on EVERY codepoint (contract invariant)."""
    import re

    ws = re.compile(r"\s")
    for cp in range(0x110000):
        c = chr(cp)
        assert bool(ws.match(c)) == c.isspace(), hex(cp)


class TestSegmentScore:
    def test_single_block_is_density(self):
        assert math.isclose(segment_score([(0.5, 7)]), 0.5, rel_tol=1e-12)

    def test_exp_sum_log_equals_product_form(self):
        # FIXTURES.md §C: exp-sum-log path equals direct product within 1e-12
        d = [(0.9, 1), (0.8, 1), (0.95, 1)]
        direct = (0.9 * 0.8 * 0.95) ** (1.0 / 3.0)
        assert abs(segment_score(d) - direct) < 1e-12

    def test_weighting_favours_long_blocks(self):
        heavy_good = segment_score([(0.4, 4), (1.0, 60)])
        unweighted = segment_score([(0.4, 1), (1.0, 1)])
        assert heavy_good > 0.9 > unweighted

    def test_floor_on_zero_density(self):
        assert segment_score([(0.0, 5)]) > 0.0

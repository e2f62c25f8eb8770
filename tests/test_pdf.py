"""PDF extraction tests: operator-level decode semantics, corrupt-input
safety, the make_pdf round-trip fuzz, and the fused Spark query."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightly_ocr_spark.functions.pdf import (
    extract_pdf_text,
    make_pdf,
)


def collapse(s: str) -> str:
    return " ".join(s.split())


def wrap_pdf(content: bytes, filt: bytes = b"") -> bytes:
    """Bare-bones PDF around one content stream (no xref — the extractor
    must not need one)."""
    return (
        b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )


class TestPdfOperators:
    def test_tj_and_quote_operators(self):
        pdf = wrap_pdf(b"BT (one) Tj (two) ' (three) \" ET")
        assert extract_pdf_text(pdf) == "one two three"

    def test_tj_array_concatenates_and_ignores_kerning(self):
        pdf = wrap_pdf(b"BT [(Hel) -30 (lo) 12 ( wor) (ld)] TJ ET")
        assert extract_pdf_text(pdf) == "Hello world"

    def test_escapes_octal_and_specials(self):
        pdf = wrap_pdf(rb"BT (a\(b\)c \\ d \110\111 e\tf) Tj ET")
        assert extract_pdf_text(pdf) == "a(b)c \\ d HI e f"

    def test_hex_strings(self):
        pdf = wrap_pdf(b"BT <48656C6C6F> Tj <2077 6F72 6C6> Tj ET")
        # odd final digit pads with 0: 0x6C,0x60 = "l`"
        assert extract_pdf_text(pdf) == "Hello worl`"

    def test_tj_without_preceding_array_shows_nothing_stale(self):
        """A TJ with no freshly-closed array must not replay an earlier
        array (strings seen after `]` used to pollute the closed array)."""
        pdf = wrap_pdf(b"BT [(first)] Td (solo) Tj TJ ET")
        assert extract_pdf_text(pdf) == "solo"
        pdf2 = wrap_pdf(b"BT [(arr)] TJ (post) Tj TJ ET")
        assert extract_pdf_text(pdf2) == "arr post"

    def test_text_outside_bt_et_ignored(self):
        pdf = wrap_pdf(b"(chrome) Tj BT (content) Tj ET (footer) Tj")
        assert extract_pdf_text(pdf) == "content"

    def test_inline_dict_skipped(self):
        pdf = wrap_pdf(
            b"BT /Span << /ActualText (alt) >> BDC (real) Tj EMC ET"
        )
        assert extract_pdf_text(pdf) == "real"

    def test_multiple_blocks_newline_separated(self):
        pdf = wrap_pdf(b"BT (para one) Tj ET BT (para two) Tj ET")
        assert extract_pdf_text(pdf) == "para one\npara two"

    def test_flate_stream_decodes(self):
        content = zlib.compress(b"BT (squeezed) Tj ET")
        pdf = wrap_pdf(content, filt=b" /Filter /FlateDecode")
        assert extract_pdf_text(pdf) == "squeezed"

    def test_unsupported_filter_skipped_not_raised(self):
        pdf = wrap_pdf(b"\x00\x01garbage", filt=b" /Filter /DCTDecode")
        assert extract_pdf_text(pdf) == ""

    def test_corrupt_inputs_never_raise(self):
        assert extract_pdf_text(None) == ""
        assert extract_pdf_text(b"") == ""
        assert extract_pdf_text(b"plain text, not pdf") == ""
        assert extract_pdf_text(b"%PDF-1.4 truncated right here") == ""
        whole = make_pdf("some words to be cut off midway through it all")
        for cut in (10, 50, len(whole) // 2, len(whole) - 3):
            extract_pdf_text(whole[:cut])  # must not raise
        # bit-flip inside the compressed stream: skipped, empty result
        broken = bytearray(whole)
        broken[whole.find(b"stream\n") + 10] ^= 0xFF
        assert extract_pdf_text(bytes(broken)) == ""

    def test_two_uncompressed_streams_no_duplication(self):
        """'endstream\\n' must not match as a stream opener: with two raw
        content streams the second block used to extract twice."""
        pdf = (
            b"%PDF-1.4\n4 0 obj\n<< /Length 26 >>\nstream\n"
            b"BT (first stream text) Tj ET\nendstream\nendobj\n"
            b"5 0 obj\n<< /Length 27 >>\nstream\n"
            b"BT (second stream text) Tj ET\nendstream\nendobj\n%%EOF\n"
        )
        assert extract_pdf_text(pdf) == "first stream text\nsecond stream text"

    def test_literal_stream_word_in_object_not_a_stream_opener(self):
        """The word 'stream' at end-of-line inside an object body must not
        open a pseudo-stream (only '>> stream' framing counts)."""
        pdf = (
            b"%PDF-1.4\n3 0 obj\n(notes about a stream\nof data)\nendobj\n"
            b"4 0 obj\n<< /Length 21 >>\nstream\n"
            b"BT (real text) Tj ET\nendstream\nendobj\n%%EOF\n"
        )
        assert extract_pdf_text(pdf) == "real text"

    def test_long_dict_flate_stream_still_decodes(self):
        """/Filter lookup must survive a dict longer than a few hundred
        bytes (long /DecodeParms etc.) — it used to scan only 512 bytes
        back and token-scan the raw deflate bytes as text."""
        content = zlib.compress(b"BT (big dict payload) Tj ET")
        pad = b"/X" + b"a" * 1200 + b" 0 "
        pdf = (
            b"%PDF-1.4\n4 0 obj\n<< " + pad + b"/Length "
            + str(len(content)).encode() + b" /Filter /FlateDecode "
            b">>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
        )
        assert extract_pdf_text(pdf) == "big dict payload"

    def test_dict_beyond_64kb_window_still_finds_filter(self):
        """Balanced-dict scan, not a fixed window: a >64 KB dict (the old
        window size) must still surface /Filter instead of token-scanning
        raw deflate bytes as text."""
        content = zlib.compress(b"BT (huge dict payload) Tj ET")
        pad = b"/Pad (" + b"x" * 70000 + b") "
        pdf = (
            b"%PDF-1.4\n4 0 obj\n<< /Filter /FlateDecode " + pad
            + b"/Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content
            + b"\nendstream\nendobj\n%%EOF\n"
        )
        assert extract_pdf_text(pdf) == "huge dict payload"

    def test_nested_decodeparms_dict_balanced(self):
        """/DecodeParms << ... >> nests inside the stream dict; depth
        counting must still find the OUTER opener and its /Filter."""
        content = zlib.compress(b"BT (nested dict payload) Tj ET")
        pdf = (
            b"%PDF-1.4\n4 0 obj\n<< /Filter /FlateDecode "
            b"/DecodeParms << /Predictor 1 /Columns 4 >> /Length "
            + str(len(content)).encode() + b" >>\nstream\n" + content
            + b"\nendstream\nendobj\n%%EOF\n"
        )
        assert extract_pdf_text(pdf) == "nested dict payload"

    def test_stream_without_balanced_dict_skipped(self):
        """A 'stream' keyword with a closing '>>' but no balanced opener is
        not a real stream object — skipped, never token-scanned."""
        junk = zlib.compress(b"BT (should never appear) Tj ET")
        pdf = (b"%PDF-1.4\ngarbage >>\nstream\n" + junk
               + b"\nendstream\n%%EOF\n")
        assert extract_pdf_text(pdf) == ""

    def test_unterminated_bt_keeps_text(self):
        pdf = wrap_pdf(b"BT (kept despite missing ET) Tj")
        assert extract_pdf_text(pdf) == "kept despite missing ET"


class TestMakePdfRoundtrip:
    def test_roundtrip_compressed_and_raw(self):
        t = ("The quick brown fox jumps over the lazy dog near the "
             "riverbank while (parenthetical) remarks and back\\slashes "
             "survive typesetting.")
        for comp in (True, False):
            assert collapse(extract_pdf_text(make_pdf(t, compress=comp))) \
                == collapse(t)

    def test_roundtrip_unicode(self):
        t = "héllo wörld — ünïcode ÿ prüfung ß über alles"
        assert collapse(extract_pdf_text(make_pdf(t))) == collapse(t)

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_categories=("Cs", "Cc"),
            ),
            min_size=0,
            max_size=400,
        )
    )
    def test_fuzz_roundtrip_whitespace_canonical(self, t):
        """For ANY text, extraction of its typeset PDF equals its
        whitespace-canonical form (the same invariant the HTML engine's
        23M-doc fuzz enforces, applied to the PDF leg)."""
        assert extract_pdf_text(make_pdf(t)) == collapse(t)


class TestPdfSparkQuery:
    pytestmark = pytest.mark.spark

    def test_query_matches_collapse_oracle(self, spark):
        from pyspark.sql import functions as F

        from lightly_ocr_spark.operators.extract_udf import extract_pdf_query

        sf = "/root/testdata/sf0.001"
        got = {r["url"]: r["text"]
               for r in extract_pdf_query(spark, sf).collect()}
        docs = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "text",
            F.trim(F.regexp_replace("text", r"\s+", " ")).alias("c"),
        ).collect()
        want = {
            f"pdf://{r['doc_id']}": r["c"]
            for r in docs
            # same raw-text printable-ASCII gate the query applies
            if all(" " <= ch <= "~" for ch in r["text"])
            and len(r["c"].split()) >= 8 and len(r["c"]) >= 10
        }
        assert got == want

    def test_mixed_corpus_routes_by_magic(self, spark):
        """One extract_pages job over a corpus mixing HTML and PDF payloads
        extracts both, preserving row identity — the north_rule's
        multi-format main-content extraction in a single fused stage."""
        from lightly_ocr_spark.operators.extract_udf import extract_pages

        rows = [
            ("html://1", None, b"<html><body><p>plain html paragraph with "
                               b"enough words here to clear the density "
                               b"gates comfortably</p></body></html>"),
            ("pdf://1", None, make_pdf("typeset pdf paragraph with enough "
                                       "words to pass any gate")),
            ("html://2", None, b"<p>second html doc body text words "
                               b"keep going longer</p>"),
            ("pdf://2", None, make_pdf("second pdf body text words keep "
                                       "going longer still")),
            ("bad://1", None, b"%PDF-1.4 truncated"),
        ]
        pages = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary"
        )
        got = {r["url"]: r for r in extract_pages(pages).collect()}
        assert got["pdf://1"]["text"] == ("typeset pdf paragraph with enough "
                                          "words to pass any gate")
        assert got["pdf://2"]["text"] == ("second pdf body text words keep "
                                          "going longer still")
        for u in ("html://1", "html://2"):
            assert "html" in got[u]["text"]       # html engine ran
        assert got["bad://1"]["text"] == ""        # corrupt pdf -> empty
        # pdf spans cover the output text exactly, score 1.0
        s = got["pdf://1"]["spans"]
        assert len(s) == got["pdf://1"]["n_blocks"] == 1
        assert s[0]["start"] == 0
        assert s[0]["end"] == len(got["pdf://1"]["text"])
        assert s[0]["score"] == 1.0

    def test_single_python_stage(self, spark):
        from tests.test_plan_shape import plan_of

        from lightly_ocr_spark.operators.extract_udf import extract_pdf_query

        plan = plan_of(
            extract_pdf_query(spark, "/root/testdata/sf0.001"), mode="simple"
        )
        assert plan.count("MapInPandas") == 1
        # round 6: exactly one Exchange is the `spread` fan-out of the
        # single-row-group scan (guide §2.5) — nothing else may shuffle
        assert plan.count("Exchange") <= 1
"""Frozen-golden gate (north_star byte-identity against COMMITTED hashes).

`fixtures/golden.parquet` was frozen in round 1.  test_oracle_vs_engine
proves engine == oracle; this file proves neither has drifted from the
frozen contract — a change that moves both implementations together still
fails here unless the contract change is intentional (then regenerate the
fixtures in the same commit and say why)."""

import hashlib

import pandas as pd

from lightly_ocr_spark.sources.synthetic import gen_pages

GOLDEN = "fixtures/golden.parquet"


def test_engine_matches_frozen_goldens():
    golden = pd.read_parquet(GOLDEN)
    assert len(golden) == 1200
    by_url = dict(zip(golden["url"], golden["text_sha256"]))
    from lightly_ocr_spark.functions.extract import extract_text

    checked = 0
    for row in gen_pages(1200):
        sha = hashlib.sha256(
            extract_text(row["html"]).text.encode()
        ).hexdigest()
        assert sha == by_url[row["url"]], row["url"]
        checked += 1
    assert checked == 1200


def test_pdf_engine_matches_frozen_goldens():
    """fixtures/golden_pdf.parquet freezes PAYLOAD BYTES + expected text
    sha (frozen round 2).  Unlike the HTML goldens, the inputs themselves
    are committed, so drift in either make_pdf or the extractor — even a
    coordinated one — fails here unless the contract change is deliberate
    (then regenerate in the same commit and say why)."""
    golden = pd.read_parquet("fixtures/golden_pdf.parquet")
    assert len(golden) == 284
    from lightly_ocr_spark.functions.pdf import extract_pdf_text

    for _, row in golden.iterrows():
        sha = hashlib.sha256(
            extract_pdf_text(bytes(row["payload"])).encode()
        ).hexdigest()
        assert sha == row["text_sha256"], row["url"]


def test_oracle_matches_frozen_goldens():
    golden = pd.read_parquet(GOLDEN)
    by_url = dict(zip(golden["url"], golden["text_sha256"]))
    from lightly_ocr_spark.oracle import oracle_extract

    for row in gen_pages(300):  # oracle is slower; spot-check a prefix
        sha = hashlib.sha256(
            oracle_extract(row["html"])["text"].encode()
        ).hexdigest()
        assert sha == by_url[row["url"]], row["url"]

"""Spark operator for the fused extraction pass.

One `mapInPandas` stage carries the whole detect+recognize pipeline
(D1-D11 + R1-R11) per Arrow batch — the graft of the reference's fused
detector→recognizer chain executed with no intermediate materialization
(`pipeline.py:65-87`).  Keeping it a single Python stage means exactly one
JVM↔Python Arrow round-trip per batch (the CPU↔GPU copy analog,
`net.py:79,105`).

Span arrays come back as three parallel primitive arrays and are zipped into
`array<struct<start,end,score>>` JVM-side (`arrays_zip` is codegen'd), so no
nested structs cross the Arrow boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lightly_ocr_spark.functions.extract import extract_batch
from lightly_ocr_spark.functions.pdf import PDF_MAGIC, extract_pdf_text
from lightly_ocr_spark.schemas import EXTRACT_RAW_SCHEMA


def _pdf_batch(payloads: pd.Series) -> pd.DataFrame:
    """PDF rows -> the same columns extract_batch emits.

    Span semantics for PDFs: one span per extracted text block, offsets
    into the OUTPUT text (a PDF's source offsets are meaningless after
    FlateDecode inflation, unlike HTML's D9 source remap); score 1.0 — the
    decode is deterministic, there is no density confidence to propagate."""
    import hashlib

    texts, starts, ends, scores, n_blocks, shas = [], [], [], [], [], []
    for raw in payloads:
        text = extract_pdf_text(raw)
        st: list[int] = []
        en: list[int] = []
        off = 0
        if text:
            for line in text.split("\n"):
                st.append(off)
                en.append(off + len(line))
                off += len(line) + 1
        texts.append(text)
        starts.append(st)
        ends.append(en)
        scores.append([1.0] * len(st))
        n_blocks.append(len(st))
        shas.append(hashlib.sha256(text.encode("utf-8")).hexdigest())
    return pd.DataFrame(
        {
            "text": pd.Series(texts, dtype="object"),
            "span_starts": pd.Series(starts, dtype="object"),
            "span_ends": pd.Series(ends, dtype="object"),
            "span_scores": pd.Series(scores, dtype="object"),
            "n_blocks": pd.Series(n_blocks, dtype="int32"),
            "extract_sha256": pd.Series(shas, dtype="object"),
        }
    )


def _extract_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["html"]
        is_pdf = payloads.map(
            lambda p: p is not None and bytes(p[:5]) == PDF_MAGIC
        ).to_numpy(dtype=bool)
        if is_pdf.any():
            # route by magic, reassemble in input order (positional index)
            parts = []
            if (~is_pdf).any():
                html_out = extract_batch(payloads[~is_pdf].reset_index(drop=True))
                html_out.index = (~is_pdf).nonzero()[0]
                parts.append(html_out)
            pdf_out = _pdf_batch(payloads[is_pdf].reset_index(drop=True))
            pdf_out.index = is_pdf.nonzero()[0]
            parts.append(pdf_out)
            out = pd.concat(parts).sort_index().reset_index(drop=True)
        else:
            out = extract_batch(payloads)
        out.insert(0, "url", pdf["url"].to_numpy())
        out.insert(1, "warc_ts", pdf["warc_ts"].to_numpy())
        yield out


def extract_pages(pages: DataFrame, keep_empty: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> extracted table (EXTRACTED_SCHEMA).

    Column pruning: only (url, warc_ts, html) are shipped to Python — the
    parquet scan never reads the golden `text`/`lang` columns.
    """
    raw = pages.select("url", "warc_ts", "html").mapInPandas(
        _extract_partition, schema=EXTRACT_RAW_SCHEMA
    )
    out = raw.select(
        "url",
        "warc_ts",
        "text",
        F.arrays_zip(
            F.col("span_starts").alias("start"),
            F.col("span_ends").alias("end"),
            F.col("span_scores").alias("score"),
        ).alias("spans"),
        "n_blocks",
        "extract_sha256",
        F.spark_partition_id().alias("part_id"),
    )
    if not keep_empty:
        out = out.filter(F.length("text") > 0)
    return out


def _dense_ascii_docs(spark, sf_dir: str) -> DataFrame:
    """documents rows restricted so extraction is SQL-predictable —
    printable-ASCII text, >= 8 words and >= 10 chars after collapse (the
    contract reduces to whitespace collapse for such paragraphs).  ONE
    definition shared by the HTML and PDF flagship queries so their
    eligibility gates cannot drift apart from each other or from the
    matching DuckDB oracle predicates.

    The scan is `spread` (round 6, guide §2.5): both flagship queries
    funnel this frame into a mapInPandas Arrow stage, and a
    single-row-group parquet file otherwise feeds EVERY Python extraction
    batch through one task — one core doing all the work regardless of
    cluster size."""
    from lightly_ocr_spark.plans.relational import spread

    d = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    collapsed = F.trim(F.regexp_replace("text", r"\s+", " "))
    return d.filter(
        ~F.col("text").rlike("[^ -~]")
        & (F.size(F.split(collapsed, " ")) >= 8)
        & (F.length(collapsed) >= 10)
    )


def documents_as_pages(spark, sf_dir: str) -> DataFrame:
    """Wrap the driver `documents` table into pages rows (deterministic HTML
    template), restricted via `_dense_ascii_docs`."""
    d = _dense_ascii_docs(spark, sf_dir)
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    return d.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), esc, F.lit("</p></body></html>")),
            "utf-8",
        ).alias("html"),
    )


def extract_documents_query(spark, sf_dir: str) -> DataFrame:
    """Flagship extraction with a SQL oracle: for a single dense ASCII
    paragraph the contract reduces to whitespace collapse, so DuckDB can
    predict the engine's output (and its sha256) exactly."""
    pages = documents_as_pages(spark, sf_dir)
    return extract_pages(pages).select("url", "text", "extract_sha256")


def _pdf_roundtrip_partition(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from lightly_ocr_spark.functions.pdf import extract_pdf_text, make_pdf

    for pdf in batches:
        yield pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "text": [extract_pdf_text(make_pdf(t)) for t in pdf["text"]],
            }
        )


def extract_pdf_query(spark, sf_dir: str) -> DataFrame:
    """The PDF leg of main-content extraction (north_rule "PDF/layout
    parse"): documents are typeset into real one-page FlateDecode PDFs and
    re-extracted — synthesis and extraction fused into ONE Arrow stage, no
    intermediate binary column crossing the boundary twice.  Under the same
    dense-ASCII-paragraph restriction as the HTML flagship (shared
    `_dense_ascii_docs` gate), the extraction contract reduces to
    whitespace collapse, so the DuckDB oracle predicts output text and
    sha256 exactly."""
    d = _dense_ascii_docs(spark, sf_dir)
    pages = d.select(
        F.concat(F.lit("pdf://"), F.col("doc_id")).alias("url"), "text"
    )
    out = pages.mapInPandas(
        _pdf_roundtrip_partition, schema="url string, text string"
    )
    return out.select(
        "url",
        "text",
        F.sha2(F.encode("text", "utf-8"), 256).alias("extract_sha256"),
    )

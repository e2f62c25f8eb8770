"""Combined enrichment stage: language-ID + fluency in ONE Arrow crossing.

Each `mapInPandas` stage costs a JVM↔Python round-trip of the text column;
running langid and fluency separately would ship the corpus through Arrow
twice.  This stage fuses them (same principle as the fused segment+decode
extraction UDF — SURVEY.md §2.9)."""

from __future__ import annotations

import re
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame

from lightly_ocr_spark.operators.fluency import bigram_logp
from lightly_ocr_spark.operators.langid import detect_lang

ENRICH_SCHEMA = ("url string, lang_pred string, bigram_logp double, "
                 "top_bigram_frac double")

_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_SIX_DP = Decimal("0.000001")


def _top_bigram_frac(text: str) -> float:
    """Share of the hottest word-bigram among all bigrams — SAME
    tokenization contract as `textstats.repetition_signals_df` (lowercase
    whitespace split, adjacent pairs), so the --max-rep gate means the
    same thing whichever stage computes it.  Counted here because it is
    ~free inside the Arrow crossing the pipeline already pays, while the
    JVM sorted-run fold costs ~110 s per 200 k docs as its own pass."""
    # Java-regex \s is ASCII-only ([ \t\n\x0b\f\r]); Python str.split()
    # splits on ALL Unicode whitespace (NBSP, ideographic space — common
    # in web text), which would tokenize such docs differently from the
    # JVM operator.  Split on exactly Java's class.
    words = _JAVA_WS.split(text.lower())
    words = [w for w in words if w]
    if len(words) < 2:
        return 0.0
    from collections import Counter

    counts = Counter(zip(words, words[1:]))
    frac = max(counts.values()) / (len(words) - 1)
    # HALF_UP at 6dp exactly as Spark rounds: BigDecimal.valueOf(double)
    # goes through Double.toString (shortest repr), then setScale(6,
    # HALF_UP) — Decimal(repr(x)).quantize replicates both steps, where
    # floor(x*1e6+0.5) can misround when x*1e6 loses the tie in binary.
    return float(
        Decimal(repr(frac)).quantize(_SIX_DP, rounding=ROUND_HALF_UP)
    )


def _enrich_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = pdf["text"]
        yield pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "lang_pred": texts.map(detect_lang),
                "bigram_logp": texts.map(bigram_logp).astype("float64"),
                "top_bigram_frac": texts.map(_top_bigram_frac)
                .astype("float64"),
            }
        )


def enrich_pages(extracted: DataFrame) -> DataFrame:
    """(url, text, ...) -> (url, lang_pred, bigram_logp, top_bigram_frac),
    one Python stage."""
    return extracted.select("url", "text").mapInPandas(
        _enrich_partition, schema=ENRICH_SCHEMA
    )

"""Combined enrichment stage: language-ID + fluency in ONE Arrow crossing.

Each `mapInPandas` stage costs a JVM↔Python round-trip of the text column;
running langid and fluency separately would ship the corpus through Arrow
twice.  This stage fuses them (same principle as the fused segment+decode
extraction UDF — SURVEY.md §2.9)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from lightly_ocr_spark.operators.fluency import bigram_logp
from lightly_ocr_spark.operators.langid import detect_lang

ENRICH_SCHEMA = ("url string, lang_pred string, bigram_logp double, "
                 "top_bigram_frac double")


def _top_bigram_frac(text: str) -> float:
    """Share of the hottest word-bigram among all bigrams — SAME
    tokenization contract as `textstats.repetition_signals_df` (lowercase
    whitespace split, adjacent pairs), so the --max-rep gate means the
    same thing whichever stage computes it.  Counted here because it is
    ~free inside the Arrow crossing the pipeline already pays, while the
    JVM sorted-run fold costs ~110 s per 200 k docs as its own pass."""
    words = text.lower().split()
    if len(words) < 2:
        return 0.0
    from collections import Counter
    import math

    counts = Counter(zip(words, words[1:]))
    frac = max(counts.values()) / (len(words) - 1)
    # HALF_UP at 6dp, matching Spark/DuckDB round(): Python's built-in
    # round() is banker's and disagrees on exact ties (1/128 -> 0.007812
    # vs 0.007813), which would let the --max-rep gate diverge from the
    # JVM operator at the threshold
    return math.floor(frac * 1e6 + 0.5) / 1e6


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

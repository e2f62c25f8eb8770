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

ENRICH_SCHEMA = "url string, lang_pred string, bigram_logp double"


def _enrich_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = pdf["text"]
        yield pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "lang_pred": texts.map(detect_lang),
                "bigram_logp": texts.map(bigram_logp).astype("float64"),
            }
        )


def enrich_pages(extracted: DataFrame) -> DataFrame:
    """(url, text, ...) -> (url, lang_pred, bigram_logp), one Python stage."""
    return extracted.select("url", "text").mapInPandas(
        _enrich_partition, schema=ENRICH_SCHEMA
    )

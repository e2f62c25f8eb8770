"""Randomized cross-engine oracle fuzz.

The driver gate (and tools/check_oracles.py) compares every Spark query
against its DuckDB oracle on the FIXTURE tables only.  This suite runs
the same pairs over SYNTHESIZED random documents tables — whitespace
runs, tabs/newlines, punctuation, digit noise, shared boilerplate
sentences, empty and single-word docs — pinning the round-5 portability
claims (hash-mod sampling thresholds, md5 hex-digit bit votes,
positional passage math, chunk-count math, NB ln/round discipline) on
arbitrary data rather than one corpus.
"""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracles import canon  # noqa: E402

# documents-table queries whose oracles must hold on ANY corpus
FUZZ_QUERIES = [
    "dd_simhash",
    "ta_stratified_sample",
    "ta_chunking",
    "dd_passage_dedup",
    "ta_token_count",
    "ta_fingerprint",
    "ml_nb_langid",
    "dd_minhash_pairs_md5",
    "ta_budget_select",
]

VOCAB = [f"word{i}" for i in range(400)] + [
    "the", "la", "el", "der", "and", "punct,ed", "semi;colon", "3.14",
    "UPPER", "MiXeD", "a", "x9",
]
BOILER = [
    "this boilerplate sentence repeats across many documents verbatim",
    "subscribe to our newsletter for updates and exclusive offers now",
    "all rights reserved contact the webmaster for further information",
]
SEPS = [" ", "  ", "\t", "\n", " \n ", "   "]


def _random_documents(seed: int, n: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        parts = []
        for _ in range(rng.randint(0, 60)):
            parts.append(rng.choice(VOCAB))
        if rng.random() < 0.4:  # inject shared passages at random spots
            pos = rng.randint(0, max(0, len(parts)))
            parts[pos:pos] = rng.choice(BOILER).split()
        sep_text = ""
        for j, w in enumerate(parts):
            sep_text += w + (rng.choice(SEPS) if j < len(parts) - 1 else "")
        if rng.random() < 0.05:
            sep_text = ""  # empty doc
        rows.append({
            "doc_id": i,
            "text": sep_text,
            "lang": rng.choice(["en", "fr", "es", "de", "zh"]),
            "source": rng.choice(["web", "pdf", "feed"]),
            "n_chars": len(sep_text),
        })
    return rows


@pytest.fixture(scope="module")
def fuzz_sf(spark, tmp_path_factory):
    """Write a random documents table shaped like the driver fixture."""
    import pandas as pd

    d = tmp_path_factory.mktemp("fuzz_sf")
    pdf = pd.DataFrame(_random_documents(seed=1337, n=400))
    pdf = pdf.astype({"doc_id": "int64", "n_chars": "int64"})
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_oracle_holds_on_random_corpus(spark, fuzz_sf, name):
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{fuzz_sf}/documents.parquet'"
    )
    sdf = entrymod.queries()[name](spark, fuzz_sf)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    cur = con.execute(entrymod.oracle_sql()[name])
    orows = cur.fetchall()
    ocols = [c[0] for c in cur.description]
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    assert canon(srows, scols) == canon(orows, ocols), name

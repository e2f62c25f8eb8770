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
    "f1_length_filter",
    "f2_f3_charset_filter_scrub",
    "f7_validity_filter",
    "a2_exact_match_accuracy",
    "a5_edit_distance",
    "ta_quality_score",
    "ta_lang_id",
    "ta_url_normalize",
    "ta_host_cap",
    "ta_repetition",
    "ta_pii_scrub",
    "dd_exact",
    "dd_jaccard_words",
    "dd_decontaminate",
    "dd_components",
    "dd_simhash",
    "ta_stratified_sample",
    "ta_chunking",
    "dd_passage_dedup",
    "ta_token_count",
    "ta_fingerprint",
    "ml_nb_langid",
    "dd_minhash_pairs_md5",
    "ta_budget_select",
    "fn_scalar_surface",
    "s3_text_scan",
    # the FULL extraction engine (HTML construction -> fused Arrow
    # extraction) and the PDF leg, byte-compared against the
    # SQL-predicted oracle on random text
    "ex_extract_documents",
    "ex_extract_pdf",
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


# events-table queries: windows, sessionization (30-min gaps + ts
# tie-breaks), pivot, JSON extraction, quantiles — including the
# round-5 TZ-independent epoch-micros outputs
EVENT_FUZZ_QUERIES = [
    "w1_window_topk",
    "w2_sessionization",
    "a1_x2_json_event_stats",
    "a7_group_collect",
    "p1_pivot",
    "f4_confidence_threshold",
]


def _random_events(seed: int, n: int):
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    ts_pool = [
        base + dt.timedelta(seconds=rng.randint(0, 5 * 86400),
                            microseconds=rng.randint(0, 999_999))
        for _ in range(max(8, n // 5))
    ]
    for i in range(n):
        # draw some timestamps from a small pool so exact-tie ordering
        # (the event_id tie-break in every window) actually triggers
        ts = (rng.choice(ts_pool) if rng.random() < 0.3 else
              base + dt.timedelta(seconds=rng.randint(0, 5 * 86400),
                                  microseconds=rng.randint(0, 999_999)))
        rows.append({
            "event_id": i,
            "ts": ts,
            "user_id": rng.randint(0, 25),
            "event_type": rng.choice(
                ["click", "view", "purchase", "signup", "error"]),
            "value": round(rng.uniform(0, 1), 6),
            "props": ('{"k": %d}' % rng.randint(0, 99)
                      if rng.random() > 0.1 else None),
        })
    return rows


@pytest.fixture(scope="module")
def events_fuzz_sf(spark, tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("events_fuzz_sf")
    pdf = pd.DataFrame(_random_events(seed=4242, n=3000))
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf = pdf.astype({"event_id": "int64", "user_id": "int64"})
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


def _compare(spark, con, sf, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    cur = con.execute(entrymod.oracle_sql()[name])
    orows = cur.fetchall()
    ocols = [c[0] for c in cur.description]
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    assert canon(srows, scols) == canon(orows, ocols), name


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_oracle_holds_on_random_corpus(spark, fuzz_sf, name):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{fuzz_sf}/documents.parquet'"
    )
    _compare(spark, con, fuzz_sf, name)


@pytest.mark.parametrize("name", EVENT_FUZZ_QUERIES)
def test_oracle_holds_on_random_events(spark, events_fuzz_sf, name):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{events_fuzz_sf}/events.parquet'"
    )
    _compare(spark, con, events_fuzz_sf, name)

# embeddings-table queries: the whole similarity stack's float-fold
# discipline (in-element-order dots/norms, round-6 quantization, seeded
# hyperplanes, fixed-point Lloyd rounds) pinned on random vectors
EMBEDDING_FUZZ_QUERIES = [
    "sim_cosine_topk",
    "dd_embedding_neardup",
    "sim_knn_join",
    "sim_ivf_topk",
    "sim_lsh_topk",
    "sim_ivf_kmeans_topk",
]


def _random_embeddings(seed: int, n: int, dim: int = 64):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        v = rng.randn(dim).astype(np.float32)
        if i % 17 == 0 and i > 0:  # planted near-dups of vector 0
            v = (rows[0]["embedding"] + rng.randn(dim).astype(np.float32)
                 * 0.05)
        rows.append({
            "vec_id": i,
            "embedding": v.astype(np.float32),
            "label": int(rng.randint(0, 8)),
        })
    return rows


@pytest.fixture(scope="module")
def embeddings_fuzz_sf(spark, tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("emb_fuzz_sf")
    rows = _random_embeddings(seed=808, n=400)
    table = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        "embedding": pa.array(
            [r["embedding"].tolist() for r in rows],
            pa.list_(pa.float32()),
        ),
        "label": pa.array([r["label"] for r in rows], pa.int32()),
    })
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMBEDDING_FUZZ_QUERIES)
def test_oracle_holds_on_random_embeddings(spark, embeddings_fuzz_sf, name):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{embeddings_fuzz_sf}/embeddings.parquet'"
    )
    _compare(spark, con, embeddings_fuzz_sf, name)

# relational (TPC-H-ish) queries: aggregation/join/window/grouping-set
# semantics pinned on random tables
RELATIONAL_FUZZ_QUERIES = [
    "tpch_q1",
    "j1_broadcast_join",
    "j2_j3_semi_anti",
    "c1_r1_grouping_sets",
    "f9_cdc_merge",
    "s5_scan_projection",
    "t1_u1_sort_union",
    "s10_ddl_roundtrip",
]


def _random_relational(seed: int, n_orders: int):
    import datetime as dt

    rng = random.Random(seed)
    base = dt.date(1995, 1, 1)
    orders, lineitem = [], []
    for ok in range(n_orders):
        orders.append({
            "o_orderkey": ok,
            "o_custkey": rng.randint(0, n_orders // 10),
            "o_orderstatus": rng.choice(["O", "F", "P"]),
            "o_totalprice": round(rng.uniform(100, 50000), 2),
            "o_orderdate": dt.datetime.combine(
                base + dt.timedelta(days=rng.randint(0, 1500)),
                dt.time()),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW"]),
        })
        for ln in range(rng.randint(1, 4)):
            lineitem.append({
                "l_orderkey": ok,
                "l_partkey": rng.randint(0, 999),
                "l_suppkey": rng.randint(0, 99),
                "l_linenumber": ln,
                "l_quantity": float(rng.randint(1, 50)),
                "l_extendedprice": round(rng.uniform(10, 90000), 2),
                "l_discount": round(rng.uniform(0, 0.1), 2),
                "l_tax": round(rng.uniform(0, 0.08), 2),
                "l_returnflag": rng.choice(["A", "N", "R"]),
                "l_linestatus": rng.choice(["O", "F"]),
                "l_shipdate": dt.datetime.combine(
                    base + dt.timedelta(days=rng.randint(0, 1600)),
                    dt.time()),
            })
    # every customer key referenced by orders exists, plus orderless ones
    # (the j2_j3 anti-join needs genuinely inactive customers)
    custkeys = sorted({o["o_custkey"] for o in orders}
                      | {n_orders // 10 + i for i in range(20)})
    customer = [{
        "c_custkey": ck,
        "c_name": f"Customer#{ck}",
        "c_nationkey": rng.randint(0, 24),
        "c_acctbal": round(rng.uniform(-999, 9999), 2),
        "c_mktsegment": rng.choice(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD"]),
    } for ck in custkeys]
    supplier = [{
        "s_suppkey": sk,
        "s_name": f"Supplier#{sk}",
        "s_nationkey": rng.randint(0, 24),
        "s_acctbal": round(rng.uniform(-999, 9999), 2),
    } for sk in range(100)]
    nation = [{
        "n_nationkey": nk,
        "n_name": f"NATION{nk}",
        "n_regionkey": nk % 5,
    } for nk in range(25)]
    return orders, lineitem, customer, supplier, nation


@pytest.fixture(scope="module")
def relational_fuzz_sf(spark, tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("rel_fuzz_sf")
    orders, lineitem, customer, supplier, nation = _random_relational(
        seed=515, n_orders=800)
    casts = {
        "orders": (orders, {"o_orderkey": "int64", "o_custkey": "int64"},
                   ["o_orderdate"]),
        "lineitem": (lineitem, {"l_orderkey": "int64", "l_partkey": "int64",
                                "l_suppkey": "int64",
                                "l_linenumber": "int32"}, ["l_shipdate"]),
        "customer": (customer, {"c_custkey": "int64",
                                "c_nationkey": "int32"}, []),
        "supplier": (supplier, {"s_suppkey": "int64",
                                "s_nationkey": "int32"}, []),
        "nation": (nation, {"n_nationkey": "int32",
                            "n_regionkey": "int32"}, []),
    }
    for name, (rows, types, ts_cols) in casts.items():
        pdf = pd.DataFrame(rows).astype(types)
        for c in ts_cols:
            pdf[c] = pdf[c].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(d, f"{name}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", RELATIONAL_FUZZ_QUERIES)
def test_oracle_holds_on_random_relational(spark, relational_fuzz_sf, name):
    import duckdb

    con = duckdb.connect()
    for t in ["orders", "lineitem", "customer", "supplier", "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{relational_fuzz_sf}/{t}.parquet'"
        )
    _compare(spark, con, relational_fuzz_sf, name)

@pytest.fixture(scope="module")
def fuzz_sf_spaced(spark, tmp_path_factory):
    """Newline-free random documents: dd_line_dedup's oracle filters the
    constructed chunk list while the engine re-splits on newline — they
    agree exactly iff the source text has no embedded newlines (the
    documented query-construction assumption; the operator itself is
    input-agnostic and covered by its own tests)."""
    import pandas as pd

    global SEPS
    saved = SEPS
    SEPS = [" ", "  ", "\t", "   "]
    try:
        rows = _random_documents(seed=7331, n=400)
    finally:
        SEPS = saved
    d = tmp_path_factory.mktemp("fuzz_sf_spaced")
    pdf = pd.DataFrame(rows).astype({"doc_id": "int64", "n_chars": "int64"})
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def test_line_dedup_oracle_holds_on_newline_free_corpus(
    spark, fuzz_sf_spaced
):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{fuzz_sf_spaced}/documents.parquet'"
    )
    _compare(spark, con, fuzz_sf_spaced, "dd_line_dedup")


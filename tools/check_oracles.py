"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows.

    Container values (list/tuple/dict/set) are REJECTED, mirroring the
    driver gate: its pandas canonicalizer hashes cell values and dies with
    `unhashable type` on arrays (round-1 a7 failure).  Oracled queries must
    emit scalars only — join arrays into strings before returning them."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, (list, tuple, dict, set)):
                raise TypeError(
                    f"container value in column '{cols[i]}' "
                    f"({type(v).__name__}): the driver gate cannot hash "
                    "arrays — emit a joined scalar instead"
                )
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            else:
                v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from lightly_ocr_spark.plans.session import build_session

    spark = build_session("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # The driver correctness gate reports only the FIRST 50 queries()
    # entries (observed round 2: 54 registered -> 50 reported).  Fail loudly
    # if any oracled query sits beyond the reporting window, and say exactly
    # which entries would be truncated so it can never happen silently.
    DRIVER_REPORT_CAP = 50
    order = list(qs)
    truncated = order[DRIVER_REPORT_CAP:]
    # Ordering must be OPTIMAL: a rows-only entry may never occupy a report
    # slot while an oracled entry sits outside the window.  (With 50+
    # oracled queries the overflow is unavoidable — this local gate still
    # checks every one of them.)
    rows_only_inside = [
        q for q in order[:DRIVER_REPORT_CAP] if q not in oracles
    ]
    late_oracled = [q for q in truncated if q in oracles]
    if rows_only_inside and late_oracled:
        print(f"REGISTRY ERROR: rows-only {rows_only_inside} occupy driver "
              f"report slots while oracled {late_oracled} sit beyond the "
              f"{DRIVER_REPORT_CAP}-row window — reorder queries()")
        return 1
    if truncated:
        print(f"note: {len(order)} registered, driver reports the first "
              f"{DRIVER_REPORT_CAP}; beyond the window (checked locally "
              f"here): {truncated}")

    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            try:
                cs, cd = canon(srows, scols), canon(drows, dcols)
            except TypeError as e:
                print(f"FAIL {name}: canonicalize error: {e}")
                n_fail += 1
                continue
            if cs != cd:
                diffs = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Export the optimized physical plan of every driver-contract query to
PLANS/<name>.txt — the Spark analog of the reference's model-export tool
(`ocr/torch2onnx.py`: serialize the executable artifact for inspection).

Each file holds `explain("formatted")` output: scan pushdowns/pruning,
join strategies, exchange placement, and codegen spans are all reviewable
without running anything.

Usage: python tools/dump_plans.py [--sf /root/testdata/sf0.001] [--out PLANS]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="PLANS")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from lightly_ocr_spark.plans.session import build_session

    spark = build_session("plan-dump", cores=4, shuffle_partitions=4)
    os.makedirs(args.out, exist_ok=True)
    n_ok = n_err = 0
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            body = buf.getvalue()
        except Exception as e:  # streaming queries can't explain pre-start
            body = f"(no static plan: {type(e).__name__}: {e})\n"
            n_err += 1
        else:
            n_ok += 1
        with open(os.path.join(args.out, f"{name}.txt"), "w") as f:
            f.write(f"-- query: {name} (sf={args.sf})\n\n{body}")
    print(f"dumped {n_ok} plans ({n_err} without a static plan) "
          f"to {args.out}/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

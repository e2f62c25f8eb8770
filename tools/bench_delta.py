"""Per-query bench regression table between two BENCH_r{N}.json files.

Usage: python tools/bench_delta.py BENCH_r01.json BENCH_r02.json
Prints a markdown table (old s, new s, delta %) plus the headline
docs/sec movement, so per-round regressions are visible at a glance.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver files wrap the bench line in {"parsed": {...}}; accept both
    return d.get("parsed", d)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ov, nv = old.get("value"), new.get("value")
    if ov and nv:
        head = f"{ov} -> {nv} ({(nv / ov - 1) * 100:+.1f}%)"
    else:
        head = f"{ov} -> {nv} (missing value{'s' if not (ov or nv) else ''})"
    print(f"headline {old.get('metric')}: {head}")
    print()
    print("| query | old (s) | new (s) | delta |")
    print("|---|---|---|---|")
    qo, qn = old.get("queries", {}), new.get("queries", {})
    for k in sorted(set(qo) | set(qn)):
        a, b = qo.get(k), qn.get(k)
        if a is None or b is None:
            delta = "added" if a is None else "removed"
            print(f"| {k} | {a or '—'} | {b or '—'} | {delta} |")
        else:
            print(f"| {k} | {a} | {b} | {(b / a - 1) * 100:+.1f}% |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

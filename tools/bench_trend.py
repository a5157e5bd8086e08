"""Per-query bench trend: compare two bench outputs and flag regressions.

Usage::

    python tools/bench_trend.py BENCH_r01.json BENCH_r02.json [--threshold 1.3]

Accepts either the raw one-line JSON that ``bench.py`` prints or the
driver's wrapper record (``{"tail": "...{bench json}..."}``). Prints a
markdown table of every query whose time moved more than the threshold in
either direction, plus new/removed queries and totals.

Interpretation note (measured, see README "Bench trend"): this host shows
±25% co-tenant variance between sessions, so a <1.5x move on a sub-second
query is usually noise. Only trust a flagged regression when it reproduces
in ONE session with interleaved A/B runs (bench.py already does min-of-3
with cache clearing).
"""

from __future__ import annotations

import argparse
import json
import re


def load_bench(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    tail = doc.get("tail", "")
    start = tail.find('{"metric"')
    if start < 0:
        raise SystemExit(f"{path}: no bench JSON found (keys: {sorted(doc)})")
    # balanced parse handles both the legacy one-line format (queries
    # inline) and the round-4+ contract (short headline line, queries on
    # their own later line)
    out, _ = json.JSONDecoder().raw_decode(tail[start:])
    if "queries" not in out:
        q = tail.find('{"queries"')
        out["queries"] = (
            json.JSONDecoder().raw_decode(tail[q:])[0]["queries"] if q >= 0 else {}
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--min-sec", type=float, default=0.05,
                    help="ignore ratio churn on queries faster than this")
    args = ap.parse_args()

    old, new = load_bench(args.old), load_bench(args.new)
    qo, qn = old["queries"], new["queries"]

    print(f"total: {old['value']:.1f}s ({len(qo)} queries) -> "
          f"{new['value']:.1f}s ({len(qn)} queries)\n")
    print("| query | old (s) | new (s) | ratio |")
    print("|---|---|---|---|")
    rows = []
    for k in sorted(set(qo) & set(qn)):
        if max(qo[k], qn[k]) < args.min_sec:
            continue
        ratio = qn[k] / qo[k] if qo[k] else float("inf")
        if ratio > args.threshold or ratio < 1 / args.threshold:
            rows.append((ratio, k))
    for ratio, k in sorted(rows, reverse=True):
        print(f"| {k} | {qo[k]:.2f} | {qn[k]:.2f} | {ratio:.2f}x |")
    if not rows:
        print("| (none beyond threshold) | | | |")

    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print("\nnew queries: " + ", ".join(f"{k} ({qn[k]:.2f}s)" for k in added))
    if removed:
        print("removed queries: " + ", ".join(removed))


if __name__ == "__main__":
    main()

"""Per-query bench trend: compare two bench outputs and flag regressions.

Usage::

    python tools/bench_trend.py BENCH_r01.json BENCH_r02.json [--threshold 1.3]
    python tools/bench_trend.py --history            # r1->rN table from
                                                     # tools/bench_history/

Accepts either the raw one-line JSON that ``bench.py`` prints or the
driver's wrapper record (``{"tail": "...{bench json}..."}``). Prints a
markdown table of every query whose time moved more than the threshold in
either direction, plus new/removed queries and totals.

``--history`` reads the per-round snapshots under ``tools/bench_history/``
(``rNN.json``, each a full ``BENCH_DETAIL.json`` mirror — complete and
untruncated, unlike the driver's 2000-char tails) and emits the per-round
totals plus the movers table for the two most recent rounds.

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


def diff_table(old: dict, new: dict, threshold: float, min_sec: float) -> None:
    qo, qn = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s ({len(qo)} queries) -> "
          f"{new['value']:.1f}s ({len(qn)} queries)\n")
    print("| query | old (s) | new (s) | ratio |")
    print("|---|---|---|---|")
    rows = []
    for k in sorted(set(qo) & set(qn)):
        if max(qo[k], qn[k]) < min_sec:
            continue
        ratio = qn[k] / qo[k] if qo[k] else float("inf")
        if ratio > threshold or ratio < 1 / threshold:
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


def history() -> None:
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "bench_history", "r*.json")))
    if not paths:
        raise SystemExit("no snapshots under tools/bench_history/")
    snaps = [(os.path.basename(p)[:-5], load_bench(p)) for p in paths]
    print("| round | total (s) | n queries | sec/query |")
    print("|---|---|---|---|")
    for name, doc in snaps:
        n = len(doc["queries"])
        print(f"| {name} | {doc['value']:.1f} | {n} | {doc['value'] / n:.2f} |")
    if len(snaps) >= 2:
        (oname, old), (nname, new) = snaps[-2], snaps[-1]
        common = set(old["queries"]) & set(new["queries"])
        osum = sum(old["queries"][k] for k in common)
        nsum = sum(new["queries"][k] for k in common)
        print(f"\nlike-for-like ({len(common)} common queries): "
              f"{oname} {osum:.1f}s -> {nname} {nsum:.1f}s = {nsum / osum:.2f}x\n")
        print(f"movers {oname} -> {nname}:\n")
        diff_table(old, new, threshold=1.3, min_sec=0.05)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?")
    ap.add_argument("new", nargs="?")
    ap.add_argument("--history", action="store_true",
                    help="emit the multi-round table from tools/bench_history/")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--min-sec", type=float, default=0.05,
                    help="ignore ratio churn on queries faster than this")
    args = ap.parse_args()

    if args.history:
        history()
        return
    if not (args.old and args.new):
        raise SystemExit("need OLD and NEW bench files (or --history)")
    diff_table(load_bench(args.old), load_bench(args.new),
               args.threshold, args.min_sec)


if __name__ == "__main__":
    main()

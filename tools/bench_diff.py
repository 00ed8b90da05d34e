#!/usr/bin/env python3
"""Round-over-round per-query bench regression diff.

Usage:
    python3 tools/bench_diff.py BASELINE.json CURRENT.json [--factor 2.0]

Each input is either a baseline fixture ({"queries": {name: sec}}) or a
raw Bench stdout capture / driver BENCH_r*.json — any file whose text
contains "q_name":sec pairs is accepted (the driver's tail-truncated
captures parse fine).

Exits 1 if any query regressed by more than --factor (default 2x) AND
by more than 1.0s absolute (sub-second queries jitter multiplicatively;
an 0.1s -> 0.3s move is noise, a 3s -> 7s move is not).
"""
import argparse
import json
import re
import sys


def load_queries(path):
    text = open(path).read()
    try:
        d = json.loads(text)
        if isinstance(d, dict) and isinstance(d.get("queries"), dict):
            return {k: float(v) for k, v in d["queries"].items()}
        if isinstance(d, dict) and isinstance(d.get("tail"), str):
            # driver BENCH_r*.json: the captured stdout lives (JSON-escaped)
            # in the "tail" field; json.loads already unescaped it
            text = d["tail"]
    except ValueError:
        pass
    # keep the FIRST occurrence per query: Bench prints the per_query
    # (min-across-runs) line before per_query_cold, and letting the cold
    # values overwrite the best ones would diff plan+codegen-inclusive
    # numbers against best-time baselines
    out = {}
    for k, v in re.findall(r'"(q_[a-z0-9_]+)":(-?[0-9.]+)', text):
        out.setdefault(k, float(v))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("baseline", help="baseline bench file")
    ap.add_argument("current", help="current bench file")
    ap.add_argument("--factor", type=float, default=2.0,
                    help="regression threshold multiplier (default 2.0)")
    ns = ap.parse_args()
    factor = ns.factor
    base, cur = load_queries(ns.baseline), load_queries(ns.current)
    common = sorted(set(base) & set(cur))
    if not common:
        print("no common queries between the two files")
        sys.exit(2)
    regressed, improved = [], []
    for q in common:
        b, c = base[q], cur[q]
        if b <= 0:
            continue
        if c > b * factor and c - b > 1.0:
            regressed.append((q, b, c))
        elif b > c * factor and b - c > 1.0:
            improved.append((q, b, c))
    for q, b, c in sorted(improved, key=lambda t: t[1] - t[2], reverse=True):
        print(f"IMPROVED  {q}: {b:.2f}s -> {c:.2f}s ({b / c:.1f}x)")
    for q, b, c in sorted(regressed, key=lambda t: t[2] - t[1], reverse=True):
        print(f"REGRESSED {q}: {b:.2f}s -> {c:.2f}s ({c / b:.1f}x)")
    only_base = sorted(set(base) - set(cur))
    only_cur = sorted(set(cur) - set(base))
    if only_cur:
        print(f"new queries ({len(only_cur)}): {', '.join(only_cur[:10])}{'...' if len(only_cur) > 10 else ''}")
    if only_base:
        print(f"dropped/missing ({len(only_base)}): {', '.join(only_base[:10])}{'...' if len(only_base) > 10 else ''}")
    tot_b = sum(base[q] for q in common)
    tot_c = sum(cur[q] for q in common)
    print(f"total over {len(common)} common queries: {tot_b:.1f}s -> {tot_c:.1f}s")
    if regressed:
        print(f"{len(regressed)} regression(s) beyond {factor}x")
        sys.exit(1)
    print("no regressions")


if __name__ == "__main__":
    main()

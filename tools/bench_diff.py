#!/usr/bin/env python3
"""Round-over-round per-query bench regression diff.

Usage:
    python3 tools/bench_diff.py BASELINE.json CURRENT.json [--factor 2.0]

Each input is either a baseline fixture ({"queries": {name: sec}}) or a
raw Bench stdout capture / driver BENCH_r*.json — any file whose text
contains "q_name":sec pairs is accepted (the driver's tail-truncated
captures parse fine).

When BOTH captures carry a {"metric":"control",...} line (the frozen
r16-HEAD jar re-benched inside every full capture since round 17), the
current capture's times are divided by the median control drift before
any gate applies — so box-day "ambience" is measured out of the
comparison instead of argued about. --no-control disables this.

Exits 1 if any query regressed by more than --factor (default 2x) AND
by more than 1.0s absolute, OR by more than --ratio (default 1.5x) on a
query whose baseline is at least --ratio-floor (default 0.2s). The
absolute gate alone let a 0.46s -> 0.96s (2.1x) move ride under a "zero
regressions" close in round 14; the ratio gate catches those while the
floor keeps sub-0.2s multiplicative jitter out.
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
    # Preferred path: Bench prints one intact JSON line per metric — when
    # the per_query (min-across-runs) line survived the capture, use it
    # verbatim instead of regex-scraping, so a front-truncated tail can't
    # hand us per_query_cold values or failed_runs counts by accident.
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[info]"):  # pre-round-4 captures carry sbt prefixes
            line = line[len("[info]"):].strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("metric") == "per_query" and isinstance(d.get("queries"), dict):
            return {k: float(v) for k, v in d["queries"].items()}
    # Fallback for truncated fragments: keep the FIRST occurrence per query
    # (per_query precedes per_query_cold even when its front is cut), and
    # skip failed_runs VALUES — they are failure COUNTS, not seconds, and
    # must never be diffed against a time baseline. The skip is scoped to
    # the text AFTER the failed_runs object's start marker, so a capture
    # that collapsed newlines (genuine timings sharing a physical line
    # with the failed_runs object) keeps the timings that precede it.
    out = {}
    for line in text.splitlines():
        # control rows are frozen-jar times, never the current build's —
        # scrub them from the fragment scrape like failed_runs
        cmarker = line.find('{"metric":"control"')
        if cmarker < 0:
            cmarker = line.find('"jar":')
        if cmarker >= 0:
            line = line[:cmarker]
        marker = line.find('{"metric":"failed_runs"')
        if marker < 0:
            # front-truncated fragment: the object's {"metric": prefix was
            # cut but the key survived — skip from the key itself
            marker = line.find('"failed_runs"')
        if marker >= 0:
            line = line[:marker]
        for k, v in re.findall(r'"(q_[a-z0-9_]+)":(-?[0-9.]+)', line):
            out.setdefault(k, float(v))
    return out


def load_control(path):
    """The {"metric":"control",...} line's queries map, or {}."""
    text = open(path).read()
    try:
        d = json.loads(text)
        if isinstance(d, dict) and isinstance(d.get("control"), dict):
            return {k: float(v) for k, v in d["control"].items()}
        if isinstance(d, dict) and isinstance(d.get("tail"), str):
            text = d["tail"]
    except ValueError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("metric") == "control" and isinstance(d.get("queries"), dict):
            return {k: float(v) for k, v in d["queries"].items()}
    return {}


def control_drift(base_path, cur_path):
    """Median per-query drift ratio of the frozen control jar between the
    two captures (current/baseline), or None when either side lacks
    control rows. Sub-0.05s control times are excluded (pure jitter).

    r16->r17 bridge: the r16 baseline predates the control protocol, but
    the control jar IS the r16 HEAD — so when the baseline lacks a
    control map, its ordinary per_query values AT the control queries
    are the same frozen code measured on the baseline day, and serve as
    the baseline control."""
    cb, cc = load_control(base_path), load_control(cur_path)
    if cc and not cb:
        base_q = load_queries(base_path)
        cb = {q: base_q[q] for q in cc if q in base_q}
        if cb:
            print("note: baseline has no control rows; using its per_query "
                  "values at the control queries (the control jar is that "
                  "round's HEAD)")
    ratios = sorted(cc[q] / cb[q] for q in set(cb) & set(cc)
                    if cb[q] > 0.05 and cc[q] > 0)
    if not ratios:
        return None
    return ratios[len(ratios) // 2]


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("baseline", help="baseline bench file")
    ap.add_argument("current", help="current bench file")
    ap.add_argument("--factor", type=float, default=2.0,
                    help="regression threshold multiplier (default 2.0)")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="ratio-only regression threshold for queries at or "
                         "above --ratio-floor (default 1.5)")
    ap.add_argument("--ratio-floor", type=float, default=0.2,
                    help="baseline seconds below which the ratio gate is "
                         "skipped (default 0.2)")
    ap.add_argument("--no-control", action="store_true",
                    help="skip the frozen-control drift adjustment")
    ns = ap.parse_args()
    factor = ns.factor
    base, cur = load_queries(ns.baseline), load_queries(ns.current)
    drift = None if ns.no_control else control_drift(ns.baseline, ns.current)
    if drift is not None:
        print(f"control drift (median over frozen-jar queries): {drift:.3f}x"
              f" — current times divided by it before gating")
        cur = {k: (v / drift if v > 0 else v) for k, v in cur.items()}
    common = sorted(set(base) & set(cur))
    if not common:
        print("no common queries between the two files")
        sys.exit(2)
    regressed, improved, failed = [], [], []
    for q in common:
        b, c = base[q], cur[q]
        if b <= 0:
            continue
        if c < 0:
            # Bench records -1 for a query whose every run threw. A newly
            # broken query is the worst regression there is — it must never
            # satisfy the "improved" branch (b > c*factor holds for any c<0).
            failed.append((q, b))
        elif (c > b * factor and c - b > 1.0) or \
                (b >= ns.ratio_floor and c > b * ns.ratio):
            regressed.append((q, b, c))
        elif b > c * factor and b - c > 1.0:
            improved.append((q, b, c))
    for q, b in failed:
        print(f"FAILED    {q}: {b:.2f}s -> every current run failed")
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
    timed = [q for q in common if base[q] > 0 and cur[q] >= 0]
    tot_b = sum(base[q] for q in timed)
    tot_c = sum(cur[q] for q in timed)
    print(f"total over {len(timed)} common timed queries: {tot_b:.1f}s -> {tot_c:.1f}s")
    if regressed or failed:
        print(f"{len(regressed)} regression(s) beyond {factor}x, {len(failed)} failed")
        sys.exit(1)
    print("no regressions")


if __name__ == "__main__":
    main()

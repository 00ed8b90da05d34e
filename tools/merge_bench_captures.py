#!/usr/bin/env python3
"""Merge N raw Bench stdout captures into a bench_baseline_rNN.json.

Usage:
    python3 tools/merge_bench_captures.py ROUND COMMIT OUT.json RAW1 [RAW2 ...]

Each RAW file is a full Bench stdout (the `{"metric":...}` lines). The
output carries the per-query MIN across every capture (each capture is
itself a min-of-SPARK_GRAFT_BENCH_RUNS), the summed total, and the cold
totals per capture — the close-capture format bench_diff.py and
BASELINE.md cite.
"""
import json
import sys


def parse_capture(path):
    best, cold_total, control = {}, None, {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "per_query":
            for k, v in d["queries"].items():
                if v >= 0 and (k not in best or v < best[k]):
                    best[k] = v
        elif d.get("metric") == "per_query_cold":
            cold_total = d.get("cold_total")
        elif d.get("metric") == "control":
            for k, v in d["queries"].items():
                if v >= 0 and (k not in control or v < control[k]):
                    control[k] = v
    return best, cold_total, control


def main():
    if len(sys.argv) < 5:
        sys.exit(__doc__)
    rnd, commit, out = sys.argv[1], sys.argv[2], sys.argv[3]
    raws = sys.argv[4:]
    merged, colds, ctl = {}, [], {}
    for p in raws:
        best, cold, control = parse_capture(p)
        if not best:
            sys.exit(f"no per_query line found in {p}")
        for k, v in best.items():
            if k not in merged or v < merged[k]:
                merged[k] = v
        for k, v in control.items():
            if k not in ctl or v < ctl[k]:
                ctl[k] = v
        colds.append(cold)
    total = round(sum(merged.values()), 3)
    doc = {
        "round": rnd,
        "commit": commit,
        "sf": 0.1,
        "cpus": 32,
        "runs": f"min across {len(raws)} full min-of-SPARK_GRAFT_BENCH_RUNS "
                f"JVM invocations (default 3/query each)",
        "n_queries": len(merged),
        "total_sec": total,
        **{f"cold_total_run{i + 1}": c for i, c in enumerate(colds) if c},
        "note": "caches cleared between runs; fixture pre-pass in warmup "
                "(one-time memoized store-table writes excluded from every "
                "timed sample as of r11)",
        # reproducibility (r16 judge item 8): the exact constituent raw
        # captures this merge consumed, so the baseline can be re-derived
        "merged_from": raws,
        # frozen-control rows (r17): min across captures of the pinned
        # r16-HEAD-jar queries — bench_diff.py divides the next round's
        # drift by these before gating
        **({"control": {k: ctl[k] for k in sorted(ctl)}} if ctl else {}),
        "queries": {k: merged[k] for k in sorted(merged)},
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    slow = sorted(merged.items(), key=lambda kv: -kv[1])[:5]
    print(f"wrote {out}: {len(merged)} queries, total {total}s")
    print("slowest:", ", ".join(f"{k}={v}" for k, v in slow))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare two Verify dump directories for value-identical results.

Usage: python3 tools/compare_dumps.py DIR_A DIR_B

For each query subdir present in both, loads the parquet through DuckDB,
concatenates every column as VARCHAR per row, order-insensitively
aggregates the row reprs, and md5-hashes them. Prints differing queries;
exits nonzero if any differ. Used for the round-close CPUS=4 vs 16
partition-count-determinism ritual (SURVEY §5.4) — the only expected
difference is q_agg_kll, whose KLL compaction is merge-order-sensitive
by construction.
"""
import os
import sys

import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    qs = sorted(set(os.listdir(a)) & set(os.listdir(b)))
    qs = [q for q in qs if os.path.isdir(os.path.join(a, q))]
    con = duckdb.connect()
    diff = []
    for q in qs:
        def h(d):
            cols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{d}/{q}/*.parquet')").fetchall()]
            expr = " || '|' || ".join(
                f"COALESCE(CAST(\"{c}\" AS VARCHAR),'NULL')" for c in cols)
            return con.execute(
                f"SELECT md5(string_agg(r, '#' ORDER BY r)) FROM (SELECT {expr} AS r "
                f"FROM read_parquet('{d}/{q}/*.parquet'))").fetchone()[0]
        try:
            if h(a) != h(b):
                diff.append((q, "value hash differs"))
        except Exception as e:
            diff.append((q, f"error: {e}"))
    for q, why in diff:
        print(f"DIFF {q}: {why}")
    print(f"{len(diff)} differing of {len(qs)} compared")
    sys.exit(1 if diff else 0)


if __name__ == "__main__":
    main()

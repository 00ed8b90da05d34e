#!/usr/bin/env python3
"""Local replica of the driver's t2 compare: run Verify's parquet dumps
against the DuckDB oracle SQL and diff (columns sorted by name, exact
values). Usage: check_oracle.py [sfDir] [verifyOutDir] [only...]"""
import duckdb, json, sys, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    if not os.path.isdir(f"{out}/{name}"):
        print(f"FAIL {name}: no spark dump"); fails.append(name); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark dump unreadable: {e}"); fails.append(name); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails.append(name); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails.append(name); continue
    bad = None
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            neq = (a != b) & ~(a.isna() & b.isna())
        except Exception:
            neq = a.astype(str) != b.astype(str)
        if neq.any():
            i = neq.idxmax()
            bad = (c, i, a[i], b[i], int(neq.sum()))
            break
    if bad:
        c, i, av, bv, n = bad
        print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} ({n} diffs)")
        fails.append(name)
    else:
        print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(fails)} failed of {len(only) if only else len(oracle)}")
sys.exit(1 if fails else 0)

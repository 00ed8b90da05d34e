#!/usr/bin/env python3
"""Oracle result-type lint: DESCRIBE every oracle SQL in DuckDB and fail
if any output column's type is outside the driver's hash-safe set.

Root cause this guards (round-9 verdict): the driver's hash gate
canonicalizes DECIMAL/HUGEINT cells differently from Spark's parquet
dump, so value-exact results still fail hash_match. Every oracle's FINAL
projection must therefore emit only hash-safe types — cast aggregates:
`CAST(sum(decimal_expr) AS DOUBLE)`, `CAST(sum(int_expr) AS BIGINT)`.

Usage: oracle_type_lint.py [verifyOutDir]   (needs oracle_sql.json there)
Exit 1 on any violation, listing query, column, and offending type.
"""
import duckdb, json, sys, re

sf = "/root/testdata/sf0.01"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"

# Hash-safe: what the driver's canonicalizer treats identically between a
# DuckDB result and a Spark parquet dump.
SAFE = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|DATE|BOOLEAN"
    r"|TIMESTAMP(_NS| WITH TIME ZONE)?"
    r"|VARCHAR\[\]|BIGINT\[\]|INTEGER\[\]|DOUBLE\[\]"
    r"|STRUCT\(.*\)|MAP\(.*\))$")
UNSAFE = re.compile(r"DECIMAL|HUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
bad = []
for name in sorted(oracle):
    try:
        desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        bad.append((name, "<describe failed>", str(e).splitlines()[0]))
        continue
    for col, typ, *_ in desc:
        # UNSAFE match anywhere in the type (catches DECIMAL inside LIST/
        # STRUCT too); SAFE is the allowlist for the top-level scalar types.
        if UNSAFE.search(typ) or not SAFE.match(typ):
            bad.append((name, col, typ))

for name, col, typ in bad:
    print(f"VIOLATION {name}: column `{col}` has type {typ}")
print(f"\n{len(bad)} violations across "
      f"{len(set(n for n, _, _ in bad))} queries (of {len(oracle)} oracles)")
sys.exit(1 if bad else 0)

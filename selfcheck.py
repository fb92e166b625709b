#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for each query
result parquet under <outDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the same testdata tables, sorts columns
by name and rows by value, and diffs. Not shipped to the driver — dev
harness only.
"""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    res = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"  {name}: rows-only ({len(res)} rows)")
        if len(res) == 0:
            print(f"FAIL {name}: zero rows"); fail += 1
        continue
    exp = con.execute(oracle[name]).fetchdf()
    res = res.reindex(sorted(res.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(res.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(res.columns)} vs {list(exp.columns)}")
        fail += 1
        continue
    rs = res.sort_values(by=list(res.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    if len(rs) != len(es):
        print(f"FAIL {name}: rows {len(rs)} vs {len(es)}")
        fail += 1
        continue
    # exact compare, mirroring a value hash
    eq = rs.equals(es)
    if not eq:
        diff = (rs != es) & ~(rs.isna() & es.isna())
        nbad = int(diff.any(axis=1).sum())
        print(f"FAIL {name}: {nbad}/{len(rs)} mismatched rows")
        bad = diff.any(axis=1)
        print("  got:", rs[bad].head(3).to_dict("records"))
        print("  exp:", es[bad].head(3).to_dict("records"))
        fail += 1
    else:
        print(f"  ok  {name} ({len(rs)} rows)")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)

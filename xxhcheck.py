#!/usr/bin/env python3
"""Cross-validates the generated XxHash64Sql SQL against Spark's own
xxhash64 over strings covering every XXH64 code path — the correctness
gate's testdata never reaches the >=32-byte stripe loop (longest
shingle ~26 bytes), where a sign-overflow bug hid in round 2.

Usage:
    sbt "runMain graft.queries.XxHashDump /tmp/xxhcheck"
    python3 xxhcheck.py /tmp/xxhcheck     # exit 0 = all values match

Dev harness only (like selfcheck.py) — not part of the shipped library.
"""
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xxhcheck"
samples = {}
for line in open(f"{d}/samples.tsv", encoding="utf-8"):
    if "\t" not in line:
        continue
    i, s = line.rstrip("\n").split("\t", 1)
    samples[int(i)] = s
truth = {}
for line in open(f"{d}/truth.tsv"):
    if "\t" not in line:
        continue
    i, h = line.strip().split("\t")
    truth[int(i)] = int(h)

con = duckdb.connect()
con.execute("CREATE TABLE t (id INTEGER, s VARCHAR)")
for i, s in samples.items():
    con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
ctes = open(f"{d}/ctes.sql").read()
sql = ("WITH " + ctes +
       " SELECT id, CAST(CASE WHEN xxh >= 9223372036854775808"
       " THEN xxh - 18446744073709551616 ELSE xxh END AS BIGINT) FROM hb ORDER BY id")
bad = 0
for i, got in con.execute(sql).fetchall():
    if got != truth[i]:
        bad += 1
        print(f"MISMATCH id={i} len={len(samples[i].encode('utf-8'))}B got={got} want={truth[i]}")
print(f"checked {len(truth)} strings (0-{max(len(s.encode('utf-8')) for s in samples.values())} bytes), mismatches: {bad}")
sys.exit(1 if bad else 0)

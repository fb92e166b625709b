#!/usr/bin/env python3
"""Cross-validates the shared PII patterns (TextFunctions.EmailPattern/
PhonePattern) between Spark's Java regex and the oracle engine's RE2
on PII-POSITIVE strings — the correctness gate's corpus is PII-free,
so q49 alone only proves clean-text passthrough.

Usage:
    sbt "runMain graft.queries.PiiDump /tmp/piicheck"
    python3 piicheck.py /tmp/piicheck     # exit 0 = engines agree

Dev harness only (like xxhcheck.py) — not part of the shipped library.
"""
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/piicheck"
samples = {}
for line in open(f"{d}/samples.tsv", encoding="utf-8"):
    if "\t" not in line:
        continue
    i, s = line.rstrip("\n").split("\t", 1)
    samples[int(i)] = s
truth = {}
for line in open(f"{d}/truth.tsv", encoding="utf-8"):
    if "\t" not in line:
        continue
    i, ne, np, red = line.rstrip("\n").split("\t", 3)
    truth[int(i)] = (int(ne), int(np), red)
email, phone = open(f"{d}/patterns.txt").read().splitlines()[:2]

con = duckdb.connect()
bad = 0
for i, s in samples.items():
    ne, np, red = con.execute(
        "SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
        " regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g')",
        [s, email, s, phone, s, email, phone]).fetchone()
    if (ne, np, red) != truth[i]:
        bad += 1
        print(f"MISMATCH id={i} input={s!r}\n  oracle=({ne},{np},{red!r})\n  spark ={truth[i]}")
print(f"checked {len(samples)} strings, mismatches: {bad}")
sys.exit(1 if bad else 0)

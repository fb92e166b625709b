#!/usr/bin/env python3
"""Cross-validates NfcNormalize (java.text.Normalizer) against the
oracle engine's utf8proc nfc_normalize on strings that CHANGE under
NFC — the correctness gate's corpus is ASCII, so q56 alone only proves
passthrough.

Usage:
    sbt "runMain graft.queries.NfcDump /tmp/nfccheck"
    python3 nfccheck.py /tmp/nfccheck     # exit 0 = engines agree

Dev harness only (like xxhcheck.py / piicheck.py).
"""
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nfccheck"
samples, truth = {}, {}
for line in open(f"{d}/samples.tsv", encoding="utf-8"):
    if "\t" in line:
        i, s = line.rstrip("\n").split("\t", 1)
        samples[int(i)] = s
for line in open(f"{d}/truth.tsv", encoding="utf-8"):
    if "\t" in line:
        i, s = line.rstrip("\n").split("\t", 1)
        truth[int(i)] = s

con = duckdb.connect()
bad = 0
for i, s in samples.items():
    got = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
    if got != truth[i]:
        bad += 1
        print(f"MISMATCH id={i} input={s!r} oracle={got!r} spark={truth[i]!r}")
print(f"checked {len(samples)} strings, mismatches: {bad}")
sys.exit(1 if bad else 0)

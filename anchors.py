#!/usr/bin/env python3
"""Pinned per-query bench anchors + comparator.

Round 9's adjudication problem: four same-code archive runs spread
294-337 s with a DIFFERENT set of flagged queries each time (roaming
host-noise), and the standalone anchors that settled it lived in
PERF.md prose. This makes the anchor machine-readable and the noise
adjudication a diff:

  generate:  python3 anchors.py generate [--runs 3] [--sf DIR] [--out ANCHORS.json]
      Runs graft.Bench N times (one JVM per run), takes the per-query
      MEDIAN of the N runs, writes ANCHORS.json with provenance
      (git sha, sf dir, run totals). Median-of-3 full runs is the
      committed baseline; single-run archives are what it replaces.

  compare:   python3 anchors.py compare [--anchors ANCHORS.json] BENCH.json
      Compares a bench JSON line (the driver's BENCH_r{N}.json or a
      fresh anchor file) against the committed anchors. Flags a query
      only when BOTH ratio >= --ratio (default 1.5) AND absolute
      delta >= --abs-sec (default 1.0 s) — sub-second jitter never
      flags. Exit 1 when anything is flagged, so CI can gate on it.

Flagged queries then get the bench-noise protocol (3x A/B isolates,
same box, both code versions) BEFORE being believed — this file
settles WHAT changed; the protocol settles WHY.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, check=False)
    for line in out.stdout.splitlines():
        line = line.removeprefix("[info] ").strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    sys.exit(f"no bench JSON line in sbt output:\n{out.stdout[-2000:]}")


def git_sha() -> str:
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
    except OSError:
        return "unknown"


def cmd_generate(args) -> int:
    runs = []
    for i in range(args.runs):
        r = run_bench(args.sf)
        print(f"run {i + 1}/{args.runs}: total {r['value']:.1f}s "
              f"({len(r['queries'])} queries)", flush=True)
        runs.append(r)
    names = sorted(set().union(*(r["queries"].keys() for r in runs)))
    medians = {n: round(statistics.median(
        [r["queries"][n] for r in runs if n in r["queries"]]), 3)
        for n in names}
    doc = {
        "git": git_sha(),
        "sf": args.sf,
        "runs": args.runs,
        "run_totals_sec": [round(r["value"], 1) for r in runs],
        "queries": medians,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(medians)} anchors to {args.out} "
          f"(totals {doc['run_totals_sec']})")
    return 0


def cmd_compare(args) -> int:
    with open(args.anchors) as f:
        anchors = json.load(f)
    with open(args.bench) as f:
        bench = json.load(f)
    new = bench.get("queries", bench)  # BENCH_r*.json or another anchor file
    base = anchors["queries"]
    flagged, improved, added, removed = [], [], [], []
    for name in sorted(set(base) | set(new)):
        if name not in base:
            added.append(name)
            continue
        if name not in new:
            removed.append(name)
            continue
        b, n = base[name], new[name]
        ratio = n / b if b > 0 else float("inf")
        if ratio >= args.ratio and (n - b) >= args.abs_sec:
            flagged.append((name, b, n, ratio))
        elif 1 / ratio >= args.ratio and (b - n) >= args.abs_sec:
            improved.append((name, b, n, ratio))
    for name, b, n, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"SLOWER  {name}: {b:.2f}s -> {n:.2f}s ({r:.2f}x)")
    for name, b, n, r in sorted(improved, key=lambda x: x[3]):
        print(f"faster  {name}: {b:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if added:
        print(f"new queries (no anchor): {', '.join(added)}")
    if removed:
        print(f"anchored but absent: {', '.join(removed)}")
    tot_b = sum(v for k, v in base.items() if k in new)
    tot_n = sum(v for k, v in new.items() if k in base)
    print(f"common-query total: {tot_b:.1f}s anchor -> {tot_n:.1f}s "
          f"({tot_n / tot_b:.2f}x) over {len(set(base) & set(new))} queries; "
          f"{len(flagged)} flagged (>= {args.ratio}x and >= {args.abs_sec}s)")
    if flagged:
        print("flagged queries need the bench-noise protocol "
              "(3x A/B isolates) before belief — see PERF.md")
    return 1 if flagged else 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--runs", type=int, default=3)
    g.add_argument("--sf", default="/root/testdata/sf0.1")
    g.add_argument("--out", default="ANCHORS.json")
    c = sub.add_parser("compare")
    c.add_argument("bench")
    c.add_argument("--anchors", default="ANCHORS.json")
    c.add_argument("--ratio", type=float, default=1.5)
    c.add_argument("--abs-sec", type=float, default=1.0)
    args = p.parse_args()
    return cmd_generate(args) if args.cmd == "generate" else cmd_compare(args)


if __name__ == "__main__":
    sys.exit(main())

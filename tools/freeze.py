#!/usr/bin/env python3
"""Compose BASELINE_RUNS.json from an n-run graft.Bench series.

Each input is a file containing (at least) the one-line Bench JSON
({"metric": ..., "value": total_sec, "queries": {key: sec}, ...});
stray sbt/log lines around it are tolerated — the first line that
parses as JSON with a "queries" object wins.

Usage:
  python3 tools/freeze.py --protocol "..." run1.json run2.json ... \
      [--out BASELINE_RUNS.json]

Prints the per-run totals and the quietest run, writes per-key
mean/min/max. The freeze convention (BASELINE.md): keep the n-run
series honest — record every run, prefer min when triaging a single
suspect key.
"""
import argparse
import json
import sys


def load_run(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in d:
                return d
    sys.exit(f"no Bench JSON line with 'queries' found in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--protocol", required=True)
    ap.add_argument("--out", default="BASELINE_RUNS.json")
    args = ap.parse_args()

    runs = [load_run(p) for p in args.runs]
    keysets = [set(r["queries"]) for r in runs]
    if len(set(map(frozenset, keysets))) != 1:
        sys.exit(f"runs disagree on key sets: {[len(k) for k in keysets]}")

    totals = [round(float(r["value"]), 3) for r in runs]
    per_key = {}
    for k in sorted(keysets[0]):
        vals = [float(r["queries"][k]) for r in runs]
        per_key[k] = {
            "mean": round(sum(vals) / len(vals), 3),
            "min": round(min(vals), 3),
            "max": round(max(vals), 3),
        }
    out = {"protocol": args.protocol, "totals_sec": totals,
           "per_key": per_key}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"totals: {totals}  (quietest: {min(totals)})  "
          f"keys: {len(per_key)}  -> {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Uniform-inflation bench triage: separate plan regressions from box noise.

A bench run on a busy box inflates EVERY key by a roughly uniform
factor (ambient I/O / CPU contention); a plan regression inflates ONE
key. So: normalize each key's ratio-vs-reference by the run's median
ratio, and flag only keys whose normalized ratio exceeds the
threshold. The reference per-key number is the per-key MIN across the
frozen baseline runs (min is the right reference: any single quiet
observation bounds the key's true cost from above).

Usage:
  python3 tools/triage.py BENCH_rN.json [--runs BASELINE_RUNS.json]
                          [--threshold 1.5]

Accepts either a driver bench file ({"queries": {key: sec}}) or a
BASELINE_RUNS-style file ({"per_key": {key: [sec, ...]}}) as the
subject; the reference defaults to BASELINE_RUNS.json next to this
script's repo root.
"""
import argparse
import json
import os
import statistics
import sys


def per_key(path):
    d = json.load(open(path))
    if "parsed" in d and "queries" not in d:  # driver BENCH_r{N} wrapper
        qf = d["parsed"].get("queries_file")
        if qf:
            cand = os.path.join(os.path.dirname(os.path.abspath(path)), qf)
            if os.path.exists(cand):
                d = json.load(open(cand))
    if "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    if "per_key" in d:
        def one(v):
            if isinstance(v, list):
                return min(v)
            if isinstance(v, dict):
                return float(v.get("min", v.get("mean")))
            return float(v)
        return {k: one(v) for k, v in d["per_key"].items()}
    raise SystemExit(f"{path}: neither 'queries' nor 'per_key' present")


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("subject")
    ap.add_argument("--runs", default=os.path.join(root, "BASELINE_RUNS.json"))
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag keys above median_ratio * threshold")
    args = ap.parse_args()

    subj = per_key(args.subject)
    ref = per_key(args.runs)
    common = sorted(set(subj) & set(ref))
    if not common:
        raise SystemExit("no common keys between subject and reference")
    new = sorted(set(subj) - set(ref))

    ratios = {k: subj[k] / ref[k] for k in common if ref[k] > 0}
    med = statistics.median(ratios.values())
    print(f"keys compared: {len(common)}  (new, no reference: {len(new)})")
    print(f"median ratio vs frozen min: {med:.3f}  "
          f"(~{med:.2f}x uniform ambient inflation)")
    print(f"flag threshold: normalized ratio > {args.threshold}")
    flagged = [(k, r, r / med) for k, r in ratios.items()
               if r / med > args.threshold]
    if not flagged:
        print("no plan-regression suspects: every key within "
              "uniform-inflation band")
    else:
        print(f"\n{len(flagged)} suspect key(s) — re-measure with "
              "BenchOne n>=3 before concluding:")
        for k, r, nr in sorted(flagged, key=lambda t: -t[2]):
            print(f"  {k}: {subj[k]:.2f}s vs frozen min {ref[k]:.2f}s "
                  f"= {r:.2f}x raw, {nr:.2f}x normalized")
    if new:
        print("\nnew keys (no frozen reference yet): " + ", ".join(new))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

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
  python3 tools/triage.py --benchone b1.log --suspect k1,k2 [...]

Accepts either a driver bench file ({"queries": {key: sec}}) or a
BASELINE_RUNS-style file ({"per_key": {key: [sec, ...]}}) as the
subject; the reference defaults to BASELINE_RUNS.json next to this
script's repo root.

--benchone mode (round 13 — the solo-vs-in-series protocol gap): the
round-12 judge showed solo BenchOne re-runs cannot adjudicate
sub-0.3 s suspects against frozen IN-SERIES mins — six unchanged
control keys measured 0.86x-2.2x of their frozen mins under solo
re-measurement on the same box. The fix is to re-measure the suspect
amid a warm mix (SPARK_GRAFT_MIX=20 in graft.BenchOne) and let the
mix keys' own ratios-vs-frozen measure THIS run's ambient factor.
This mode parses the BenchOne log (`B1 <key> rep<r> <sec> ...`),
takes each key's min across reps, computes ambient = median over
NON-suspect keys of (observed min / frozen min), and adjudicates each
--suspect key on its ambient-NORMALIZED ratio. The output states
which reference applied: in-series frozen min x the run's measured
ambient — never the raw frozen min, which belongs to a different
protocol.
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


def benchone_mins(path):
    """Parse `B1 <key> rep<r> <sec> ...` lines -> {key: min_sec}."""
    mins = {}
    for line in open(path):
        parts = line.split()
        if len(parts) >= 4 and parts[0] == "B1":
            try:
                sec = float(parts[3])
            except ValueError:
                continue
            k = parts[1]
            mins[k] = min(mins.get(k, sec), sec)
    if not mins:
        raise SystemExit(f"{path}: no 'B1 <key> rep<r> <sec>' lines")
    return mins


def adjudicate_benchone(args):
    subj = benchone_mins(args.benchone)
    ref = per_key(args.runs)
    suspects = [k.strip() for k in args.suspect.split(",") if k.strip()]
    controls = {k: subj[k] / ref[k] for k in subj
                if k not in suspects and k in ref and ref[k] > 0}
    if len(controls) < 5:
        raise SystemExit("need >=5 control keys with frozen references "
                         "(run BenchOne with SPARK_GRAFT_MIX=20)")
    ambient = statistics.median(controls.values())
    spread = sorted(controls.values())
    # For <10 controls the naive index 9*len//10 is the max, not a p90:
    # interpolate rank = q*(n-1) and clamp so small control counts report
    # an actual percentile estimate.
    def pct(q):
        r = q * (len(spread) - 1)
        lo, hi = int(r), min(int(r) + 1, len(spread) - 1)
        return spread[lo] + (spread[hi] - spread[lo]) * (r - lo)
    print(f"controls: {len(controls)} keys, ambient factor "
          f"{ambient:.3f} (p10 {pct(0.1):.2f}, "
          f"p90 {pct(0.9):.2f})")
    print("reference applied: frozen IN-SERIES min x this run's "
          "measured ambient (solo mins are a different protocol)")
    bad = False
    for k in suspects:
        if k not in subj:
            print(f"  {k}: NOT in BenchOne log")
            bad = True
            continue
        if k not in ref:
            print(f"  {k}: no frozen reference (new key) — observed "
                  f"min {subj[k]:.3f}s, ambient-adjusted "
                  f"{subj[k] / ambient:.3f}s")
            continue
        raw = subj[k] / ref[k]
        norm = raw / ambient
        verdict = "REGRESSION" if norm > args.threshold else "ambient"
        bad = bad or norm > args.threshold
        print(f"  {k}: {subj[k]:.3f}s vs frozen min {ref[k]:.3f}s = "
              f"{raw:.2f}x raw, {norm:.2f}x ambient-normalized -> "
              f"{verdict}")
    sys.exit(1 if bad else 0)


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("subject", nargs="?")
    ap.add_argument("--runs", default=os.path.join(root, "BASELINE_RUNS.json"))
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag keys above median_ratio * threshold")
    ap.add_argument("--benchone", help="BenchOne log for in-series "
                    "re-measure adjudication (with --suspect)")
    ap.add_argument("--suspect", default="",
                    help="comma list of suspect keys for --benchone mode")
    args = ap.parse_args()

    if args.benchone:
        adjudicate_benchone(args)
        return
    if not args.subject:
        ap.error("subject required (or use --benchone)")

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

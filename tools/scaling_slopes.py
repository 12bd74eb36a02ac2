#!/usr/bin/env python3
"""Measure per-query scaling slopes across fixture scales.

Every "survives 100x" claim in SCALE.md rests on plan audits; this tool is
the cheapest FALSIFIER of those claims: fold one bench artifact per scale
factor (BENCH_FULL.json-style, median mode) into SCALING.json with, per
query, the time at each scale and the fitted log-log slope between
consecutive scales. A query whose cost is c * SF^k shows slope -> k once
the data term dominates; a quadratic hiding behind a fast constant (the
round-12 ngram verifier was exactly this) shows slope ~= 2 between the two
largest scales with no code reading required.

Reading rules (documented in SCALE.md "Per-query scaling slopes"):

  - Times are per-query MIN over the artifact's timed runs — the same
    statistic the bench reading rule trusts for plan cost (medians carry
    contention).
  - The graded slope is the LARGEST-scale pair (sf0.01 -> sf0.1 on the
    stock fixtures): smaller scales sit on the per-query fixed floor
    (session/plan/codegen overhead, ~0.1-0.3 s), where slopes are ~0 by
    construction and mean nothing.
  - Flag threshold 1.3: linear data growth with shuffle log factors lands
    ~<= 1.15 even before the fixed floor flattens it further; a measured
    slope above 1.3 on sub-second bases means the data term is growing
    SUPER-linearly and the query needs a structural answer before any
    100x claim stands.
  - A slope is only as good as its numerator: queries whose largest-scale
    min is below --floor (default 0.35 s) are reported but never flagged —
    at that absolute cost the "slope" is fixed-floor noise, not a data
    term. (They still appear in the table; a future scale-up re-grades
    them.)

Usage:
  python3 tools/scaling_slopes.py OUT.json sf0.001=B1.json sf0.01=B2.json sf0.1=B3.json
          [--flag 1.3] [--floor 0.35]

Each scale accepts a comma-separated LIST of artifacts
(sf0.1=run1.json,run2.json): the per-query time is then the min across
runs — the cross-run min-of-mins of the bench reading rule, which is the
right anchor on a host-drifting box (any single run, including its mins,
can be uniformly inflated by hypervisor neighbors the guest stamp cannot
see).
"""
import json
import math
import sys


def main(argv):
    flag_at, floor = 1.3, 0.35
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--flag":
            flag_at = float(argv[i + 1]); i += 2
        elif a == "--floor":
            floor = float(argv[i + 1]); i += 2
        else:
            pos.append(a); i += 1
    if len(pos) < 3:
        print(__doc__)
        return 2
    out_path, scale_args = pos[0], pos[1:]
    scales = []  # (sf_label, sf_value, mins, envs)
    stat_by_scale = {}
    for arg in scale_args:
        label, paths = arg.split("=", 1)
        sf = float(label.replace("sf", ""))
        merged, envs, stats = {}, [], []
        for path in paths.split(","):
            with open(path) as f:
                doc = json.load(f)
            det = doc.get("detail") or {}
            mins = {q: d["min"] for q, d in det.items() if "min" in d}
            if mins:
                stats.append("min")
            else:
                # detail-less (pre-round-16) artifact: only medians exist.
                # Label it LOUDLY — medians carry contention, and a silently
                # substituted median on the graded leg could mask a
                # super-linear query behind a mislabeled statistic.
                mins = dict(doc.get("queries") or {})
                stats.append("median (FALLBACK: artifact has no detail map)")
                print(f"WARNING: {path} has no detail map — using MEDIANS for "
                      f"{label}; slopes on this leg carry contention noise",
                      file=sys.stderr)
            for q, v in mins.items():
                merged[q] = v if q not in merged else min(merged[q], v)
            envs.append(doc.get("env"))
        n = len(paths.split(","))
        stat = stats[0] if len(set(stats)) == 1 else "MIXED: " + "; ".join(stats)
        stat_by_scale[label] = stat if n == 1 else f"min-of-mins over {n} runs ({stat})"
        scales.append((label, sf, merged, envs if n > 1 else envs[0]))
    scales.sort(key=lambda s: s[1])
    if len({s[1] for s in scales}) != len(scales):
        print("ERROR: two inputs share a scale factor — pass exactly one "
              "artifact per scale (fold same-scale runs with bench_trend.py "
              "first)", file=sys.stderr)
        return 2
    labels = [s[0] for s in scales]
    queries = sorted(set().union(*[set(s[2]) for s in scales]))
    top_pair = (labels[-2], labels[-1])
    rows, flags = {}, []
    for q in queries:
        times = {}
        for lab, _sf, mins, _env in scales:
            times[lab] = mins.get(q)
        slopes = {}
        for (la, sa, ma, _ea), (lb, sb, mb, _eb) in zip(scales, scales[1:]):
            ta, tb = ma.get(q), mb.get(q)
            # explicit None checks (not truthiness) so a legitimate 0.0 is
            # distinguished from a missing measurement; the > 0 guards are
            # the log-domain requirement, which a 0.0 timing genuinely
            # cannot satisfy (no slope is defined for it)
            if ta is not None and tb is not None and ta > 0 and tb > 0:
                slopes[f"{la}->{lb}"] = round(
                    math.log(tb / ta) / math.log(sb / sa), 3)
        graded_key = f"{top_pair[0]}->{top_pair[1]}"
        graded = slopes.get(graded_key)
        t_top = times.get(labels[-1])
        flagged = (graded is not None and graded > flag_at
                   and t_top is not None and t_top >= floor)
        rows[q] = {"t": {k: (None if v is None else round(v, 3)) for k, v in times.items()},
                   "slopes": slopes, "graded_slope": graded,
                   "flagged": flagged}
        if flagged:
            flags.append({"query": q, "slope": graded, "t_top_sec": round(t_top, 3)})
    flags.sort(key=lambda f: -f["slope"])
    steepest = sorted(
        [(q, r["graded_slope"], r["t"].get(labels[-1])) for q, r in rows.items()
         if r["graded_slope"] is not None and (r["t"].get(labels[-1]) or 0) >= floor],
        key=lambda x: -x[1])[:10]
    result = {
        "scales": labels,
        "graded_pair": f"{top_pair[0]}->{top_pair[1]}",
        "statistic": "per-query min over timed runs (the plan-cost anchor)",
        "statistic_by_scale": stat_by_scale,
        "flag_threshold": flag_at,
        "abs_floor_sec": floor,
        "n_queries": len(queries),
        "flags": flags,
        "steepest10": [{"query": q, "slope": s, "t_top_sec": round(t, 3)}
                       for q, s, t in steepest],
        "env": {lab: env for lab, _sf, _m, env in scales},
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"{len(queries)} queries, graded pair {result['graded_pair']}, "
          f"{len(flags)} flagged (slope > {flag_at}, t >= {floor}s) -> {out_path}")
    for fl in flags:
        print(f"  FLAG {fl['query']}: slope {fl['slope']} at {fl['t_top_sec']}s")
    print("steepest 10 (above the floor):")
    for s in result["steepest10"]:
        print(f"  {s['query']}: slope {s['slope']} ({s['t_top_sec']}s at top scale)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

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

`persistent_flags` needs at least THREE runs: with two there is no "last
two latest-runs" intersection to take, and promoting every first-time flag
would overstate the re-run set — below three runs the list is empty and
`persistent_note` says why.

Same-tree adjudication (round 18; content-keyed since round 19): a flag
whose prior floor was set by a run of the SAME tree as the newest run
cannot be a plan regression (same binary, same data; the drift is host
noise by construction). Such flags are recorded under
`same_tree_drift`, excluded from `flags`/`persistent_flags`. The tree
identity is the ENGINE CONTENT, not the commit pointer: artifacts since
round 19 stamp `env.src_hash` (content digest of src/main + build
config), and two runs match when those digests are equal — a sha match
is neither necessary (a docs-only commit between runs changes the sha
while the binary is bit-identical) nor sufficient (uncommitted src/
edits keep the pre-edit sha — the dirty-tree hole). Pre-round-19
artifacts (no src_hash) keep matching each other on `env.git_sha`
alone, sound because every archived artifact came from a committed
tree; a content-stamped artifact never matches a sha-only one, and
`unknown` in the governing field never matches anything.

Flag-verify mode (--verify-with QUIET1.json[,QUIET2.json...]): before a
persistent flag is committed as "re-run this", it must REPRODUCE on a
quiet targeted re-run — a real plan regression does, host drift does not.
Each quiet artifact is a bench capture (full or subset) of the flagged
queries on an idle box; a persistent flag is KEPT only when its quiet min
still exceeds min_of_mins x (1 + --verify-margin, default 0.2)
+ --verify-allow seconds (default 0.15 — subset runs carry ~0.1-0.5 s of
per-query overhead a full sweep amortizes; raise the allowance when the
verify artifact is a small subset, or use a full-sweep artifact and 0).
Cleared and unmeasured queries are recorded under `verify` in the output;
unmeasured flags stay (absence of evidence is not clearance).

Usage:
  python3 tools/bench_trend.py OUT.json IN1.json IN2.json ... [--threshold 0.2]
          [--verify-with QUIET.json[,MORE.json]] [--verify-margin 0.2]
          [--verify-allow 0.15]

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
    verify_with, verify_margin, verify_allow = [], 0.2, 0.15
    # every value-taking flag supports BOTH '--flag V' and '--flag=V', and
    # a missing value is a usage error, not an IndexError — the
    # space-separated form once left phantom input paths behind, and a
    # half-supported '=' form reintroduces the same class
    flag_names = ("--threshold", "--verify-with", "--verify-margin",
                  "--verify-allow")

    def take_value(i):
        a = argv[i]
        if "=" in a:
            return a.split("=", 1)[1], i + 1
        # a following token that is itself a flag is a MISSING value, not a
        # value: '--verify-with --verify-margin 0.3' once silently set
        # verify_with=['--verify-margin'] and pushed '0.3' into the input
        # paths, dying later with an opaque open() traceback
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print(f"{a} needs a value\n{__doc__}", file=sys.stderr)
            raise SystemExit(2)
        return argv[i + 1], i + 2

    i = 0
    while i < len(argv):
        a = argv[i]
        name = a.split("=", 1)[0]
        if name in flag_names:
            val, i = take_value(i)
            if name == "--threshold":
                threshold = float(val)
            elif name == "--verify-with":
                verify_with = val.split(",")
            elif name == "--verify-margin":
                verify_margin = float(val)
            else:
                verify_allow = float(val)
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
        # `is not None`, not truthiness: a legitimate 0.0 timing is a
        # measurement, not a gap — truthiness silently dropped such
        # queries from the drift screen. (A 0.0 PRIOR floor can't be a
        # ratio denominator; those queries still flag via the comparison.)
        for q in queries:
            lm = latest.get(q)
            earlier = [r[q] for r in history if q in r]
            if lm is not None and earlier and min(earlier) > 0:
                ratios.append(lm / min(earlier))
        uni = statistics.median(ratios) if ratios else 1.0
        for q in queries:
            lm = latest.get(q)
            earlier = [r[q] for r in history if q in r]
            if lm is not None and earlier and lm > min(earlier) * uni * (1 + threshold):
                out.append(q)
        return uni, set(out)

    def run_sha(run):
        """Tree identity of a run — what the same-binary claim actually
        rests on.

        The binary a bench run exercised is a function of the ENGINE
        CONTENT (src/main + build config), not of the commit pointer:
        git_sha alone has a dirty-tree hole (a run on uncommitted src/
        edits carries the pre-edit sha), and conversely a docs-only
        commit between two runs changes the sha while the binary is
        bit-identical — requiring sha equality there throws away exactly
        the quiet-run floors the adjudication needs. So when a run
        carries env.src_hash (the engine-content digest, stamped since
        round 19; build.sbt folded in since round 19's close), the
        identity IS that digest — ('src', hash). Runs without it (pre-
        round-19 archives) fall back to ('sha', git_sha), sound there
        because every archived artifact came from a committed tree.
        The tags keep stamped and unstamped artifacts from ever matching
        each other, and 'unknown' in the governing field disables the
        rule for that run entirely."""
        env = run.get("env") or {}
        if not isinstance(env, dict):
            return None
        h = env.get("src_hash")
        if h == "unknown":
            return None
        if h:
            return ("src", h)
        s = env.get("git_sha")
        if not s or s == "unknown":
            return None
        return ("sha", s)

    def split_same_tree(history_runs, latest_run, flagged):
        """Two artifacts with the same tree identity (run_sha) ran the
        same binary against the same data — a drift between them is host
        noise by CONSTRUCTION, never a plan regression. A flag whose
        prior floor was set by a same-tree run is therefore adjudicated
        without a re-run. Unknown/absent stamps never match
        (pre-round-18 artifacts keep the old behavior)."""
        ls = run_sha(latest_run)
        real, same = set(), []
        for q in flagged:
            floor_run = min((r for r in history_runs if q in r["mins"]),
                            key=lambda r: r["mins"][q])
            if ls is not None and run_sha(floor_run) == ls:
                same.append(q)
            else:
                real.add(q)
        return real, sorted(same)

    if len(runs) > 1:
        uniform, flagged_now = flag_names(
            [r["mins"] for r in runs[:-1]], runs[-1]["mins"])
        flagged_now, same_tree_drift = split_same_tree(
            runs[:-1], runs[-1], flagged_now)
    else:
        uniform, flagged_now, same_tree_drift = 1.0, set(), []
    # a contention EPISODE flags a different block of queries each run; a
    # REAL regression flags the same query in every run after it landed.
    # `persistent_flags` = flagged against the newest run AND against the
    # previous run as latest — the set a judge actually needs to re-run.
    if len(runs) > 2:
        _, flagged_prev = flag_names(
            [r["mins"] for r in runs[:-2]], runs[-2]["mins"])
        flagged_prev, _ = split_same_tree(runs[:-2], runs[-2], flagged_prev)
        persistent = sorted(flagged_now & flagged_prev)
        persistent_note = "flagged in the last TWO runs"
    else:
        # with <3 runs there is no two-consecutive-flags intersection to
        # take; promoting first-time flags would overstate the re-run set
        persistent = []
        persistent_note = ("empty by construction: <3 runs folded, no "
                           "two-consecutive-flags intersection exists — "
                           "read `flags` as tentative single-comparison drift")
    verify_report = None
    if verify_with and persistent:
        quiet = {}
        for p in verify_with:
            with open(p) as f:
                vdoc = json.load(f)
            vdet = vdoc.get("detail")
            vmins = ({q: d["min"] for q, d in vdet.items()
                      if isinstance(d, dict) and "min" in d}
                     if isinstance(vdet, dict) else dict(vdoc.get("queries") or {}))
            for q, v in vmins.items():
                if v is not None:
                    quiet[q] = v if q not in quiet else min(quiet[q], v)
        kept, cleared, unmeasured = [], [], []
        for q in persistent:
            floor_q = min(r["mins"][q] for r in runs if q in r["mins"])
            qm = quiet.get(q)
            if qm is None:
                unmeasured.append(q)  # not cleared: it simply wasn't re-run
            elif qm > floor_q * (1 + verify_margin) + verify_allow:
                kept.append({"query": q, "quiet_min": round(qm, 4),
                             "floor": round(floor_q, 4)})
            else:
                cleared.append({"query": q, "quiet_min": round(qm, 4),
                                "floor": round(floor_q, 4)})
        verify_report = {
            "files": verify_with, "margin": verify_margin,
            "allow_sec": verify_allow,
            "kept": kept, "cleared": cleared, "unmeasured": unmeasured,
        }
        persistent = sorted([k["query"] for k in kept] + unmeasured)
        persistent_note = ("quiet-run verified (margin "
                           f"{verify_margin:+.0%}, allow {verify_allow}s): "
                           "reproduced or unmeasured flags only")
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
                # a 0.0 prior floor is a real measurement (the None-vs-0.0
                # fix lets it through) but no ratio is defined against it:
                # unchanged-at-zero reads 0% drift, movement off zero has
                # no percentage (selftest.py pins this)
                if prior_floor > 0:
                    drift = (mins[-1] - prior_floor) / prior_floor
                elif mins[-1] == prior_floor:
                    drift = 0.0
                if q in flagged_now:
                    flags.append({"query": q, "prior_floor": round(prior_floor, 4),
                                  "latest_min": round(mins[-1], 4),
                                  "drift_pct": None if drift is None
                                  else round(100 * drift, 1),
                                  "excess_pct": round(
                                      100 * (mins[-1] / (prior_floor * uniform) - 1), 1)
                                  if prior_floor > 0 else None})
        trend[q] = {"mins": [None if m is None else round(m, 4) for m in mins],
                    "min_of_mins": round(floor, 4),
                    "drift_pct": None if drift is None else round(100 * drift, 1)}
    flags.sort(key=lambda f: -(f["excess_pct"] if f["excess_pct"] is not None
                               else float("inf")))
    result = {
        "inputs": [r["file"] for r in runs],
        "skipped_no_detail": skipped,
        "threshold_pct": round(100 * threshold, 1),
        "uniform_drift_ratio": round(uniform, 3),
        "n_queries": len(queries),
        "persistent_flags": persistent,
        "persistent_note": persistent_note,
        "same_tree_drift": same_tree_drift,
        "verify": verify_report,
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
                  + (f"(+{fl['drift_pct']}% raw, +{fl['excess_pct']}% over the pack)"
                     if fl["excess_pct"] is not None
                     else "(moved off a 0.0 floor — no percentage defined)"))
    else:
        print("no query's newest min sits above the uniform-drift-adjusted floor "
              "by more than the threshold")
    if same_tree_drift:
        print(f"{len(same_tree_drift)} flag(s) auto-adjudicated as host noise — the "
              f"prior floor was set by a run of the SAME tree as the newest "
              f"(content-keyed: equal src_hash, or equal sha for pre-stamp "
              f"artifacts — same binary, same data): {same_tree_drift}")
    print(f"persistent flags ({persistent_note}): {persistent or 'NONE'}")
    if verify_report:
        print(f"  verify: {len(verify_report['cleared'])} cleared, "
              f"{len(verify_report['kept'])} reproduced, "
              f"{len(verify_report['unmeasured'])} unmeasured "
              f"(quiet runs: {', '.join(verify_report['files'])})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

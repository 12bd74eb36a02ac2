#!/usr/bin/env python3
"""Time-boxed per-query oracle check — the cross-scale (sf0.1) harness.

Runs tools/oracle_check.py one query at a time in a subprocess with a
wall-clock box (default 45 s/query, the grading box), so a pathological
oracle can never stall the whole sweep. The JSON verdict map is written
INSIDE the verify out_dir (boxed_oracle.json), so two concurrent runs
over different scales cannot clobber each other's results.

Usage: python3 tools/boxed_oracle_check.py <verify_out_dir> <sf_dir> [box_s] [query ...]
Dev tool only -- not part of the engine.
"""
import subprocess, sys, os, json

out_dir, sf_dir = sys.argv[1], sys.argv[2]
box = int(sys.argv[3]) if len(sys.argv) > 3 else 45
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
if len(sys.argv) > 4:
    names = sys.argv[4:]
res = {}
for n in names:
    try:
        p = subprocess.run(
            ["python3", os.path.join(os.path.dirname(__file__), "oracle_check.py"),
             out_dir, sf_dir, n],
            capture_output=True, text=True, timeout=box)
        res[n] = "PASS" if p.returncode == 0 else "FAIL"
        if p.returncode != 0:
            # stdout carries the oracle diff line; stderr carries crashes
            # (ImportError, bad paths) — print both or an environmental
            # failure masquerades as hundreds of oracle mismatches. When no
            # stdout line names the query (e.g. the checker died before the
            # compare), fall back to the last raw stdout lines so the FAIL
            # diagnostic is never an empty tail.
            tail = [l for l in p.stdout.splitlines() if n in l][-1:] \
                or p.stdout.strip().splitlines()[-2:] \
                or ["<no stdout from oracle_check>"]
            err = p.stderr.strip().splitlines()[-2:]
            print(f"FAIL {n}: {tail} stderr={err}", flush=True)
    except subprocess.TimeoutExpired:
        res[n] = "TIMEOUT"
        print(f"TIMEOUT {n}", flush=True)
npass = sum(1 for v in res.values() if v == "PASS")
print(f"\n{npass} PASS / {len(res)} total; "
      f"timeouts: {[k for k, v in res.items() if v == 'TIMEOUT']}; "
      f"fails: {[k for k, v in res.items() if v == 'FAIL']}")
json.dump(res, open(os.path.join(out_dir, "boxed_oracle.json"), "w"), indent=1)
sys.exit(0 if npass == len(res) else 1)

#!/usr/bin/env python3
"""Pinned round-over-round bench comparison (r12 verdict #1).

The r12 SURVEY cited a cross-round ratio ("1.006 vs the r11 idle
artifact") that did not reproduce from any committed artifact — the
comparand was never named. This script makes every cross-round perf
claim reproducible: both comparands are NAMED (a git commit whose tree
holds BENCH_SELF.json, or a literal file path), the common-query set is
computed explicitly, and the printed ratio is the one SURVEY may cite,
with the artifact's own load/flag metadata shown beside it so a
load-contaminated comparand is visible in the same breath.

Usage:
    python3 tools/bench_compare.py <ref-or-path-A> <ref-or-path-B> [--top N]

<ref-or-path> is either a commit-ish (BENCH_SELF.json is read from that
commit's tree via `git show`) or a path to a bench-artifact JSON file.
Ratio printed is total_B / total_A over the common query set (so A =
older round, B = newer round → ratio > 1 means B is slower).

Protocol for SURVEY perf claims (round 13 onward):
  - cite the exact command line including both commit hashes;
  - both comparands must be full-battery (partial:false), idle-start
    (start load printed below; want < ~1.5), zero load-flagged;
  - the ratio cited is the "common-set ratio" line verbatim.
"""
import json
import subprocess
import sys


def load(ref_or_path):
    try:
        with open(ref_or_path) as f:
            return json.load(f), ref_or_path
    except (FileNotFoundError, IsADirectoryError):
        out = subprocess.run(
            ["git", "show", f"{ref_or_path}:BENCH_SELF.json"],
            capture_output=True, text=True, cwd="/root/repo")
        if out.returncode != 0:
            sys.exit(f"cannot load {ref_or_path!r}: not a file, and "
                     f"`git show {ref_or_path}:BENCH_SELF.json` failed: "
                     f"{out.stderr.strip()}")
        full = subprocess.run(
            ["git", "rev-parse", ref_or_path], capture_output=True,
            text=True, cwd="/root/repo").stdout.strip()[:12]
        return json.loads(out.stdout), f"{ref_or_path} ({full})"


def meta(d):
    q = d.get("queries", {})
    flagged = d.get("queries_load_flagged") or d.get("load_flagged") or []
    if isinstance(flagged, dict):
        flagged = [k for k, v in flagged.items() if v]
    return {
        "n": len(q),
        "partial": d.get("partial"),
        "start_load": (d.get("queries_start_load") or {}).get("battery")
                      if isinstance(d.get("queries_start_load"), dict)
                      else d.get("queries_start_load"),
        "max_load": d.get("max_load"),
        "n_flagged": len(flagged),
        "suspect": d.get("suspect_load") or [],
    }


def main():
    argv = sys.argv[1:]
    top = 8
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = argv
    if len(args) != 2:
        sys.exit(__doc__)
    (da, la), (db, lb) = load(args[0]), load(args[1])
    qa, qb = da["queries"], db["queries"]
    common = sorted(k for k in qa if k in qb
                    and qa[k] is not None and qb[k] is not None
                    and qa[k] > 0 and qb[k] > 0)
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    ma, mb = meta(da), meta(db)
    print(f"A: {la}")
    print(f"   declared={ma['n']} partial={ma['partial']} "
          f"start_load={ma['start_load']} max_load={ma['max_load']} "
          f"flagged={ma['n_flagged']} suspect={ma['suspect']}")
    print(f"B: {lb}")
    print(f"   declared={mb['n']} partial={mb['partial']} "
          f"start_load={mb['start_load']} max_load={mb['max_load']} "
          f"flagged={mb['n_flagged']} suspect={mb['suspect']}")
    print(f"common queries: {len(common)}  "
          f"(A-only {len(qa) - len(common)}, B-only {len(qb) - len(common)})")
    print(f"common-set total: A {ta:.1f}s  B {tb:.1f}s")
    print(f"common-set ratio (B/A): {tb / ta:.3f}")
    drift = sorted(common, key=lambda k: qb[k] - qa[k])
    print(f"\ntop {top} absolute drifts (B - A seconds):")
    for k in reversed(drift[-top:]):
        print(f"  {k:32s} {qa[k]:7.2f} -> {qb[k]:7.2f}  "
              f"({qb[k] - qa[k]:+6.2f}s, {qb[k] / qa[k]:5.2f}x)")
    print(f"top {top} improvements:")
    for k in drift[:top]:
        print(f"  {k:32s} {qa[k]:7.2f} -> {qb[k]:7.2f}  "
              f"({qb[k] - qa[k]:+6.2f}s, {qb[k] / qa[k]:5.2f}x)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Rebuild bench_floor.json from the git history of bench_out.json.

The per-query floor ledger: for every query, the MIN over every
committed sf0.1 bench_out.json revision (the full artifacts — the
driver's BENCH_r*.json wrappers truncate the queries map to a 2KB
stdout tail and cannot serve as history). graft.Bench reads the
ledger at the end of a run and stamps/prints any query whose fresh
min exceeds 2x floor + 0.15s — the judge-side "no query past 2x"
gate, moved in-repo.

Run after committing a round's bench_out.json; commit the refreshed
ledger with it.

Usage: python3 tools/bench_floor.py [repo_dir] > /dev/null  (writes
<repo_dir>/bench_floor.json; prints a summary to stderr)
"""
import json
import subprocess
import sys


def main(repo="."):
    revs = subprocess.check_output(
        ["git", "-C", repo, "rev-list", "HEAD", "--", "bench_out.json"],
        text=True).split()
    floors, n_used = {}, 0
    for rev in revs:
        try:
            text = subprocess.check_output(
                ["git", "-C", repo, "show", f"{rev}:bench_out.json"],
                text=True, stderr=subprocess.DEVNULL)
            art = json.loads(text)
        except Exception:
            continue
        if not str(art.get("sf", "")).endswith("sf0.1"):
            continue
        n_used += 1
        # a query that THREW during the run records its time-to-failure
        # (graft.Bench stamps it in "failed") — that number must never
        # become the query's floor
        failed = set(art.get("failed", {}))
        for q, sec in art.get("queries", {}).items():
            if q in failed:
                continue
            if sec > 0 and (q not in floors or sec < floors[q]):
                floors[q] = sec
    out = {"sf": "/root/testdata/sf0.1", "revisions_used": n_used,
           "floors": dict(sorted(floors.items()))}
    with open(f"{repo}/bench_floor.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"bench_floor.json: {len(floors)} queries over {n_used} "
          f"committed sf0.1 artifacts", file=sys.stderr)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:]))

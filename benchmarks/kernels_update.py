"""Re-measure a subset of robots and splice the rows into an existing
BENCH_kernels_r{N}.json (in-place update for post-capture kernel fixes —
r4: the floating-base gj _inv66 switch and the humanoid fused-SO dispatch).

    python benchmarks/kernels_update.py --round 4 --robots iiwa_floating,...
"""

from __future__ import annotations

import argparse
import json
import os

from kernels_capture import REPO, run_suite


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

    over = [x for x in out["rows"] if x.get("sol_pct", 0) > 100]
    out["rows_over_100pct"] = len(over)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"updated {path}: {len(out['rows'])} rows, {len(over)} over 100%",
          flush=True)


if __name__ == "__main__":
    main()

"""Per-algorithm kernel benchmark suite — the ``_single_timing`` host-wrapper
analog (``/root/reference/algorithms/_inverse_dynamics.py:499-511`` prints
"Single Call ID %fus"; every algorithm file has the same harness).

Prints one JSON line per (algorithm, batch) with the single-call latency in
microseconds and throughput in calls/s, for both the fused Pallas tier and
the XLA tier. Run on the TPU:

    python benchmarks/suite.py [robot] [--batch B] [--algos a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("robot", nargs="?", default="iiwa")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--algos", type=str, default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--iters", type=int, default=200,
                    help="in-jit repeats; must dominate the ~28 ms fixed "
                         "remote-dispatch overhead for accurate per-call us")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--profile", type=str, default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the benchmarked "
                         "kernels into DIR (view with TensorBoard / Perfetto"
                         " — the tracing analog of the reference's timing "
                         "harness)")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="peak HBM bandwidth for the roofline (819 GB/s = "
                         "TPU v5e)")
    ap.add_argument("--peak-vpu-tflops", type=float, default=7.9,
                    help="peak f32 vector-unit FMA TFLOP/s for the compute "
                         "roofline leg (v5e estimate: 940 MHz x 8x128 lanes "
                         "x 4 ALU ops; the lane-major dynamics kernels are "
                         "VPU+HBM bound — the MXU peak is not the relevant "
                         "ceiling)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gridcodegenerator_tpu.api import GRiD
    from gridcodegenerator_tpu.utils.timing import time_kernel_ex

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from benchmarks.flops import algo_flops

    B = args.batch
    rng = np.random.default_rng(0)

    def bench(tier, use_pallas):
        # block_b=None: the model-aware default (kernels.default_block_b
        # halves the tile above 12 DoF for VMEM) — forcing 256 here made
        # the humanoid flat-tier rows ~1.7x slower than the same kernels
        # at their default tile (measured r5: atlas id_du 341 vs 198 us)
        g = GRiD(args.robot, dtype=jnp.float32, use_pallas=use_pallas,
                 block_b=None if B >= 256 else B)
        n, npos = g.num_vel, g.num_pos
        q = jnp.asarray(rng.uniform(-1, 1, (B, npos)), jnp.float32)
        qd, u = (jnp.asarray(rng.uniform(-1, 1, (B, n)), jnp.float32)
                 for _ in range(2))
        algos = {
            "id": (g.id, (q, qd, u)),
            "minv": (g.minv, (q,)),
            "fd": (g.fd, (q, qd, u)),
            "aba": (g.aba, (q, qd, u)),
            "crba": (g.crba, (q,)),
            "id_du": (g.id_du, (q, qd, u)),
            "fd_du": (g.fd_du, (q, qd, u)),
            "idsva_so": (g.idsva_so, (q, qd, u)),
            "fdsva_so": (g.fdsva_so, (q, qd, u)),
            "eepos": (g.eepos, (q,)),
            "deepos": (g.deepos, (q,)),
            "d2eepos": (g.d2eepos, (q,)),
        }
        wanted = (args.algos.split(",") if args.algos else list(algos))
        for name in wanted:
            fn, a = algos[name]
            try:
                tr = time_kernel_ex(lambda *xs: fn(*xs), a,
                                    iters=args.iters)
                sec = max(tr.seconds, 1e-9)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(json.dumps({"algo": name, "tier": tier,
                                  "error": str(e)[:200]}), flush=True)
                continue
            rec = {
                "algo": name, "tier": tier, "robot": args.robot, "batch": B,
                "us_per_call": round(sec * 1e6, 2),
                "us_per_sample": round(sec * 1e6 / B, 4),
                "calls_per_s": round(1.0 / sec, 1),
            }
            if tr.below_resolution:
                rec["below_resolution"] = True
            # --- roofline legs ------------------------------------------
            # memory leg: essential HBM traffic = inputs + outputs once
            # (the fused-kernel design goal: everything else VMEM-resident,
            # the analog of the reference's shared-memory scratch budgets)
            try:
                out = fn(*a)
                out_bytes = sum(int(np.prod(o.shape)) * o.dtype.itemsize
                                for o in jax.tree_util.tree_leaves(out))
                in_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                               for x in a)
                mem_us = (in_bytes + out_bytes) / (args.hbm_gbps * 1e3)
                rec["hbm_roofline_us"] = round(mem_us, 3)
                # compute leg: hand-counted essential FLOPs of the wave
                # algorithm (benchmarks/flops.py — static topology formulas,
                # the reference's scratch-size-formula style) against the
                # VPU non-FMA peak. Never XLA cost analysis: it counts the
                # materialized unfused graph, not the algorithm, and put
                # fused rows above 100% "speed of light" in round 2.
                flops = algo_flops(g.model, name) * B
                rec["gflops_per_call"] = round(flops / 1e9, 3)
                rec["achieved_gflops_s"] = round(flops / sec / 1e9, 1)
                vpu_us = flops / (args.peak_vpu_tflops * 1e6)
                rec["vpu_roofline_us"] = round(vpu_us, 3)
                rec["roofline_us"] = round(max(mem_us, vpu_us), 3)
                rec["sol_pct"] = round(
                    100.0 * max(mem_us, vpu_us) / (sec * 1e6), 1)
                rec["bound"] = "hbm" if mem_us >= vpu_us else "vpu"
            except Exception as e:  # noqa: BLE001 — roofline is best-effort
                rec["roofline_error"] = str(e)[:120]
            print(json.dumps(rec), flush=True)

    backend = jax.default_backend()
    print(json.dumps({"backend": backend, "device": str(jax.devices()[0])}),
          flush=True)

    import contextlib
    trace = (jax.profiler.trace(args.profile) if args.profile
             else contextlib.nullcontext())
    with trace:
        if not args.no_pallas and backend != "cpu":
            bench("pallas", True)
        bench("xla", False)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

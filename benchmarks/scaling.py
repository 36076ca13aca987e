"""Scaling-efficiency harness: scenario-tree MPC solves/s vs device count.

The north-star acceptance asks for solves/s reported at 1 chip, 1 host, and
>=2 hosts with >=80% scaling efficiency (BASELINE.md). The reference has no
distributed layer to mirror (SURVEY.md §2.7); this harness measures OUR
multi-chip layer: for each device count D it builds a mesh, shards
``n_per_device * D`` scenarios over it (weak scaling — per-device work held
constant), times the jitted scenario-tree MPC step, and reports solves/s and
efficiency vs the single-device run.

Run on real hardware (one process per host, ``initialize_distributed`` first)
or on the virtual CPU mesh for the collective-overhead picture:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling.py --robot iiwa --devices 1,2,4,8

Prints one JSON line per D plus a final efficiency summary line.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="iiwa")
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default: 1..all "
                         "powers of two)")
    ap.add_argument("--scenarios-per-device", type=int, default=32)
    ap.add_argument("--knots", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--solver-iters", type=int, default=3)
    ap.add_argument("--kp", type=int, default=1,
                    help="size of the within-host knot-parallel axis "
                         "(hybrid 2-axis mesh when > 1)")
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gridcodegenerator_tpu.models.model import build_model
    from gridcodegenerator_tpu.models.zoo import load_robot
    from gridcodegenerator_tpu.parallel.mesh import make_hybrid_mesh, make_mesh
    from gridcodegenerator_tpu.parallel.scenario import (
        ScenarioMPCConfig, make_scenario_step, perturb_scenarios)
    from gridcodegenerator_tpu.trajopt.cost import QuadCost
    from gridcodegenerator_tpu.trajopt.ilqr import ILQRConfig

    ndev = len(jax.devices())
    if args.devices:
        counts = [int(d) for d in args.devices.split(",")]
    else:
        counts, d = [], 1
        while d <= ndev:
            counts.append(d)
            d *= 2
    counts = [c for c in counts if c <= ndev]

    model = build_model(load_robot(args.robot), dtype=jnp.float32)
    n = model.n
    icfg = ILQRConfig(N=args.knots, dt=0.01, iters=args.solver_iters,
                      use_pallas=False)
    xg = jnp.zeros(2 * n).at[0].set(0.4)
    cost = QuadCost(Q=jnp.full(2 * n, 0.1), R=jnp.full(n, 1e-3),
                    Qf=jnp.full(2 * n, 10.0), x_goal=xg)

    results = {}
    for D in counts:
        if args.kp > 1:
            assert D % args.kp == 0, (D, args.kp)
            mesh = make_hybrid_mesh(("dp", "kp"), kp_size=args.kp,
                                    n_devices=D)
        else:
            mesh = make_mesh(D)
        S = args.scenarios_per_device * D
        cfg = ScenarioMPCConfig(ilqr=icfg, n_scenarios=S)
        step = make_scenario_step(model, cost, cfg, mesh)
        x0s = perturb_scenarios(jax.random.PRNGKey(0), jnp.zeros(2 * n), S)
        U = jnp.zeros((icfg.N, n, S), jnp.float32)
        jax.block_until_ready(step(x0s, U))  # compile
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = step(x0s, U)
        jax.block_until_ready(out)
        sec = (time.perf_counter() - t0) / args.repeats
        solves_s = S / sec
        results[D] = solves_s
        print(json.dumps({
            "metric": "scenario_mpc_solves_per_s", "devices": D,
            "kp": args.kp, "scenarios": S, "robot": args.robot,
            "value": round(solves_s, 1), "step_ms": round(sec * 1e3, 3),
        }), flush=True)

    if 1 in results and len(results) > 1:
        base = results[1]
        eff = {D: round(results[D] / (D * base), 4)
               for D in results if D > 1}
        print(json.dumps({"metric": "scaling_efficiency",
                          "vs_1_device": eff,
                          "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()

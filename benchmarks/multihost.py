"""Multi-PROCESS (multi-host) proof run for the scenario-tree MPC layer.

The north-star acceptance (BASELINE.md) asks for solves/s at 1 chip, 1 host,
and >=2 hosts. Real second hosts are not available in this environment, so
this harness runs the REAL multi-host code path — ``jax.distributed``
coordinator + per-process ``initialize_distributed`` + a DCN-spanning hybrid
mesh + cross-process collectives over the gRPC backend — with N separate OS
processes standing in for N hosts (CPU backend, a virtual device mesh per
process). Everything the framework would do on a 2-host v5p slice happens
here except the physical interconnect: global array construction from
process-local shards, hierarchical psum across the host boundary, replicated
consensus outputs on every process.

The reference is single-GPU (SURVEY.md §2.7) — nothing to mirror; this is
north-star infrastructure.

Usage (launcher spawns the workers):

    python benchmarks/multihost.py --procs 2 --devices-per-proc 4

Checks performed:
  * ``jax.process_count()`` equals the requested host count in every worker;
  * the consensus control u0 is bit-identical across processes (it is
    replicated by the final psum);
  * u0 matches a SINGLE-process run over the identical global scenario set
    to f32 reduction tolerance (hierarchical vs flat psum ordering);
  * reports scenario-solves/s for the multi-process step.

Writes MULTIHOST_r{round}.json at the repo root when --out is given.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker(args):
    # The axon sitecustomize overrides JAX_PLATFORMS at interpreter start,
    # so the platform must also be forced through jax.config after import
    # (same workaround as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gridcodegenerator_tpu.parallel.mesh import (
        initialize_distributed, make_hybrid_mesh)

    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.procs,
                           process_id=args.worker)
    assert jax.process_count() == args.procs, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gridcodegenerator_tpu.models.model import build_model
    from gridcodegenerator_tpu.models.zoo import load_robot
    from gridcodegenerator_tpu.parallel.scenario import (
        ScenarioMPCConfig, make_scenario_step, perturb_scenarios)
    from gridcodegenerator_tpu.trajopt.cost import QuadCost
    from gridcodegenerator_tpu.trajopt.ilqr import ILQRConfig

    model = build_model(load_robot(args.robot), dtype=jnp.float32)
    n = model.num_vel
    ndev_global = len(jax.devices())
    S = args.scenarios_per_device * ndev_global
    mesh = make_hybrid_mesh(kp_size=args.kp)

    cfg = ScenarioMPCConfig(
        ilqr=ILQRConfig(N=args.knots, iters=args.iters, use_pallas=False),
        n_scenarios=S)
    goal = jnp.concatenate([jnp.full(n, 0.5), jnp.zeros(n)]).astype(jnp.float32)
    cost = QuadCost(Q=jnp.full(2 * n, 0.1), R=jnp.full(n, 1e-3),
                    Qf=jnp.full(2 * n, 10.0), x_goal=goal)
    step = make_scenario_step(model, cost, cfg, mesh)

    # Deterministic GLOBAL scenario set (same on every process); each
    # process materializes only its addressable shards via the callback.
    x0 = jnp.zeros((2 * n,), jnp.float32)
    x0s_global = np.asarray(
        perturb_scenarios(jax.random.PRNGKey(0), x0, S, 0.05))
    U_global = np.zeros((args.knots, n, S), np.float32)

    axes = tuple(mesh.axis_names)
    sh_x = NamedSharding(mesh, P(None, axes))
    sh_U = NamedSharding(mesh, P(None, None, axes))
    x0s = jax.make_array_from_callback(
        x0s_global.shape, sh_x, lambda idx: x0s_global[idx])
    U = jax.make_array_from_callback(
        U_global.shape, sh_U, lambda idx: U_global[idx])

    u0, U_next, costs = jax.block_until_ready(step(x0s, U))

    import time
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        u0, U_next, costs = step(x0s, U)
    jax.block_until_ready(u0)
    dt = (time.perf_counter() - t0) / args.repeats

    out = {
        "process_id": args.worker,
        "process_count": jax.process_count(),
        "global_devices": ndev_global,
        "local_devices": jax.local_device_count(),
        "mesh": {a: int(mesh.shape[a]) for a in mesh.axis_names},
        "scenarios": S,
        "u0": np.asarray(u0).tolist(),
        "step_ms": round(dt * 1e3, 3),
        "scenario_solves_per_s": round(S / dt, 1),
    }
    print("WORKER_RESULT " + json.dumps(out), flush=True)


def _single_process_reference(args):
    """Same global problem on ONE process (D virtual devices) for parity."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                        % (args.procs * args.devices_per_proc))
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import json, numpy as np, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from jax.sharding import NamedSharding, PartitionSpec as P\n"
        "from gridcodegenerator_tpu.models.model import build_model\n"
        "from gridcodegenerator_tpu.models.zoo import load_robot\n"
        "from gridcodegenerator_tpu.parallel.mesh import make_hybrid_mesh\n"
        "from gridcodegenerator_tpu.parallel.scenario import (\n"
        "    ScenarioMPCConfig, make_scenario_step, perturb_scenarios)\n"
        "from gridcodegenerator_tpu.trajopt.cost import QuadCost\n"
        "from gridcodegenerator_tpu.trajopt.ilqr import ILQRConfig\n"
        f"model = build_model(load_robot('{args.robot}'), dtype=jnp.float32)\n"
        "n = model.num_vel\n"
        f"S = {args.scenarios_per_device} * len(jax.devices())\n"
        f"mesh = make_hybrid_mesh(kp_size={args.kp})\n"
        "cfg = ScenarioMPCConfig(\n"
        f"    ilqr=ILQRConfig(N={args.knots}, iters={args.iters},"
        " use_pallas=False),\n"
        "    n_scenarios=S)\n"
        "goal = jnp.concatenate([jnp.full(n, 0.5),"
        " jnp.zeros(n)]).astype(jnp.float32)\n"
        "cost = QuadCost(Q=jnp.full(2 * n, 0.1), R=jnp.full(n, 1e-3),\n"
        "                Qf=jnp.full(2 * n, 10.0), x_goal=goal)\n"
        "step = make_scenario_step(model, cost, cfg, mesh)\n"
        "x0 = jnp.zeros((2 * n,), jnp.float32)\n"
        "x0s_g = np.asarray(perturb_scenarios(jax.random.PRNGKey(0), x0, S,"
        " 0.05))\n"
        f"U_g = np.zeros(({args.knots}, n, S), np.float32)\n"
        "axes = tuple(mesh.axis_names)\n"
        "x0s = jax.device_put(x0s_g, NamedSharding(mesh, P(None, axes)))\n"
        "U = jax.device_put(U_g, NamedSharding(mesh, P(None, None, axes)))\n"
        "u0, _, _ = step(x0s, U)\n"
        "print('REF_RESULT ' + json.dumps(np.asarray(u0).tolist()))\n"
    )
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=1200)
    for line in res.stdout.splitlines():
        if line.startswith("REF_RESULT "):
            return json.loads(line[len("REF_RESULT "):])
    raise RuntimeError("single-process reference failed:\n" + res.stdout
                       + "\n" + res.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--robot", default="iiwa")
    ap.add_argument("--knots", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--scenarios-per-device", type=int, default=8)
    ap.add_argument("--kp", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=None,
                    help="write the summary JSON artifact here")
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        _worker(args)
        return

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                        % args.devices_per_proc)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for i in range(args.procs):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(i), "--coordinator", coord]
        for k in ("procs", "devices_per_proc", "knots", "iters",
                  "scenarios_per_device", "kp", "repeats"):
            cmd += ["--" + k.replace("_", "-"), str(getattr(args, k))]
        cmd += ["--robot", args.robot]
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    results, logs = [], []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        logs.append(out)
        if p.returncode != 0:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            raise SystemExit("worker failed:\n" + out)
        for line in out.splitlines():
            if line.startswith("WORKER_RESULT "):
                results.append(json.loads(line[len("WORKER_RESULT "):]))
    assert len(results) == args.procs, (len(results), logs)

    import numpy as np
    u0s = [np.asarray(r["u0"]) for r in results]
    max_cross = max(float(np.max(np.abs(u - u0s[0]))) for u in u0s[1:])
    u0_ref = np.asarray(_single_process_reference(args))
    err_vs_single = float(np.max(np.abs(u0s[0] - u0_ref)))
    scale = float(np.max(np.abs(u0_ref))) or 1.0

    summary = {
        "harness": "multi-process jax.distributed (CPU backend, one process "
                   "per simulated host)",
        "processes": args.procs,
        "devices_per_process": args.devices_per_proc,
        "global_devices": results[0]["global_devices"],
        "mesh": results[0]["mesh"],
        "scenarios": results[0]["scenarios"],
        "u0_cross_process_max_diff": max_cross,
        "u0_vs_single_process_max_err": err_vs_single,
        "u0_scale": scale,
        "step_ms": [r["step_ms"] for r in results],
        "scenario_solves_per_s": results[0]["scenario_solves_per_s"],
        "pass": bool(max_cross == 0.0 and err_vs_single < 1e-5 * max(scale, 1.0)),
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    if not summary["pass"]:
        raise SystemExit("multihost parity FAILED")


if __name__ == "__main__":
    main()

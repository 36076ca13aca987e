"""Benchmark driver: MPC solves/s/chip on the flagship config.

Primary metric (BASELINE.json): iLQR MPC solves/s/chip for the 7-DoF iiwa at
N=64 knots with analytical first-order gradients (config 3). One "solve" =
one full iLQR solve (``ITERS`` sweeps: fused fd_du linearization of all 64
knots, Riccati backward, line-searched forward) for one MPC problem; B
problems run batched on the chip's lanes.

``vs_baseline``: the reference repo publishes no numbers
(``BASELINE.md``); its acceptance bar is "meeting the real-time replanning
budget", i.e. >= 1 kHz replanning for the 7-DoF arm (the GRiD paper's MPC
regime). vs_baseline therefore reports solves/s/chip relative to that
1000 solves/s real-time bar.

Timing uses the in-jit repeat harness (the reference's ``_single_timing``
analog) so remote-dispatch latency is amortized out.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gridcodegenerator_tpu.models.model import build_model
    from gridcodegenerator_tpu.models.zoo import load_robot
    from gridcodegenerator_tpu.trajopt.cost import QuadCost
    from gridcodegenerator_tpu.trajopt.ilqr import ILQRConfig, make_ilqr
    from gridcodegenerator_tpu.utils.timing import time_kernel

    model = build_model(load_robot("iiwa"), dtype=jnp.float32)
    n = model.n
    N, ITERS, B = 64, 5, 2048  # B=2048 saturates the chip (~6% over 1024)

    cfg = ILQRConfig(N=N, dt=0.01, iters=ITERS)
    xg = jnp.zeros(2 * n).at[0].set(1.0).at[1].set(0.5)
    cost = QuadCost(Q=jnp.full(2 * n, 0.1), R=jnp.full(n, 1e-3),
                    Qf=jnp.full(2 * n, 100.0), x_goal=xg)
    solve = make_ilqr(model, cost, cfg)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.2, 0.2, (2 * n, B)), jnp.float32)
    U0 = jnp.zeros((N, n, B), jnp.float32)

    def solve_cost(x0_, U0_):
        return solve(x0_, U0_).cost

    # 10 in-jit repeats: the remote-TPU program-launch overhead is ~28 ms
    # fixed per dispatch; fewer repeats inflate the per-solve time
    dt = time_kernel(solve_cost, (x0, U0), iters=10)
    solves_per_s = B / dt
    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip_iiwa_N64",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()

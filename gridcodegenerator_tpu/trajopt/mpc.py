"""Receding-horizon MPC on top of the batched iLQR/DDP solver.

BASELINE.md configs 3-5: point-to-point reach and real-time replanning. The
controller keeps the whole plan on device, warm-starts each replan by
shifting the previous solution one knot, and exposes a jitted
``replan(x0, U_warm) -> (u0, U_next, cost)`` suitable for a real-time loop
(one device dispatch per control period).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from .cost import CostModel
from .ilqr import ILQRConfig, dynamics_step, make_ilqr


@dataclasses.dataclass
class MPC:
    model: RobotModel
    cost: CostModel
    cfg: ILQRConfig

    def __post_init__(self):
        self._solve = jax.jit(make_ilqr(self.model, self.cost, self.cfg))
        self._step = jax.jit(lambda x, u: dynamics_step(
            self.model, x, u, self.cfg.dt, self.cfg.gravity))

    def replan(self, x0: jnp.ndarray, U_warm: jnp.ndarray):
        """One MPC replan: x0 (2n, B), U_warm (N, n, B).

        Returns (u0 (n, B), U_next (N, n, B) shifted warm start, cost (B,)).
        """
        res = self._solve(x0, U_warm)
        U_next = jnp.concatenate([res.U[1:], res.U[-1:]], axis=0)
        return res.U[0], U_next, res.cost

    def rollout_closed_loop(self, x0: jnp.ndarray, steps: int):
        """Simulate `steps` control periods of the closed loop (replan each
        period, apply the first control). Returns (states, controls, costs)."""
        n = self.model.num_vel
        B = x0.shape[-1]
        U = jnp.zeros((self.cfg.N, n, B), x0.dtype)
        xs, us, cs = [x0], [], []
        x = x0
        for _ in range(steps):
            u0, U, c = self.replan(x, U)
            x = self._step(x, u0)
            xs.append(x)
            us.append(u0)
            cs.append(c)
        return (jnp.stack(xs), jnp.stack(us), jnp.stack(cs))

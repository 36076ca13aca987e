"""Multi-chip scenario-tree MPC: sharded rollouts + ICI consensus reduce.

BASELINE.md config 5: "Multi-host scenario-tree MPC: 4096 perturbed rollouts,
Riccati reduce over ICI". Design (nothing to mirror in the single-GPU
reference — SURVEY.md §2.7):

* S perturbed scenarios of the current state are SHARDED across the device
  mesh's "dp" axis (lane batch within each shard keeps the VPU full);
* each shard runs the batched iLQR/DDP solve on its local scenarios — the
  per-knot fd_du linearizations ride the local lanes, no communication;
* the scenario-tree consensus control (all scenarios share the first move)
  is a cost-weighted average of per-scenario first controls, reduced with
  ``psum`` over ICI inside ``shard_map`` — the "Riccati reduce" step: each
  scenario's Riccati solve contributes its feedforward weighted by its
  value, and the collective folds them into one executable u0;
* per-scenario costs are also ``psum``-reduced for monitoring, so a step
  returns globally consistent numbers on every device.

Everything compiles under ``jit`` with a ``Mesh`` of any size — including an
``xla_force_host_platform_device_count`` virtual CPU mesh, which is how CI
and the driver's multi-chip dry run validate it without hardware.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.model import RobotModel
from ..trajopt.cost import CostModel
from ..trajopt.ilqr import ILQRConfig, dynamics_step, make_ilqr


@dataclasses.dataclass(frozen=True)
class ScenarioMPCConfig:
    ilqr: ILQRConfig
    n_scenarios: int          # total scenarios S (divisible by mesh dp size)
    consensus_temp: float = 1.0   # softmin temperature for the cost weighting


def make_scenario_step(model: RobotModel, cost: CostModel,
                       cfg: ScenarioMPCConfig, mesh: Mesh,
                       knot_axis: str = "kp"):
    """Build the jitted scenario-tree MPC step.

    step(x0s (2n, S), U_warm (N, n, S)) ->
        (u0_consensus (n,), U_next (N, n, S), costs (S,))

    ``x0s`` holds the perturbed scenario states (the scenario axis is the
    trailing lane axis). Sharding layout over the mesh:

    * scenarios shard over every axis EXCEPT ``knot_axis`` ("dp" — DCN on
      a real multi-host slice);
    * when the mesh has a ``knot_axis`` ("kp", ICI) whose size divides the
      horizon, the per-shard iLQR solve runs its linearization and Riccati
      backward pass KNOT-SHARDED over it (``ILQRConfig.knot_axis`` ->
      ``parallel/knot_riccati.local_knot_gains``): each kp device
      linearizes N/D knots, the value recursion reduces over ICI in
      ceil(log2 D) ppermute rounds, and the small gains are all-gathered
      for the (kp-replicated) rollout — BASELINE config 5's "Riccati
      reduce over ICI" in the actual solve path;
    * the scenario-tree consensus (all scenarios share the first move) is
      a softmin-by-cost weighted psum of first controls over all axes
      (the kp-replicated copies scale numerator and denominator equally).
    """
    axes = tuple(mesh.axis_names)
    kp = mesh.shape.get(knot_axis, 1) if knot_axis in axes else 1
    icfg = cfg.ilqr
    use_kp = (kp > 1 and icfg.N % kp == 0
              and not icfg.use_second_order and not icfg.parallel_riccati
              and getattr(cost, "time_invariant", False))
    if use_kp:
        icfg = dataclasses.replace(icfg, knot_axis=knot_axis,
                                   knot_axis_size=kp)
        sc_axes = tuple(a for a in axes if a != knot_axis)
    else:
        sc_axes = axes
    solver = make_ilqr(model, cost, icfg)
    n = model.num_vel
    ntot = 1
    for a in sc_axes:
        ntot *= mesh.shape[a]
    assert cfg.n_scenarios % ntot == 0, (cfg.n_scenarios, ntot)

    def shard_step(x0s, U_warm):
        # local shard: (2n, S/ntot), (N, n, S/ntot)
        res = solver(x0s, U_warm)
        u0_local = res.U[0]                       # (n, S_loc)
        c_local = res.cost                        # (S_loc,)
        # scenario-tree consensus over ALL scenarios: softmin-by-cost
        w_local = jnp.exp(-cfg.consensus_temp
                          * (c_local - jax.lax.pmin(jnp.min(c_local), axes)))
        num = jax.lax.psum(jnp.sum(u0_local * w_local[None], axis=1), axes)
        den = jax.lax.psum(jnp.sum(w_local), axes)
        u0 = num / den                            # (n,) replicated
        U_next = jnp.concatenate([res.U[1:], res.U[-1:]], axis=0)
        return u0, U_next, c_local

    spec_x = P(None, sc_axes)
    spec_U = P(None, None, sc_axes)
    step = shard_map(
        shard_step, mesh=mesh,
        in_specs=(spec_x, spec_U),
        out_specs=(P(), spec_U, P(sc_axes)),
        # the per-shard solver dispatches fused Pallas kernels whose
        # ShapeDtypeStruct outputs carry no varying-mesh-axes annotation;
        # collectives here are explicit (psum/pmin), so skip the vma checker
        check_vma=False,
    )
    return jax.jit(step)


def perturb_scenarios(key, x0: jnp.ndarray, S: int, scale: float = 0.01):
    """Sample S perturbed copies of x0 (2n,) -> (2n, S)."""
    noise = scale * jax.random.normal(key, (x0.shape[0], S), x0.dtype)
    return x0[:, None] + noise


def closed_loop(model: RobotModel, cost: CostModel, cfg: ScenarioMPCConfig,
                mesh: Mesh, x0: jnp.ndarray, steps: int, key=None,
                noise_scale: float = 0.01):
    """Run the scenario-tree MPC closed loop for ``steps`` periods."""
    if key is None:
        key = jax.random.PRNGKey(0)
    step = make_scenario_step(model, cost, cfg, mesh)
    n = model.num_vel
    S = cfg.n_scenarios
    U = jnp.zeros((cfg.ilqr.N, n, S), x0.dtype)
    sharding_x = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
    xs, us = [x0], []
    x = x0
    for t in range(steps):
        key, sub = jax.random.split(key)
        x0s = jax.device_put(perturb_scenarios(sub, x, S, noise_scale),
                             sharding_x)
        u0, U, costs = step(x0s, U)
        x = dynamics_step(model, x[:, None], u0[:, None],
                          cfg.ilqr.dt, cfg.ilqr.gravity)[:, 0]
        xs.append(x)
        us.append(u0)
    return jnp.stack(xs), jnp.stack(us)

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
                       cfg: ScenarioMPCConfig, mesh: Mesh):
    """Build the jitted scenario-tree MPC step.

    step(x0s (2n, S), U_warm (N, n, S)) ->
        (u0_consensus (n,), U_next (N, n, S), costs (S,))

    ``x0s`` holds the perturbed scenario states (the scenario axis is the
    trailing lane axis, sharded over the mesh's "dp" axis).
    """
    solver = make_ilqr(model, cost, cfg.ilqr)
    n = model.num_vel
    # scenarios shard over EVERY mesh axis jointly: on a 1-axis ("dp",) mesh
    # this is plain data parallelism; on a hybrid ("dp", "kp") multi-host
    # mesh (make_hybrid_mesh) the solve stays embarrassingly parallel and
    # the only cross-axis traffic is the consensus psum below — an
    # (n,)-vector, so the DCN hop on the host-spanning "dp" axis is
    # bandwidth-trivial and XLA reduces hierarchically (ICI first).
    axes = tuple(mesh.axis_names)
    ntot = 1
    for a in axes:
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

    spec_x = P(None, axes)
    spec_U = P(None, None, axes)
    step = shard_map(
        shard_step, mesh=mesh,
        in_specs=(spec_x, spec_U),
        out_specs=(P(), spec_U, P(axes)),
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

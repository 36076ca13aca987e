"""Floating-base dynamics: algebraic self-consistency (no fixed-base oracle).

The reference supports floating base only for ID/Minv/FD/gradients
(``GRiDCodeGenerator.py:418-419``); here ABA and CRBA are floating-capable
too. Correctness is pinned by cross-algorithm identities (all five
algorithms must agree) plus quaternion-invariance checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.ops.aba import aba
from gridcodegenerator_tpu.ops.crba import crba
from gridcodegenerator_tpu.ops.fd import forward_dynamics
from gridcodegenerator_tpu.ops.minv import minv
from gridcodegenerator_tpu.ops.rnea import rnea

ROBOTS = ["pendulum2_floating", "iiwa_floating", "hyq_floating"]


def _rand(model, seed=0, B=2):
    rng = np.random.default_rng(seed)
    quat = rng.standard_normal(4)
    quat /= np.linalg.norm(quat)
    q = np.concatenate([rng.uniform(-1, 1, 3), quat,
                        rng.uniform(-1, 1, model.num_pos - 7)])
    q = np.repeat(q[:, None], B, 1)
    qd = rng.uniform(-1, 1, (model.num_vel, B))
    qdd = rng.uniform(-1, 1, (model.num_vel, B))
    return jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd)


@pytest.mark.parametrize("name", ROBOTS)
def test_floating_consistency(name):
    model = build_model(load_robot(name), dtype=jnp.float64)
    nv = model.num_vel
    q, qd, qdd = _rand(model)
    c = jax.jit(rnea)(model, q, qd, qdd)
    c0 = jax.jit(lambda m, a, b: rnea(m, a, b, None))(model, q, qd)
    M = jax.jit(crba)(model, q)
    Mi = jax.jit(lambda m, q: minv(m, q, True))(model, q)
    # M(q) Minv(q) == I
    MMi = jnp.einsum("ijb,jkb->ikb", M, Mi)
    np.testing.assert_allclose(np.asarray(MMi),
                               np.eye(nv)[:, :, None] * np.ones((1, 1, 2)),
                               atol=1e-9)
    # ID linear in qdd with matrix M
    np.testing.assert_allclose(np.asarray(c - c0),
                               np.asarray(jnp.einsum("ijb,jb->ib", M, qdd)),
                               atol=1e-9)
    # FD and ABA invert ID
    np.testing.assert_allclose(
        np.asarray(jax.jit(forward_dynamics)(model, q, qd, c)),
        np.asarray(qdd), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(jax.jit(aba)(model, q, qd, c)),
        np.asarray(qdd), atol=1e-9)


def test_quaternion_normalization_invariance():
    """Scaling the quaternion must not change the dynamics."""
    model = build_model(load_robot("pendulum2_floating"), dtype=jnp.float64)
    q, qd, qdd = _rand(model)
    c1 = jax.jit(rnea)(model, q, qd, qdd)
    q2 = q.at[3:7].multiply(2.5)
    c2 = jax.jit(rnea)(model, q2, qd, qdd)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-10)


def test_identity_pose_matches_fixed_base_gravity():
    """At identity base pose with zero base motion, the joint-torque rows of
    floating RNEA match fixed-base RNEA."""
    fixed = build_model(load_robot("pendulum2"), dtype=jnp.float64)
    flt = build_model(load_robot("pendulum2_floating"), dtype=jnp.float64)
    B = 1
    q_j = jnp.asarray(np.array([[0.3], [0.5]]))
    qd_j = jnp.asarray(np.array([[0.1], [-0.2]]))
    c_fixed = jax.jit(lambda m, a, b: rnea(m, a, b, None))(fixed, q_j, qd_j)
    q_f = jnp.concatenate([jnp.zeros((3, B)),
                           jnp.asarray([[0.0], [0.0], [0.0], [1.0]]), q_j])
    qd_f = jnp.concatenate([jnp.zeros((6, B)), qd_j])
    c_float = jax.jit(lambda m, a, b: rnea(m, a, b, None))(flt, q_f, qd_f)
    np.testing.assert_allclose(np.asarray(c_float[6:]), np.asarray(c_fixed),
                               atol=1e-10)

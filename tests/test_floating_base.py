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


def _rand_floating_state(model, B, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-1, 1, (model.num_pos, B))
    q[3:7] /= np.linalg.norm(q[3:7], axis=0)
    qd = rng.uniform(-1, 1, (model.num_vel, B))
    return jnp.asarray(q), jnp.asarray(qd), rng


def test_floating_id_grad_vs_autodiff():
    """Floating dc_du: qd block and joint-coordinate q block are exact
    coordinate derivatives; checked against jacfwd of the batched RNEA."""
    from gridcodegenerator_tpu.ops.id_grad import id_grad

    model = build_model(load_robot("iiwa_floating"), dtype=jnp.float64)
    nv = model.num_vel
    q, qd, rng = _rand_floating_state(model, 3)
    qdd = jnp.asarray(rng.uniform(-1, 1, (nv, 3)))
    D = id_grad(model, q, qd, qdd)
    assert D.shape == (nv, 2 * nv, 3)

    Jqd = jax.vmap(jax.jacfwd(
        lambda qdx, qx: rnea(model, qx[:, None], qdx[:, None],
                             qdd[:, :1])[:, 0]),
        in_axes=(-1, -1), out_axes=-1)(qd, q)
    np.testing.assert_allclose(np.asarray(D[:, nv:]), np.asarray(Jqd),
                               atol=1e-12)

    def c_of_qj(qj, qx, qdx, qddx):
        qfull = jnp.concatenate([qx[:7], qj])
        return rnea(model, qfull[:, None], qdx[:, None], qddx[:, None])[:, 0]

    Jq = jax.vmap(jax.jacfwd(c_of_qj), in_axes=(-1, -1, -1, -1),
                  out_axes=-1)(q[7:], q, qd, qdd)
    np.testing.assert_allclose(np.asarray(D[:, 6:nv]), np.asarray(Jq),
                               atol=1e-12)


def test_floating_id_grad_base_tangent_chart():
    """Base q-columns are body-frame tangent derivatives along the flow of
    the base velocity (dX = -crm(e_j) X, the SVA Xdot = -vx X identity) —
    verified by central differences with the exact matrix exponential."""
    import scipy.linalg as sla

    from gridcodegenerator_tpu.ops.id_grad import id_grad
    from gridcodegenerator_tpu.ops.rnea import rnea_bpass, rnea_fpass
    from gridcodegenerator_tpu.ops.xforms import all_xmats

    model = build_model(load_robot("iiwa_floating"), dtype=jnp.float64)
    nv = model.num_vel
    q, qd, rng = _rand_floating_state(model, 2)
    qdd = jnp.asarray(rng.uniform(-1, 1, (nv, 2)))
    D = id_grad(model, q, qd, qdd)

    def crm6(j):
        C = np.zeros((6, 6))
        e = np.zeros(6)
        e[j] = 1.0
        w, v = e[:3], e[3:]

        def skew(x):
            return np.array([[0, -x[2], x[1]], [x[2], 0, -x[0]],
                             [-x[1], x[0], 0]])

        C[:3, :3] = skew(w)
        C[3:, 3:] = skew(w)
        C[3:, :3] = skew(v)
        return C

    def c_from_Xs(Xs):
        v_, a_, f_ = rnea_fpass(model, Xs, qd, qdd)
        c, _ = rnea_bpass(model, Xs, qd, f_)
        return c

    Xs = all_xmats(model, q)
    eps = 1e-7
    for j in range(6):
        Ep = jnp.asarray(sla.expm(-eps * crm6(j)))
        Em = jnp.asarray(sla.expm(eps * crm6(j)))
        Xp = list(Xs)
        Xp[0] = jnp.einsum("rc,cdB->rdB", Ep, Xs[0])
        Xm = list(Xs)
        Xm[0] = jnp.einsum("rc,cdB->rdB", Em, Xs[0])
        fd_col = (c_from_Xs(Xp) - c_from_Xs(Xm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(D[:, j]), np.asarray(fd_col),
                                   atol=5e-6)


def test_floating_fd_grad_vs_autodiff():
    """Floating df_du: qd block and df/dtau (= Minv) are exact coordinate
    derivatives of the forward dynamics."""
    from gridcodegenerator_tpu.ops.fd_grad import fd_grad

    model = build_model(load_robot("hyq_floating"), dtype=jnp.float64)
    nv = model.num_vel
    q, qd, rng = _rand_floating_state(model, 2, seed=4)
    u = jnp.asarray(rng.uniform(-1, 1, (nv, 2)))
    df_du, qdd, Mi = fd_grad(model, q, qd, u, return_extras=True)
    assert df_du.shape == (nv, 2 * nv, 2)

    Jqd = jax.vmap(jax.jacfwd(
        lambda qdx, qx, ux: forward_dynamics(
            model, qx[:, None], qdx[:, None], ux[:, None])[:, 0]),
        in_axes=(-1, -1, -1), out_axes=-1)(qd, q, u)
    np.testing.assert_allclose(np.asarray(df_du[:, nv:]), np.asarray(Jqd),
                               atol=1e-9)
    Ju = jax.vmap(jax.jacfwd(
        lambda ux, qx, qdx: forward_dynamics(
            model, qx[:, None], qdx[:, None], ux[:, None])[:, 0]),
        in_axes=(-1, -1, -1), out_axes=-1)(u, q, qd)
    np.testing.assert_allclose(np.asarray(Mi), np.asarray(Ju), atol=1e-9)


def test_floating_api_gradients():
    """GRiD.id_du / fd_du work for floating-base robots (reference scope:
    ID/Minv/FD + gradients, GRiDCodeGenerator.py:418-419)."""
    from gridcodegenerator_tpu.api import GRiD

    g = GRiD("mixed5_floating", floating_base=True, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    q = rng.uniform(-1, 1, (3, g.num_pos))
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    qd = rng.uniform(-1, 1, (3, g.num_vel))
    u = rng.uniform(-1, 1, (3, g.num_vel))
    D = np.asarray(g.id_du(q, qd))
    F = np.asarray(g.fd_du(q, qd, u))
    assert D.shape == (3, g.num_vel, 2 * g.num_vel)
    assert F.shape == (3, g.num_vel, 2 * g.num_vel)
    assert np.all(np.isfinite(D)) and np.all(np.isfinite(F))


def test_floating_wave_vs_seeded_gradient():
    """The wave-algorithm floating dc_du equals the independently validated
    JVP-seeded route (same chart) on a branched floating robot."""
    from gridcodegenerator_tpu.ops.id_grad import id_grad, id_grad_seeded

    model = build_model(load_robot("hyq_floating"), dtype=jnp.float64)
    q, qd, rng = _rand_floating_state(model, 3, seed=7)
    qdd = jnp.asarray(rng.uniform(-1, 1, (model.num_vel, 3)))
    a = id_grad(model, q, qd, qdd)
    b = id_grad_seeded(model, q, qd, qdd)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

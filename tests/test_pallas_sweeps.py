"""Parity tests for the fused whole-sweep kernels (interpret mode).

Each fused sweep must reproduce the corresponding ``lax.scan`` formulation
used by ``trajopt/ilqr`` bit-for-bit (same math, same order of operations) —
these tests pin the two implementations together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.ops.aba import aba
from gridcodegenerator_tpu.ops.linalg import gj_inverse
from gridcodegenerator_tpu.ops.pallas import sweeps as _ps
from gridcodegenerator_tpu.ops.spatial import bmm, bmv

GRAV = -9.81
DT = 0.01


@pytest.fixture(scope="module")
def setup():
    model = build_model(load_robot("iiwa"), dtype=jnp.float64)
    rng = np.random.default_rng(3)
    return model, rng


def _scan_rollout(model, x0, U, dt):
    n = model.num_vel

    def body(x, u):
        q, qd = x[:n], x[n:]
        qd_new = qd + dt * aba(model, q, qd, u, GRAV)
        xn = jnp.concatenate([q + dt * qd_new, qd_new], axis=0)
        return xn, xn

    _, Xs = jax.lax.scan(body, x0, U)
    return Xs


def test_rollout_matches_scan(setup):
    model, rng = setup
    n, N, B = model.num_vel, 8, 4
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (2 * n, B)))
    U = jnp.asarray(rng.uniform(-1, 1, (N, n, B)))
    fused = _ps.rollout_pallas(model, N, DT, GRAV, block_b=B,
                               interpret=True)
    X_f = np.asarray(fused(x0, U))
    X_s = np.asarray(_scan_rollout(model, x0, U, DT))
    np.testing.assert_allclose(X_f, X_s, atol=1e-12)


def test_rollout_clamps_controls(setup):
    model, rng = setup
    n, N, B = model.num_vel, 4, 4
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (2 * n, B)))
    U = jnp.asarray(rng.uniform(-5, 5, (N, n, B)))
    fused = _ps.rollout_pallas(model, N, DT, GRAV, u_min=-1.0, u_max=1.0,
                               block_b=B, interpret=True)
    X_f = np.asarray(fused(x0, U))
    X_s = np.asarray(_scan_rollout(model, x0, jnp.clip(U, -1.0, 1.0), DT))
    np.testing.assert_allclose(X_f, X_s, atol=1e-12)


def test_feedback_rollout_matches_scan(setup):
    model, rng = setup
    n, N, B = model.num_vel, 8, 4
    nx = 2 * n
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (nx, B)))
    Uref = jnp.asarray(rng.uniform(-1, 1, (N, n, B)))
    Xref = jnp.asarray(rng.uniform(-0.5, 0.5, (N, nx, B)))
    kff = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, B)))
    K = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, nx, B)))

    fused = _ps.feedback_rollout_pallas(model, N, DT, GRAV, block_b=B,
                                        interpret=True)
    X_f, U_f = fused(x0, Uref, Xref, kff, K)

    def body(x, inp):
        xr, ur, k_t, K_t = inp
        u = ur + k_t + bmv(K_t, x - xr)
        q, qd = x[:n], x[n:]
        qd_new = qd + DT * aba(model, q, qd, u, GRAV)
        xn = jnp.concatenate([q + DT * qd_new, qd_new], axis=0)
        return xn, (xn, u)

    _, (X_s, U_s) = jax.lax.scan(body, x0, (Xref, Uref, kff, K))
    np.testing.assert_allclose(np.asarray(X_f), np.asarray(X_s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(U_f), np.asarray(U_s), atol=1e-12)


def test_linesearch_rollout_matches_widened_scan(setup):
    """In-kernel alpha widening == scan over explicitly widened lanes."""
    model, rng = setup
    n, N, B = model.num_vel, 6, 4
    nx = 2 * n
    alphas = (1.0, 0.5, 0.1)
    na = len(alphas)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (nx, B)))
    Uref = jnp.asarray(rng.uniform(-1, 1, (N, n, B)))
    Xref = jnp.asarray(rng.uniform(-0.5, 0.5, (N, nx, B)))
    ks = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, B)))
    K = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, nx, B)))

    fused = _ps.linesearch_rollout_pallas(model, N, DT, GRAV, alphas,
                                          block_b=B, interpret=True)
    X_f, U_f = fused(x0, Uref, Xref, ks, K)
    assert X_f.shape == (N, nx, na * B)

    def widen(z):
        return jnp.tile(z, (1,) * (z.ndim - 1) + (na,))

    alpha_w = jnp.repeat(jnp.asarray(alphas, x0.dtype), B)

    def body(x, inp):
        xr, ur, k_t, K_t = inp
        u = widen(ur) + alpha_w * widen(k_t) + bmv(widen(K_t), x - widen(xr))
        q, qd = x[:n], x[n:]
        qd_new = qd + DT * aba(model, q, qd, u, GRAV)
        xn = jnp.concatenate([q + DT * qd_new, qd_new], axis=0)
        return xn, (xn, u)

    _, (X_s, U_s) = jax.lax.scan(body, widen(x0), (Xref, Uref, ks, K))
    np.testing.assert_allclose(np.asarray(X_f), np.asarray(X_s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(U_f), np.asarray(U_s), atol=1e-12)


def test_linesearch_rollout_per_lane_alpha_rows(setup):
    """The optional ``alpha_rows (na, B)`` input gives every problem lane
    its own step size per row (the r5 two-stage refined stage): a run with
    heterogeneous per-lane rows must equal per-lane scalar-alpha runs."""
    model, rng = setup
    n, N, B = model.num_vel, 4, 4
    nx = 2 * n
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (nx, B)))
    Uref = jnp.asarray(rng.uniform(-1, 1, (N, n, B)))
    Xref = jnp.asarray(rng.uniform(-0.5, 0.5, (N, nx, B)))
    ks = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, B)))
    K = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, nx, B)))
    rows = jnp.asarray(rng.uniform(0.05, 1.0, (1, B)))

    fused = _ps.linesearch_rollout_pallas(model, N, DT, GRAV, (1.0,),
                                          block_b=B, interpret=True)
    X_r, U_r = fused(x0, Uref, Xref, ks, K, rows)
    for b in range(B):  # each lane vs a uniform-alpha run at its own value
        uni = _ps.linesearch_rollout_pallas(
            model, N, DT, GRAV, (float(rows[0, b]),), block_b=B,
            interpret=True)
        X_u, U_u = uni(x0, Uref, Xref, ks, K)
        np.testing.assert_allclose(np.asarray(X_r[..., b]),
                                   np.asarray(X_u[..., b]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(U_r[..., b]),
                                   np.asarray(U_u[..., b]), atol=1e-12)


def _scan_riccati(n, N, reg, Amat, Bmat, lx, lu, lxx, luu, lux, Vx0, Vxx0):
    """Mirror of trajopt/ilqr.backward's first-order scan body."""

    def body(carry, inp):
        Vx, Vxx = carry
        A, Bm, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
        At = jnp.swapaxes(A, 0, 1)
        Bt = jnp.swapaxes(Bm, 0, 1)
        Qx = lx_t + bmv(At, Vx)
        Qu = lu_t + bmv(Bt, Vx)
        Qxx = lxx_t + bmm(bmm(At, Vxx), A)
        Qux = lux_t + bmm(bmm(Bt, Vxx), A)
        Quu = luu_t + bmm(bmm(Bt, Vxx), Bm)
        reg_eye = reg * jnp.eye(n, dtype=Quu.dtype)[:, :, None]
        Quu_inv = gj_inverse(Quu + reg_eye)
        k_t = -bmv(Quu_inv, Qu)
        K_t = -bmm(Quu_inv, Qux)
        # full DDP value update — lockstep with trajopt/ilqr.backward
        Kt_T = jnp.swapaxes(K_t, 0, 1)
        Qux_T = jnp.swapaxes(Qux, 0, 1)
        Vx_n = (Qx + bmv(Kt_T, bmv(Quu, k_t)) + bmv(Kt_T, Qu)
                + bmv(Qux_T, k_t))
        Vxx_n = (Qxx + bmm(Kt_T, bmm(Quu, K_t)) + bmm(Kt_T, Qux)
                 + bmm(Qux_T, K_t))
        Vxx_n = 0.5 * (Vxx_n + jnp.swapaxes(Vxx_n, 0, 1))
        return (Vx_n, Vxx_n), (k_t, K_t)

    _, (ks, Ks) = jax.lax.scan(body, (Vx0, Vxx0),
                               (Amat, Bmat, lx, lu, lxx, luu, lux),
                               reverse=True)
    return ks, Ks


def _riccati_problem(rng, n, N, B):
    nx = 2 * n
    Amat = jnp.asarray(np.eye(nx)[None, :, :, None]
                       + 0.05 * rng.uniform(-1, 1, (N, nx, nx, B)))
    Bmat = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, nx, n, B)))
    lx = jnp.asarray(rng.uniform(-1, 1, (N, nx, B)))
    lu = jnp.asarray(rng.uniform(-1, 1, (N, n, B)))
    Vx0 = jnp.asarray(rng.uniform(-1, 1, (nx, B)))
    Qf = np.diag(rng.uniform(0.5, 2, nx))
    Vxx0 = jnp.asarray(np.tile(Qf[:, :, None], (1, 1, B)))
    return Amat, Bmat, lx, lu, Vx0, Vxx0


@pytest.mark.parametrize("stationary", [True, False])
def test_riccati_matches_scan(setup, stationary):
    model, rng = setup
    n, N, B = 3, 6, 4
    nx = 2 * n
    Amat, Bmat, lx, lu, Vx0, Vxx0 = _riccati_problem(rng, n, N, B)
    lxx1 = jnp.asarray(np.tile(np.diag(rng.uniform(0.1, 1, nx))[:, :, None],
                               (1, 1, B)))
    luu1 = jnp.asarray(np.tile(np.diag(rng.uniform(0.1, 1, n))[:, :, None],
                               (1, 1, B)))
    lux1 = jnp.zeros((n, nx, B), jnp.float64)

    fused = _ps.riccati_pallas(n, N, reg=1e-6, dtype=jnp.float64,
                               stationary_curvature=stationary,
                               block_b=B, interpret=True)
    if stationary:
        ks_f, Ks_f = fused(Amat, Bmat, lx, lu, lxx1, luu1, lux1, Vx0, Vxx0)
        lxx = jnp.tile(lxx1[None], (N, 1, 1, 1))
        luu = jnp.tile(luu1[None], (N, 1, 1, 1))
        lux = jnp.tile(lux1[None], (N, 1, 1, 1))
    else:
        lxx = jnp.asarray(rng.uniform(0.1, 1, (N, nx, nx, B)))
        lxx = 0.5 * (lxx + jnp.swapaxes(lxx, 1, 2)) + 2.0 * jnp.eye(nx)[
            None, :, :, None]
        luu = jnp.tile(luu1[None], (N, 1, 1, 1))
        lux = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, nx, B)))
        ks_f, Ks_f = fused(Amat, Bmat, lx, lu, lxx, luu, lux, Vx0, Vxx0)

    ks_s, Ks_s = _scan_riccati(n, N, 1e-6, Amat, Bmat, lx, lu, lxx, luu,
                               lux, Vx0, Vxx0)
    np.testing.assert_allclose(np.asarray(ks_f), np.asarray(ks_s),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(Ks_f), np.asarray(Ks_s),
                               atol=1e-10)


def test_riccati_factored_matches_scan(setup):
    """GN-factored fused sweep == scan with the dense curvature it encodes
    (lxx = blkdiag(Jw^T Jw, qd_diag I), luu = u_diag I, lux = 0)."""
    model, rng = setup
    n, N, B, r = 3, 6, 4, 2
    nx = 2 * n
    qd_diag, u_diag, reg = 0.05, 1e-3, 1e-6
    Amat, Bmat, lx, lu, Vx0, Vxx0 = _riccati_problem(rng, n, N, B)
    Jw = jnp.asarray(rng.uniform(-1, 1, (r, n, N * B)))

    fused = _ps.riccati_pallas_factored(n, N, reg, r, qd_diag, u_diag,
                                        dtype=jnp.float64, interpret=True)
    # flat knot-major lane layout (lane = t*B + b)
    def flat(z):  # (N, d, B) -> (d, N*B)
        return jnp.swapaxes(z, 0, 1).reshape(z.shape[1], -1)
    ks_f, Ks_f = fused(Amat, Bmat, flat(lx), flat(lu), Jw, Vx0, Vxx0)

    # dense equivalents for the scan mirror
    Jt = jnp.moveaxis(Jw.reshape(r, n, N, B), 2, 0)      # (N, r, n, B)
    JJ = jnp.einsum("trib,trjb->tijb", Jt, Jt)
    diag_qd = qd_diag * jnp.eye(nx, dtype=jnp.float64).at[:n, :n].set(0.0)
    lxx = jnp.zeros((N, nx, nx, B), jnp.float64)
    lxx = lxx.at[:, :n, :n].set(JJ) + diag_qd[None, :, :, None]
    luu = u_diag * jnp.broadcast_to(
        jnp.eye(n, dtype=jnp.float64)[None, :, :, None], (N, n, n, B))
    lux = jnp.zeros((N, n, nx, B), jnp.float64)
    ks_s, Ks_s = _scan_riccati(n, N, reg, Amat, Bmat, lx, lu, lxx, luu,
                               lux, Vx0, Vxx0)
    np.testing.assert_allclose(np.asarray(ks_f), np.asarray(ks_s),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(Ks_f), np.asarray(Ks_s),
                               atol=1e-10)


def test_ilqr_fused_sweeps_flag_off_matches_default_cpu():
    """On CPU both configs take the scan path — sanity that the flag wires
    through make_ilqr without changing results."""
    from gridcodegenerator_tpu.trajopt.cost import QuadCost
    from gridcodegenerator_tpu.trajopt.ilqr import ILQRConfig, make_ilqr

    model = build_model(load_robot("pendulum2"), dtype=jnp.float64)
    n = model.num_vel
    cost = QuadCost(Q=jnp.full(2 * n, 0.1), R=jnp.full(n, 1e-2),
                    Qf=jnp.full(2 * n, 10.0),
                    x_goal=jnp.zeros(2 * n).at[0].set(0.5))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (2 * n, 3)))
    U0 = jnp.zeros((8, n, 3), jnp.float64)
    r1 = make_ilqr(model, cost, ILQRConfig(N=8, iters=2))(x0, U0)
    r2 = make_ilqr(model, cost,
                   ILQRConfig(N=8, iters=2, fused_sweeps=False))(x0, U0)
    np.testing.assert_allclose(np.asarray(r1.cost), np.asarray(r2.cost),
                               atol=1e-12)


@pytest.mark.parametrize("cost_kind", ["quad", "ee_reach"])
def test_linesearch_in_kernel_cost_matches_total_cost(setup, cost_kind):
    """Fused line-search with in-kernel cost accumulation == the separate
    total_cost pass over the widened trajectory (interpret mode, f64)."""
    model, rng = setup
    from gridcodegenerator_tpu.ops import eepose as _eepose
    from gridcodegenerator_tpu.trajopt.cost import EEReachCost, QuadCost

    n = model.num_vel
    nx = 2 * n
    N, B = 5, 4
    alphas = (1.0, 0.25)
    na = len(alphas)
    if cost_kind == "quad":
        cost = QuadCost(Q=jnp.full(nx, 0.1), R=jnp.full(n, 1e-2),
                        Qf=jnp.full(nx, 5.0),
                        x_goal=jnp.zeros(nx).at[0].set(0.4))
    else:
        goal = _eepose.eepos(model, jnp.full((n, 1), 0.3,
                                             jnp.float64))[:3, 0]
        cost = EEReachCost(model=model, goal_xyz=goal, w_pos=0.5,
                           w_pos_f=50.0)
    ccv, stage_fn, term_fn = cost.pallas_cost()
    fb = _ps.linesearch_rollout_pallas(
        model, N, DT, GRAV, alphas, block_b=B, interpret=True,
        cost_consts=ccv, stage_cost=stage_fn, terminal_cost=term_fn)
    x0 = jnp.asarray(rng.uniform(-0.2, 0.2, (nx, B)))
    U = jnp.asarray(rng.uniform(-0.5, 0.5, (N, n, B)))
    Xref = jnp.asarray(rng.uniform(-0.2, 0.2, (N, nx, B)))
    ks = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, B)))
    Ks = jnp.asarray(0.1 * rng.uniform(-1, 1, (N, n, nx, B)))
    Xw, Uw, cw = fb(x0, U, Xref, ks, Ks)

    def widen(z):
        return jnp.tile(z, (1,) * (z.ndim - 1) + (na,))

    Xfull = jnp.concatenate([widen(x0)[None], Xw], axis=0)
    c_ref = cost.terminal(Xfull[N])
    for t in range(N):
        c_ref = c_ref + cost.stage(Xfull[t], Uw[t], t)
    np.testing.assert_allclose(np.asarray(cw), np.asarray(c_ref),
                               rtol=1e-10, atol=1e-12)

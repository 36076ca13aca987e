"""Oracle-layer tests: physics self-consistency + finite-difference gradients.

Strategy (SURVEY.md §4): the reference validates by eye-diffing NumPy oracle
prints against kernel DEBUG prints; here the oracle itself is pinned down by
algebraic identities and finite differences, then everything downstream is
asserted against the oracle.
"""

import numpy as np
import pytest

from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.reference import oracle

ROBOTS = ["pendulum2", "iiwa", "mixed5", "hyq", "atlas"]


def _rand(robot, seed=0):
    n = robot.get_num_joints()
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
            rng.uniform(-1, 1, n), rng.uniform(-1, 1, n))


@pytest.mark.parametrize("name", ROBOTS)
def test_id_fd_roundtrip(name):
    """FD(q, qd, ID(q, qd, qdd)) == qdd, via both Minv and ABA routes."""
    r = load_robot(name)
    q, qd, qdd, _ = _rand(r)
    c, _, _, _ = oracle.rnea(r, q, qd, qdd)
    np.testing.assert_allclose(oracle.forward_dynamics(r, q, qd, c), qdd,
                               atol=1e-10)
    np.testing.assert_allclose(oracle.aba(r, q, qd, c), qdd, atol=1e-10)


@pytest.mark.parametrize("name", ROBOTS)
def test_crba_minv_inverse(name):
    r = load_robot(name)
    q, _, _, _ = _rand(r)
    n = r.get_num_joints()
    M = oracle.crba(r, q)
    Mi = oracle.minv(r, q, True)
    np.testing.assert_allclose(M @ Mi, np.eye(n), atol=1e-10)
    np.testing.assert_allclose(M, M.T, atol=1e-12)
    assert np.linalg.eigvalsh(M).min() > 0


@pytest.mark.parametrize("name", ROBOTS)
def test_rnea_linear_in_qdd(name):
    """ID(q,qd,qdd) - ID(q,qd,0) == M(q) qdd  (defining property of M)."""
    r = load_robot(name)
    q, qd, qdd, _ = _rand(r)
    c1, _, _, _ = oracle.rnea(r, q, qd, qdd)
    c0, _, _, _ = oracle.rnea(r, q, qd, None)
    np.testing.assert_allclose(c1 - c0, oracle.crba(r, q) @ qdd, atol=1e-10)


@pytest.mark.parametrize("name", ROBOTS)
def test_rnea_grad_finite_diff(name):
    r = load_robot(name)
    q, qd, qdd, _ = _rand(r)
    n = r.get_num_joints()
    dc_du = oracle.rnea_grad(r, q, qd, qdd)
    eps = 1e-6
    fd = np.zeros((n, 2 * n))
    for k in range(n):
        qp, qm = q.copy(), q.copy(); qp[k] += eps; qm[k] -= eps
        fd[:, k] = (oracle.rnea(r, qp, qd, qdd)[0]
                    - oracle.rnea(r, qm, qd, qdd)[0]) / (2 * eps)
        dp, dm = qd.copy(), qd.copy(); dp[k] += eps; dm[k] -= eps
        fd[:, n + k] = (oracle.rnea(r, q, dp, qdd)[0]
                        - oracle.rnea(r, q, dm, qdd)[0]) / (2 * eps)
    np.testing.assert_allclose(dc_du, fd, atol=5e-6)


@pytest.mark.parametrize("name", ROBOTS)
def test_fd_grad_finite_diff(name):
    r = load_robot(name)
    q, qd, _, u = _rand(r)
    n = r.get_num_joints()
    df_du, qdd, Mi = oracle.fd_grad(r, q, qd, u)
    np.testing.assert_allclose(qdd, oracle.forward_dynamics(r, q, qd, u),
                               atol=1e-10)
    eps = 1e-6
    fd = np.zeros((n, 2 * n))
    for k in range(n):
        qp, qm = q.copy(), q.copy(); qp[k] += eps; qm[k] -= eps
        fd[:, k] = (oracle.forward_dynamics(r, qp, qd, u)
                    - oracle.forward_dynamics(r, qm, qd, u)) / (2 * eps)
        dp, dm = qd.copy(), qd.copy(); dp[k] += eps; dm[k] -= eps
        fd[:, n + k] = (oracle.forward_dynamics(r, q, dp, u)
                        - oracle.forward_dynamics(r, q, dm, u)) / (2 * eps)
    np.testing.assert_allclose(df_du, fd, atol=5e-5)


def test_pendulum_analytic():
    """2-link pendulum at rest, horizontal: torques = gravity moments."""
    r = load_robot("pendulum2")
    q = np.zeros(2)
    qd = np.zeros(2)
    c, _, _, _ = oracle.rnea(r, q, qd, None)
    g = 9.81
    # unit links, unit masses, com at 0.5, joints about +y, chain along +x:
    # gravity (-z) exerts moment +x*m*g about +y, so the holding torque is
    # tau_1 = -g*(0.5 + 1.5), tau_2 = -g*0.5
    np.testing.assert_allclose(c, [-g * 2.0, -g * 0.5], rtol=1e-12)


def test_minv_upper_triangular_compressed():
    r = load_robot("iiwa")
    q, _, _, _ = _rand(r)
    Mi_u = oracle.minv(r, q, output_dense=False)
    assert np.allclose(Mi_u, np.triu(Mi_u))
    Mi_d = oracle.minv(r, q, output_dense=True)
    np.testing.assert_allclose(np.triu(Mi_d), Mi_u)

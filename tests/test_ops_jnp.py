"""Batched jnp kernel suite vs the float64 oracle.

Every algorithm is jitted (the only supported usage) and compared lane-by-lane
against the NumPy oracle — the automated version of the reference's
DEBUG_MODE print-diffing strategy (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.ops.aba import aba
from gridcodegenerator_tpu.ops.crba import crba
from gridcodegenerator_tpu.ops.eepose import d2eepos, deepos, eepos, num_ees
from gridcodegenerator_tpu.ops.fd import forward_dynamics
from gridcodegenerator_tpu.ops.fd_grad import fd_grad
from gridcodegenerator_tpu.ops.id_grad import id_grad
from gridcodegenerator_tpu.ops.minv import minv
from gridcodegenerator_tpu.ops.rnea import rnea
from gridcodegenerator_tpu.reference import oracle

ROBOTS = ["pendulum2", "iiwa", "mixed5", "hyq"]
B = 3


def _setup(name, seed=0):
    topo = load_robot(name)
    model = build_model(topo, dtype=jnp.float64)
    n = topo.get_num_joints()
    rng = np.random.default_rng(seed)
    data = {k: rng.uniform(-1, 1, (n, B)) for k in ("q", "qd", "qdd", "u")}
    jdata = {k: jnp.asarray(v) for k, v in data.items()}
    return topo, model, data, jdata


@pytest.mark.parametrize("name", ROBOTS)
def test_rnea_vs_oracle(name):
    topo, model, d, j = _setup(name)
    c = np.asarray(jax.jit(rnea)(model, j["q"], j["qd"], j["qdd"]))
    c_nq = np.asarray(jax.jit(
        lambda m, q, qd: rnea(m, q, qd, None))(model, j["q"], j["qd"]))
    for b in range(B):
        co, *_ = oracle.rnea(topo, d["q"][:, b], d["qd"][:, b], d["qdd"][:, b])
        np.testing.assert_allclose(c[:, b], co, atol=1e-11)
        co0, *_ = oracle.rnea(topo, d["q"][:, b], d["qd"][:, b], None)
        np.testing.assert_allclose(c_nq[:, b], co0, atol=1e-11)


@pytest.mark.parametrize("name", ROBOTS)
def test_minv_crba_vs_oracle(name):
    topo, model, d, j = _setup(name)
    Mi = np.asarray(jax.jit(lambda m, q: minv(m, q, True))(model, j["q"]))
    M = np.asarray(jax.jit(crba)(model, j["q"]))
    for b in range(B):
        np.testing.assert_allclose(Mi[:, :, b],
                                   oracle.minv(topo, d["q"][:, b], True),
                                   atol=1e-10)
        np.testing.assert_allclose(M[:, :, b], oracle.crba(topo, d["q"][:, b]),
                                   atol=1e-10)


@pytest.mark.parametrize("name", ROBOTS)
def test_fd_aba_vs_oracle(name):
    topo, model, d, j = _setup(name)
    qdd_minv = np.asarray(jax.jit(forward_dynamics)(
        model, j["q"], j["qd"], j["u"]))
    qdd_aba = np.asarray(jax.jit(aba)(model, j["q"], j["qd"], j["u"]))
    for b in range(B):
        ref = oracle.forward_dynamics(topo, d["q"][:, b], d["qd"][:, b],
                                      d["u"][:, b])
        np.testing.assert_allclose(qdd_minv[:, b], ref, atol=1e-10)
        np.testing.assert_allclose(qdd_aba[:, b], ref, atol=1e-10)


@pytest.mark.parametrize("name", ["pendulum2", "iiwa", "mixed5"])
def test_gradients_vs_oracle(name):
    topo, model, d, j = _setup(name)
    dc = np.asarray(jax.jit(id_grad)(model, j["q"], j["qd"], j["qdd"]))
    df = np.asarray(jax.jit(fd_grad)(model, j["q"], j["qd"], j["u"]))
    for b in range(B):
        dco = oracle.rnea_grad(topo, d["q"][:, b], d["qd"][:, b],
                               d["qdd"][:, b])
        np.testing.assert_allclose(dc[:, :, b], dco, atol=1e-10)
        dfo, _, _ = oracle.fd_grad(topo, d["q"][:, b], d["qd"][:, b],
                                   d["u"][:, b])
        np.testing.assert_allclose(df[:, :, b], dfo, atol=1e-10)


def test_gradients_branched():
    topo, model, d, j = _setup("hyq")
    dc = np.asarray(jax.jit(id_grad)(model, j["q"], j["qd"], j["qdd"]))
    dco = oracle.rnea_grad(topo, d["q"][:, 0], d["qd"][:, 0], d["qdd"][:, 0])
    np.testing.assert_allclose(dc[:, :, 0], dco, atol=1e-10)


def test_gradients_vs_autodiff():
    """Analytical id_grad equals jacfwd of rnea — the autodiff cross-check."""
    topo, model, d, j = _setup("iiwa")
    dc = np.asarray(jax.jit(id_grad)(model, j["q"], j["qd"], j["qdd"]))

    def c_sample(q, qd, qdd):
        return rnea(model, q[:, None], qd[:, None], qdd[:, None])[:, 0]

    Jq = jax.vmap(jax.jacfwd(c_sample, argnums=0), in_axes=-1, out_axes=-1)
    Jqd = jax.vmap(jax.jacfwd(c_sample, argnums=1), in_axes=-1, out_axes=-1)
    dq = np.asarray(jax.jit(Jq)(j["q"], j["qd"], j["qdd"]))
    dqd = np.asarray(jax.jit(Jqd)(j["q"], j["qd"], j["qdd"]))
    n = model.n
    np.testing.assert_allclose(dc[:, :n], dq, atol=1e-10)
    np.testing.assert_allclose(dc[:, n:], dqd, atol=1e-10)


def test_eepose_vs_topology_fk():
    """eepos matches the topology layer's numpy homogeneous chain."""
    topo, model, d, j = _setup("iiwa")
    pose = np.asarray(jax.jit(lambda m, q: eepos(m, q))(model, j["q"]))
    assert num_ees(model) == 1
    for b in range(B):
        Ts = topo.get_Xmats_hom_ordered_by_id(d["q"][:, b])
        T = np.eye(4)
        for Ti in Ts:
            T = T @ Ti
        T = T @ topo.fixed_joints[0].Ttree
        np.testing.assert_allclose(pose[:3, b], T[:3, 3], atol=1e-11)
        R = T[:3, :3]
        rpy = [np.arctan2(R[2, 1], R[2, 2]),
               -np.arctan2(R[2, 0], np.hypot(R[2, 1], R[2, 2])),
               np.arctan2(R[1, 0], R[0, 0])]
        np.testing.assert_allclose(pose[3:, b], rpy, atol=1e-11)


def test_eepose_grad_hess_finite_diff():
    topo, model, d, j = _setup("iiwa")
    J = np.asarray(jax.jit(lambda m, q: deepos(m, q))(model, j["q"]))
    H = np.asarray(jax.jit(lambda m, q: d2eepos(m, q))(model, j["q"]))
    n = model.n
    eps = 1e-6
    pose = lambda q: np.asarray(eepos(model, jnp.asarray(q)))
    q = d["q"]
    for k in range(n):
        qp, qm = q.copy(), q.copy()
        qp[k] += eps
        qm[k] -= eps
        np.testing.assert_allclose(J[:, k], (pose(qp) - pose(qm)) / (2 * eps),
                                   atol=1e-5)
    # Hessian symmetry + one finite-diff column of the Jacobian derivative
    np.testing.assert_allclose(H, np.swapaxes(H, 1, 2), atol=1e-9)


def test_damping_affects_dynamics():
    """iiwa has damping; removing it changes c — guards damping plumbing."""
    topo, model, d, j = _setup("iiwa")
    import dataclasses
    model0 = dataclasses.replace(model, damping=jnp.zeros_like(model.damping))
    c1 = np.asarray(jax.jit(rnea)(model, j["q"], j["qd"], j["qdd"]))
    c0 = np.asarray(jax.jit(rnea)(model0, j["q"], j["qd"], j["qdd"]))
    expected = 0.1 * d["qd"]  # zoo iiwa damping = 0.1 on every joint
    np.testing.assert_allclose(c1 - c0, expected, atol=1e-12)


def test_api_ee_targets_subset():
    """GRiD(ee_targets=[...]) selects named fixed-joint frames (the
    reference's fixed_target_name mechanism)."""
    from gridcodegenerator_tpu.api import GRiD

    g_all = GRiD("hyq", dtype=jnp.float64)
    g_two = GRiD("hyq", dtype=jnp.float64,
                 ee_targets=["rf_foot_fixed", "lf_foot_fixed"])
    assert g_all.num_ees == 4 and g_two.num_ees == 2
    rng = np.random.default_rng(0)
    q = rng.uniform(-1, 1, (5, g_all.num_pos))
    p_all = np.asarray(g_all.eepos(q)).reshape(5, 4, 6)
    p_two = np.asarray(g_two.eepos(q)).reshape(5, 2, 6)
    # default order is fixed-joint order: lf, lh, rf, rh
    np.testing.assert_allclose(p_two[:, 0], p_all[:, 2], atol=1e-12)
    np.testing.assert_allclose(p_two[:, 1], p_all[:, 0], atol=1e-12)
    J = np.asarray(g_two.deepos(q))
    assert J.shape == (5, 12, g_two.num_pos)


def test_fk_matches_eepos_chain():
    """fk() world transforms reproduce the EE poses through the fixed-joint
    frames (iiwa leaf) and respect the parent chain (hyq branches)."""
    from gridcodegenerator_tpu.api import GRiD
    from gridcodegenerator_tpu.ops import eepose as _eepose

    g = GRiD("hyq", dtype=jnp.float64)
    rng = np.random.default_rng(2)
    q = rng.uniform(-1, 1, (3, g.num_pos))
    T = np.asarray(g.fk(q))                     # (3, n, 4, 4)
    assert T.shape == (3, g.model.n, 4, 4)
    # push each fk leaf transform through its fixed joint -> eepos parity
    pose = np.asarray(g.eepos(q)).reshape(3, g.num_ees, 6)
    for e, (chain, fid) in enumerate(_eepose.ee_chains(g.model)):
        Tw = T[:, chain[-1]] @ np.asarray(g.model.Tfixed[fid])
        np.testing.assert_allclose(Tw[:, :3, 3], pose[:, e, :3], atol=1e-10)
    # orthonormal rotations
    RtR = np.einsum("bnij,bnik->bnjk", T[:, :, :3, :3], T[:, :, :3, :3])
    np.testing.assert_allclose(
        RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-10)


def test_error_guards():
    """gpuErrchk analog: finite outputs pass, NaN raises; limit checks."""
    import pytest as _pytest

    from gridcodegenerator_tpu.api import GRiD
    from gridcodegenerator_tpu.utils.errors import (
        check_joint_limits, checked)

    g = GRiD("iiwa", dtype=jnp.float64)
    q = np.zeros((2, g.num_pos))
    ok = checked(g.id, "id")(q, q)
    assert np.all(np.isfinite(np.asarray(ok)))
    bad = q.copy()
    bad[0, 0] = np.nan
    with _pytest.raises(FloatingPointError):
        np.asarray(checked(g.id, "id")(bad, q))
    lims = check_joint_limits(g.model, np.zeros((4, g.num_pos)))
    assert lims.shape == (4,) and lims.all()
    big = np.full((1, g.num_pos), 100.0)
    assert not check_joint_limits(g.model, big).any()


def test_fd_grad_with_realized_qdd_matches():
    """The USE_QDD_MINV_FLAG analog: passing the realized qdd skips the
    internal FD solve and yields the identical gradient
    (``_forward_dynamics_gradient.py:209``)."""
    from gridcodegenerator_tpu.ops.fd import forward_dynamics
    from gridcodegenerator_tpu.ops.fd_grad import fd_grad

    model = build_model(load_robot("hyq"), dtype=jnp.float64)
    n = model.n
    rng = np.random.default_rng(2)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (n, 3))) for _ in range(3))
    qdd = forward_dynamics(model, q, qd, u)
    a = np.asarray(fd_grad(model, q, qd, u))
    b = np.asarray(fd_grad(model, q, qd, u, qdd=qdd))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_packed_input_helpers_match():
    """gridData-layout packed inputs equal the separated-argument calls
    (the USE_COMPRESSED_MEM q_qd_u stride buffers,
    ``GRiDCodeGenerator.py:163-183``)."""
    from gridcodegenerator_tpu.api import GRiD

    g = GRiD("iiwa", dtype=jnp.float64, use_pallas=False)
    rng = np.random.default_rng(3)
    B = 4
    packed = rng.uniform(-1, 1, (B, g.num_pos + 2 * g.num_vel))
    q, qd, u = (packed[:, :g.num_pos], packed[:, g.num_pos:g.num_pos + g.num_vel],
                packed[:, g.num_pos + g.num_vel:])
    np.testing.assert_allclose(np.asarray(g.aba_packed(packed)),
                               np.asarray(g.aba(q, qd, u)), atol=0)
    np.testing.assert_allclose(np.asarray(g.fd_packed(packed)),
                               np.asarray(g.fd(q, qd, u)), atol=0)
    np.testing.assert_allclose(np.asarray(g.fd_du_packed(packed)),
                               np.asarray(g.fd_du(q, qd, u)), atol=0)
    np.testing.assert_allclose(np.asarray(g.fdsva_so_packed(packed)),
                               np.asarray(g.fdsva_so(q, qd, u)), atol=0)


def test_include_base_inertia_option():
    """build_model(include_base_inertia=True) bakes the base-link spatial
    inertia into the constant pytree (zeros otherwise) — the reference's
    XI-blob option ("X[0..N], Ibase, I[0..N]",
    /root/reference/helpers/_topology_helpers.py:27-33,
    GRiDCodeGenerator.py:309)."""
    import numpy as np

    from gridcodegenerator_tpu.models.model import build_model
    from gridcodegenerator_tpu.models.zoo import load_robot

    topo = load_robot("iiwa")
    m = build_model(topo, include_base_inertia=True)
    np.testing.assert_allclose(np.asarray(m.base_inertia),
                               topo.get_Imats_ordered_by_id()[0], atol=1e-6)
    assert float(np.abs(np.asarray(
        build_model(topo).base_inertia)).max()) == 0.0

"""Second-order derivative suites (IDSVA-SO / FDSVA-SO analogs).

Oracle: nested forward-mode autodiff of the *plain RNEA/FD* functions —
independent of the analytical first-order kernels the suite differentiates,
so agreement checks both layers at once.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.ops.fd import forward_dynamics
from gridcodegenerator_tpu.ops.rnea import rnea
from gridcodegenerator_tpu.ops.so import fdsva_so, idsva_so


@pytest.fixture(scope="module")
def setup():
    model = build_model(load_robot("pendulum2"), dtype=jnp.float64)
    rng = np.random.default_rng(7)
    n, B = model.n, 2
    arrs = tuple(jnp.asarray(rng.uniform(-1, 1, (n, B))) for _ in range(3))
    return model, arrs


def test_idsva_so_vs_nested_autodiff(setup):
    model, (q, qd, qdd) = setup
    n = model.n
    T = np.asarray(jax.jit(idsva_so)(model, q, qd, qdd))  # (4,n,n,n,B)

    def tau(qs, qds, qdds):
        return rnea(model, qs[:, None], qds[:, None], qdds[:, None])[:, 0]

    d2q = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(tau, 0), 0),
                           in_axes=-1, out_axes=-1))(q, qd, qdd)
    d2qd = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(tau, 1), 1),
                            in_axes=-1, out_axes=-1))(q, qd, qdd)
    # cross[i, j, k] = d2tau_i / dqd_j dq_k
    cross = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(tau, 1), 0),
                             in_axes=-1, out_axes=-1))(q, qd, qdd)
    dM = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(tau, 2), 0),
                          in_axes=-1, out_axes=-1))(q, qd, qdd)
    np.testing.assert_allclose(T[0], np.asarray(d2q), atol=1e-9)
    np.testing.assert_allclose(T[1], np.asarray(d2qd), atol=1e-9)
    np.testing.assert_allclose(T[2], np.asarray(cross), atol=1e-9)
    np.testing.assert_allclose(T[3], np.asarray(dM), atol=1e-9)


def test_fdsva_so_vs_nested_autodiff(setup):
    model, (q, qd, u) = setup
    T = np.asarray(jax.jit(fdsva_so)(model, q, qd, u))

    def qdd_fn(qs, qds, us):
        return forward_dynamics(model, qs[:, None], qds[:, None],
                                us[:, None])[:, 0]

    d2q = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(qdd_fn, 0), 0),
                           in_axes=-1, out_axes=-1))(q, qd, u)
    d2qd = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(qdd_fn, 1), 1),
                            in_axes=-1, out_axes=-1))(q, qd, u)
    cross = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(qdd_fn, 1), 0),
                             in_axes=-1, out_axes=-1))(q, qd, u)
    dtau_q = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(qdd_fn, 2), 0),
                              in_axes=-1, out_axes=-1))(q, qd, u)
    np.testing.assert_allclose(T[0], np.asarray(d2q), atol=1e-8)
    np.testing.assert_allclose(T[1], np.asarray(d2qd), atol=1e-8)
    np.testing.assert_allclose(T[2], np.asarray(cross), atol=1e-8)
    np.testing.assert_allclose(T[3], np.asarray(dtau_q), atol=1e-8)


def test_idsva_symmetries(setup):
    """d2tau/dq2 and d2tau/dqd2 are symmetric in the two derivative axes."""
    model, (q, qd, qdd) = setup
    T = np.asarray(jax.jit(idsva_so)(model, q, qd, qdd))
    np.testing.assert_allclose(T[0], np.swapaxes(T[0], 1, 2), atol=1e-9)
    np.testing.assert_allclose(T[1], np.swapaxes(T[1], 1, 2), atol=1e-9)


@pytest.mark.parametrize("name", ["iiwa", "hyq", "mixed5"])
def test_analytical_idsva_matches_seeded(name):
    """The analytical SVA second-order algorithm == the independent
    JVP-seeded route on serial, branched, and prismatic robots."""
    from gridcodegenerator_tpu.models.model import build_model
    from gridcodegenerator_tpu.models.zoo import load_robot
    from gridcodegenerator_tpu.ops import so as _so

    model = build_model(load_robot(name), dtype=jnp.float64)
    rng = np.random.default_rng(11)
    n = model.n
    q = jnp.asarray(rng.uniform(-1, 1, (n, 3)))
    qd = jnp.asarray(rng.uniform(-1, 1, (n, 3)))
    qdd = jnp.asarray(rng.uniform(-1, 1, (n, 3)))
    A = np.asarray(_so.idsva_so_analytical(model, q, qd, qdd))
    Sd = np.asarray(_so.idsva_so_seeded(model, q, qd, qdd))
    scale = max(1.0, float(np.max(np.abs(Sd))))
    np.testing.assert_allclose(A, Sd, atol=1e-10 * scale)


def test_fdsva_compose_einsum_matches_unrolled():
    """The MXU-einsum contraction form of the implicit-function composition
    (the humanoid-scale composed route, ``kernels.fdsva_so_pallas``) equals
    the Mosaic-unrolled form at 28-DoF shapes."""
    from gridcodegenerator_tpu.ops.so import fdsva_compose

    model = build_model(load_robot("atlas"), dtype=jnp.float64)
    nv, B = model.num_vel, 2
    rng = np.random.default_rng(3)
    T = jnp.asarray(rng.normal(size=(4, nv, nv, nv, B)))
    df_du = jnp.asarray(rng.normal(size=(nv, 2 * nv, B)))
    Mi = jnp.asarray(rng.normal(size=(nv, nv, B)))
    a = np.asarray(fdsva_compose(model, T, df_du, Mi, use_einsum=False))
    b = np.asarray(fdsva_compose(model, T, df_du, Mi, use_einsum=True))
    np.testing.assert_allclose(a, b, atol=1e-12 * np.max(np.abs(a)))


@pytest.mark.skipif(os.environ.get("GRID_SLOW_TESTS") != "1",
                    reason="humanoid-scale second-order compile takes "
                           ">10 min on CPU; set GRID_SLOW_TESTS=1 (verified "
                           "on TPU each round, see BENCH notes)")
def test_analytical_idsva_humanoid_scale():
    """28-DoF (atlas) analytical SVA tensors vs nested jacfwd of plain RNEA
    — the kernel-vs-oracle check at the reference's global-memory-spill
    scale (``_idsva_so.py:1003-1005``)."""
    from gridcodegenerator_tpu.ops import so as _so

    model = build_model(load_robot("atlas"), dtype=jnp.float64)
    n = model.n
    rng = np.random.default_rng(11)
    q, qd, qdd = (jnp.asarray(rng.uniform(-1, 1, (n, 1))) for _ in range(3))
    A = np.asarray(jax.jit(
        lambda a, b, c: _so.idsva_so_analytical(model, a, b, c))(q, qd, qdd))

    def tau(qs, qds, qdds):
        return rnea(model, qs[:, None], qds[:, None], qdds[:, None])[:, 0]

    d2q = np.asarray(jax.jit(
        jax.jacfwd(jax.jacfwd(tau, 0), 0))(q[:, 0], qd[:, 0], qdd[:, 0]))
    scale = max(1.0, float(np.max(np.abs(d2q))))
    np.testing.assert_allclose(A[0, ..., 0], d2q, atol=1e-11 * scale)


def test_idsva_so_form_flag_reaches_both_routes():
    """The explicit ``form`` argument reaches both routes regardless of
    backend (ADVICE r4: the backend sniff at ``so.idsva_so`` was untestable
    under the CPU-forced suite, which let the r4 fdsva_so_pallas regression
    ship). Dense and analytical must agree; the dispatcher default must
    equal one of them."""
    from gridcodegenerator_tpu.ops import so as _so

    rng = np.random.default_rng(5)
    model = build_model(load_robot("iiwa"), dtype=jnp.float64)
    n = model.n
    q, qd, qdd = (jnp.asarray(rng.uniform(-1, 1, (n, 2))) for _ in range(3))
    a = np.asarray(_so.idsva_so(model, q, qd, qdd, form="analytical"))
    d = np.asarray(_so.idsva_so(model, q, qd, qdd, form="dense"))
    default = np.asarray(_so.idsva_so(model, q, qd, qdd))
    np.testing.assert_allclose(d, a, atol=1e-12)
    assert (default == a).all() or (default == d).all()


def test_fdsva_so_pallas_kernel_traces_without_captured_consts(monkeypatch):
    """Regression guard for the r4 flagship break: tracing the MONOLITHIC
    fused FDSVA-SO kernel must not capture array constants, even when the
    backend dispatch would pick the dense (mask-capturing) IDSVA-SO route.

    Pallas raises its "captures constants" error at TRACE time (platform-
    independent), so this is checkable on the CPU suite: force the backend
    sniff to report "tpu" and eval_shape the kernel. At r4 HEAD this raised
    for every 6 <= nv <= 16 robot (VERDICT.md r4)."""
    from gridcodegenerator_tpu.ops import so as _so
    from gridcodegenerator_tpu.ops.pallas import kernels as _pk

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for name in ("iiwa", "hyq"):
        model = build_model(load_robot(name), dtype=jnp.float32)
        n = model.n
        assert _so.SO_DENSE_MIN_NV <= model.num_vel <= _pk.FDSVA_MONO_MAX_NV
        kfn = _pk.fdsva_so_pallas(model, -9.81)
        q = jnp.zeros((n, _pk.SO_BLOCK_B), jnp.float32)
        out = jax.eval_shape(kfn, q, q, q)  # raises on captured consts
        assert out.shape == (4, n, n, n, _pk.SO_BLOCK_B)


def test_idsva_so_dense_matches_analytical():
    """Tensorized (dense masked contractions) IDSVA-SO == unrolled
    analytical route, f64 (iiwa + the branched quadruped)."""
    import jax.numpy as jnp
    import numpy as np

    from gridcodegenerator_tpu.models.model import build_model
    from gridcodegenerator_tpu.models.zoo import load_robot
    from gridcodegenerator_tpu.ops import so as _so

    rng = np.random.default_rng(0)
    for name in ("iiwa", "hyq"):
        model = build_model(load_robot(name), dtype=jnp.float64)
        n = model.n
        q, qd, qdd = (jnp.asarray(rng.uniform(-1, 1, (n, 2)))
                      for _ in range(3))
        a = _so.idsva_so_analytical(model, q, qd, qdd)
        d = _so.idsva_so_dense(model, q, qd, qdd)
        np.testing.assert_allclose(np.asarray(d), np.asarray(a), atol=1e-12)

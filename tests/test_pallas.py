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

B = 512
BLOCK = 256


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

"""Knot-sharded Riccati reduce vs the single-device suffix scan.

Runs on the 8-virtual-device CPU mesh from conftest; the same shard_map
lowers to ICI ppermute rounds on a real slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gridcodegenerator_tpu.ops.linalg import gj_inverse
from gridcodegenerator_tpu.ops.spatial import bmm, bmv
from gridcodegenerator_tpu.parallel.knot_riccati import sharded_lqr_gains
from gridcodegenerator_tpu.trajopt.priccati import suffix_value_functions


def _rand_lqr(N, nx, nu, B, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s))

    def spd(n_):
        X = rng.normal(size=(N, n_, n_, B))
        return jnp.asarray(np.einsum("tijb,tkjb->tikb", X, X)
                           + np.eye(n_)[None, :, :, None])

    return (r(N, nx, nx, B) * 0.5, r(N, nx, nu, B), r(N, nx, B),
            r(N, nu, B), spd(nx), spd(nu), r(N, nu, nx, B) * 0.3,
            r(nx, B), spd(nx)[0])


def _reference_gains(A, Bm, lx, lu, lxx, luu, lux, VxN, VxxN):
    Vx_all, Vxx_all = suffix_value_functions(
        A, Bm, lx, lu, lxx, luu, lux, VxN, VxxN, 0.0)

    def gain_t(A_, Bm_, lu_t, luu_t, lux_t, Vx, Vxx):
        Bt = jnp.swapaxes(Bm_, 0, 1)
        Qu = lu_t + bmv(Bt, Vx)
        Qux = lux_t + bmm(bmm(Bt, Vxx), A_)
        Quu = luu_t + bmm(bmm(Bt, Vxx), Bm_)
        Qi = gj_inverse(Quu)
        return -bmv(Qi, Qu), -bmm(Qi, Qux)

    return jax.vmap(gain_t)(A, Bm, lu, luu, lux, Vx_all[1:], Vxx_all[1:])


def test_knot_sharded_gains_match_single_device():
    args = _rand_lqr(N=32, nx=4, nu=2, B=3)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("kp",))
    ks_s, Ks_s = jax.jit(sharded_lqr_gains(mesh, "kp", reg=0.0))(*args)
    ks_r, Ks_r = _reference_gains(*args)
    np.testing.assert_allclose(np.asarray(ks_s), np.asarray(ks_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Ks_s), np.asarray(Ks_r), atol=1e-9)


def test_knot_sharded_gains_non_power_of_two_mesh():
    """D=3 devices: the ppermute zero-fill path must stay correct."""
    args = _rand_lqr(N=24, nx=3, nu=2, B=2, seed=1)
    mesh = Mesh(np.asarray(jax.devices()[:3]), ("kp",))
    ks_s, Ks_s = jax.jit(sharded_lqr_gains(mesh, "kp", reg=0.0))(*args)
    ks_r, Ks_r = _reference_gains(*args)
    np.testing.assert_allclose(np.asarray(ks_s), np.asarray(ks_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Ks_s), np.asarray(Ks_r), atol=1e-9)


def test_knot_sharded_gains_single_device_mesh():
    args = _rand_lqr(N=8, nx=3, nu=2, B=2, seed=2)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("kp",))
    ks_s, Ks_s = jax.jit(sharded_lqr_gains(mesh, "kp", reg=0.0))(*args)
    ks_r, Ks_r = _reference_gains(*args)
    np.testing.assert_allclose(np.asarray(ks_s), np.asarray(ks_r), atol=1e-9)

"""Chain-structured EE derivatives vs the independent jacfwd-of-FK oracle.

The chain-structured forms (``ops/eepose.py: deepos_chain / d2eepos_chain``)
are the TPU-native redesign of the reference's hand-emitted dXhom/d2Xhom
substitution chains (``/root/reference/algorithms/_eepose_gradient_hessian.py:
400-509,774-983``); the oracle here is whole-FK forward-mode autodiff, a
completely separate derivative route.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.ops import eepose as E


@pytest.mark.parametrize("name", ["iiwa", "hyq", "mixed5"])
def test_chain_matches_jacfwd(name):
    model = build_model(load_robot(name), dtype=jnp.float64)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1.2, 1.2, (model.num_pos, 4)))
    J1 = np.asarray(E.deepos_chain(model, q))
    J2 = np.asarray(E.deepos_jacfwd(model, q))
    np.testing.assert_allclose(J1, J2, atol=1e-12)
    H1 = np.asarray(E.d2eepos_chain(model, q))
    H2 = np.asarray(E.d2eepos_jacfwd(model, q))
    np.testing.assert_allclose(H1, H2, atol=1e-12)
    # Hessian symmetry in the two derivative axes
    np.testing.assert_allclose(H1, np.swapaxes(H1, 1, 2), atol=1e-13)


def test_atlas_hessian_finite_diff():
    """Humanoid scale: the structured Hessian against central differences of
    the structured Jacobian (the jacfwd-of-jacfwd oracle at 28 DoF is
    CI-prohibitive; the structured-vs-jacfwd identity is covered above)."""
    model = build_model(load_robot("atlas"), dtype=jnp.float64)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (model.num_pos, 1)))
    H = np.asarray(E.d2eepos_chain(model, q))[..., 0]
    h = 1e-6
    jac = jax.jit(lambda qq: E.deepos_chain(model, qq))
    for k in [0, 5, 17, 27]:
        dq = jnp.zeros_like(q).at[k].set(h)
        fd = np.asarray((jac(q + dq) - jac(q - dq)) / (2 * h))[..., 0]
        np.testing.assert_allclose(H[:, :, k], fd, atol=5e-7)
    np.testing.assert_allclose(H, np.swapaxes(H, 1, 2), atol=1e-13)

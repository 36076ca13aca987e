"""Lane-major batched small-matrix linear algebra.

The trajopt layer needs (m, m, B) inverses/solves for m = nv or 2*nv. The
reference emits a pivot-free Gauss-Jordan ``invert_matrix``
(``/root/reference/helpers/_lin_alg_helpers.py:1-47``) and relies on SPD
inputs; the same assumption holds here (mass matrices, regularized Quu), so
``gj_inverse`` is an unrolled pivot-free Gauss-Jordan over the trailing
batch — pure elementwise VPU work, Pallas/Mosaic-lowerable, no linalg
custom calls.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import eye_nd, onehot_nd
from .spatial import bmm, bmv


def gj_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Pivot-free Gauss-Jordan inverse of (m, m, *batch) SPD matrices.

    Row-reduces the augmented [A | I] in the natural pivot order (valid for
    SPD inputs — the same assumption as the reference's ``invert_matrix``).
    Fully unrolled over the static m; scatter-free (one-hot row restores).
    Every dim after the first two is batch (the fused sweep kernels use a
    2-D (sublane, lane) batch tile).
    """
    m = A.shape[0]
    dtype = A.dtype
    tz = A[0, 0] * 0.0  # traced zero materializes the identity block
    aug = jnp.concatenate([A, eye_nd(m, dtype, A.ndim) + tz], axis=1)
    oh = onehot_nd  # rank-native iota (Mosaic rejects 2D->ND shape casts)
    for k in range(m):
        piv = 1.0 / aug[k, k]                       # (*batch,)
        row_k = aug[k] * piv                        # (2m, *batch)
        col_k = aug[:, k]                           # (m, *batch)
        # eliminate column k from every row (row k zeroes itself) ...
        aug = aug - col_k[:, None] * row_k[None]
        # ... then restore the normalized pivot row
        aug = aug + oh(k, m, dtype, A.ndim) * row_k[None]
    return aug[:, m:]


def gj_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b: (m, m, B), (m, B) -> (m, B)."""
    return bmv(gj_inverse(A), b)


def gj_solve_mat(A: jnp.ndarray, Bm: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = Bm: (m, m, B), (m, c, B) -> (m, c, B)."""
    return bmm(gj_inverse(A), Bm)

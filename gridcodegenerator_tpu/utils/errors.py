"""Runtime error checking — the ``gpuErrchk`` analog.

The reference wraps every CUDA call in ``gpuErrchk`` and aborts with file/
line context on failure (``/root/reference/GRiDCodeGenerator.py:273-287``).
XLA has no per-call error codes to check; the TPU-native failure modes are
silent NaN/Inf propagation and out-of-range states. This module provides:

* :func:`checked` — wrap any jitted kernel so non-finite outputs raise
  ``FloatingPointError`` with the kernel name and offending output index
  (via ``jax.debug`` on-device check + host callback, zero cost when clean
  under ``jit`` on TPU since the check is a reduction fused into the
  kernel's epilogue);
* :func:`assert_finite` — inline functional guard for use inside jitted
  code (returns its input; errors at call time when leaving jit);
* :func:`check_joint_limits` — validate q against the model's baked limits
  (the runtime use of ``init_joint_limits``,
  ``/root/reference/helpers/_topology_helpers.py:732-778``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def assert_finite(x: jnp.ndarray, name: str = "array") -> jnp.ndarray:
    """Functional guard: returns ``x``; raises on non-finite entries when
    the (jitted) caller's outputs are materialized.

    Error-delivery semantics (mirror of CUDA's async error model, where a
    failed kernel surfaces at the next ``cudaDeviceSynchronize``): on CPU /
    eager paths the ``FloatingPointError`` raises at call time; under ``jit``
    on TPU the callback runs asynchronously, so the error surfaces at the
    next synchronization point — typically wrapped in an
    ``XlaRuntimeError`` whose cause carries this message — not necessarily
    at the offending call site."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))

    def _raise(b):
        if b:
            raise FloatingPointError(
                f"non-finite values in {name} (NaN/Inf propagated through "
                "the kernel — check inputs and integration step)")

    jax.debug.callback(_raise, bad)
    return x


def checked(fn, name: str = None):
    """Wrap ``fn`` so every output is finite-checked (gpuErrchk analog)."""
    label = name or getattr(fn, "__name__", "kernel")

    @functools.wraps(fn)
    def wrapper(*args, **kw):
        out = fn(*args, **kw)
        leaves = jax.tree_util.tree_leaves(out)
        for k, leaf in enumerate(leaves):
            assert_finite(leaf, f"{label} output {k}")
        return out

    return wrapper


def check_joint_limits(model, q, batch_major: bool = True):
    """Host-side check of q against the model's joint limits.

    Returns a boolean numpy array (one per sample) — True where ALL joints
    are within [lower, upper]; unbounded joints (±inf) always pass.
    """
    qn = np.asarray(q)
    if qn.ndim == 1:
        qn = qn[None]
    elif not batch_major:
        qn = qn.T
    lims = np.asarray(model.joint_limits)
    lo, hi = lims[:, 0], lims[:, 1]
    npos = qn.shape[-1]
    if lims.shape[0] != npos:  # floating base: skip the 7 base coordinates
        off = npos - lims.shape[0]
        qn = qn[:, off:]
    return np.all((qn >= lo) & (qn <= hi), axis=-1)

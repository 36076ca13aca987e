"""Kernel timing harness — the reference's ``_single_timing`` analog.

The reference benchmarks by re-running the inner compute NUM_TIMESTEPS times
inside one kernel launch and bracketing with CLOCK_MONOTONIC
(``/root/reference/algorithms/_inverse_dynamics.py:424-437,499-511``). The
TPU equivalent must likewise amortize dispatch (the remote-device RTT is
milliseconds): ``repeat_inside_jit`` chains K dependent evaluations of the
kernel inside a single jitted scan, so the measured wall time is K x device
compute + one dispatch.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def repeat_inside_jit(fn: Callable, args: Sequence, iters: int) -> Callable:
    """Build a jitted callable evaluating ``fn(*args)`` ``iters`` times with a
    forced data dependency between iterations (no DCE, no overlap-free
    re-dispatch). Returns f() -> last output."""

    def body(carry, _):
        # perturb the first argument by a value that is numerically zero but
        # data-dependent on the previous output, forcing serialization
        out = fn(carry, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        eps = (leaf.ravel()[0] * 0.0).astype(args[0].dtype)
        return args[0] + eps, out

    @jax.jit
    def run():
        _, outs = jax.lax.scan(body, args[0], None, length=iters)
        return jax.tree.map(lambda o: o[-1], outs)

    return run


def time_kernel(fn: Callable, args: Sequence, iters: int = 50,
                warmup: bool = True) -> float:
    """Median-of-3 per-evaluation seconds for ``fn(*args)``."""
    run = repeat_inside_jit(fn, args, iters)
    if warmup:
        jax.block_until_ready(run())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[1]

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
    re-dispatch). Returns f() -> last output.

    The output rides in the scan CARRY (overwritten each iteration), never
    a stacked ys: stacking would materialize iters x output in HBM — 72 GB
    for a 28-DoF second-order tensor suite at B=1024, an instant OOM.
    """
    out_shape = jax.eval_shape(lambda: fn(*args))
    out0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), out_shape)

    def body(carry, _):
        x0, _prev = carry
        # perturb the first argument by a value that is numerically zero but
        # data-dependent on the previous output, forcing serialization
        out = fn(x0, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        eps = (leaf.ravel()[0] * 0.0).astype(args[0].dtype)
        return (args[0] + eps, out), None

    @jax.jit
    def run():
        (_, out), _ = jax.lax.scan(body, (args[0], out0), None, length=iters)
        return out

    return run


def time_kernel(fn: Callable, args: Sequence, iters: int = 50,
                warmup: bool = True) -> float:
    """Median-of-3 per-evaluation seconds for ``fn(*args)``.

    DIFFERENTIAL measurement: every program launch through the remote
    tunnel carries a fixed ~20 ms dispatch cost that a single
    divide-by-iters cannot remove (at iters=200 it inflates a 5 us kernel
    to ~105 us). Timing the K-iteration and 4K-iteration programs and
    taking (T_4K - T_K) / 3K cancels the offset exactly — the
    ``_single_timing`` harness with the launch latency subtracted out.
    """
    run_k = repeat_inside_jit(fn, args, iters)
    run_4k = repeat_inside_jit(fn, args, 4 * iters)
    if warmup:
        jax.block_until_ready(run_k())
        jax.block_until_ready(run_4k())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run_k())
        t1 = time.perf_counter()
        jax.block_until_ready(run_4k())
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (3 * iters))
    ts.sort()
    return max(ts[1], 1e-9)

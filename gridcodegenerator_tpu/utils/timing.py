"""Kernel timing harness — the reference's ``_single_timing`` analog.

The reference benchmarks by re-running the inner compute NUM_TIMESTEPS times
inside one kernel launch and bracketing with CLOCK_MONOTONIC
(``/root/reference/algorithms/_inverse_dynamics.py:424-437,499-511``). The
TPU equivalent must likewise amortize dispatch (the remote-device RTT is
milliseconds): ``repeat_inside_jit`` chains K dependent evaluations of the
kernel inside a single jitted loop, so the measured wall time is K x device
compute + one dispatch.

The iteration count is a TRACED scalar (``lax.fori_loop`` with a dynamic
bound): the K- and 4K-iteration programs of the differential measurement are
one compiled executable, halving compile count per measurement and making
adaptive escalation (re-measuring a too-fast kernel at 8x the iterations)
free of recompiles.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp


def repeat_inside_jit(fn: Callable, args: Sequence) -> Callable:
    """Build a jitted callable evaluating ``fn(*args)`` ``n`` times (``n`` a
    runtime scalar) with a forced data dependency between iterations (no DCE,
    no overlap-free re-dispatch). Returns f(n) -> last output.

    The output rides in the loop CARRY (overwritten each iteration), never
    a stacked ys: stacking would materialize iters x output in HBM — 72 GB
    for a 28-DoF second-order tensor suite at B=1024, an instant OOM.
    """
    out_shape = jax.eval_shape(lambda: fn(*args))
    out0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), out_shape)

    @jax.jit
    def run(n, *a):
        # args ride as device INPUTS, never closure constants: constants
        # bake into the program (remote-compile bodies >100 MB get
        # rejected) and let XLA pre-layout what a real caller would pass
        def body(_i, carry):
            x0, _prev = carry
            # perturb the first argument by a value that is numerically
            # invisible (|eps| <= |leaf|*1e-30 rounds away in the f32 add)
            # but data-dependent on the previous output, forcing
            # serialization. NOT "* 0.0": XLA's algebraic simplifier may
            # fold that to a constant, hoisting fn out of the loop — the
            # whole measurement then times an empty loop (the 0.0-us rows).
            out = fn(x0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            eps = (leaf.ravel()[0] * 1e-30).astype(a[0].dtype)
            return (a[0] + eps, out)

        _, out = jax.lax.fori_loop(0, n, body, (a[0], out0))
        return out

    return lambda n: run(n, *args)


class TimingResult(NamedTuple):
    seconds: float          # median per-evaluation seconds (>= 0)
    below_resolution: bool  # True when (T_4K - T_K) never cleared the noise
    iters: int              # the (possibly escalated) K actually used


def time_kernel_ex(fn: Callable, args: Sequence, iters: int = 50,
                   warmup: bool = True, min_delta_s: float = 2e-2,
                   max_iters: int = 200_000) -> TimingResult:
    """Median-of-3 per-evaluation seconds for ``fn(*args)``.

    DIFFERENTIAL measurement: every program launch through the remote
    tunnel carries a fixed ~20 ms dispatch cost that a single
    divide-by-iters cannot remove (at iters=200 it inflates a 5 us kernel
    to ~105 us). Timing the K-iteration and 4K-iteration programs and
    taking (T_4K - T_K) / 3K cancels the offset exactly — the
    ``_single_timing`` harness with the launch latency subtracted out.

    When the raw delta is below ``min_delta_s`` (kernel too fast for the
    launch jitter at this K), K escalates 8x — same compiled program, the
    trip count is traced — until the delta is resolvable or ``max_iters``
    is hit; a still-unresolvable measurement is flagged
    ``below_resolution`` instead of publishing a floor-clamped number
    (a batched kernel does not take 0.0 us).

    ``min_delta_s`` must DOMINATE the launch jitter, not just the timer
    resolution: the remote-tunnel dispatch is ~20-30 ms with ±10% jitter,
    so a 2 ms threshold accepts deltas that are pure noise (measured: ABA
    at K=50 gave delta ≈ 2.6 ms ≥ 2 ms from jitter alone, then median 0).
    Default 20 ms ≈ one launch time forces K up until the kernel term is
    ~10x the jitter.
    """
    run = repeat_inside_jit(fn, args)
    if warmup:  # one call compiles; the trip count is traced, so K == 4K
        jax.block_until_ready(run(jnp.int32(iters)))

    def measure_once(k):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(k)))
        t1 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(4 * k)))
        t2 = time.perf_counter()
        return (t2 - t1) - (t1 - t0)

    # escalate K until one probe delta clears the noise floor
    while True:
        delta = measure_once(iters)
        if delta >= min_delta_s or iters * 8 > max_iters:
            break
        iters *= 8

    deltas = sorted([delta] + [measure_once(iters) for _ in range(2)])
    med = deltas[1] / (3 * iters)
    below = deltas[1] < min_delta_s
    return TimingResult(max(med, 0.0), below, iters)


def time_kernel(fn: Callable, args: Sequence, iters: int = 50,
                warmup: bool = True) -> float:
    """Back-compat wrapper: per-evaluation seconds (see time_kernel_ex)."""
    return max(time_kernel_ex(fn, args, iters, warmup).seconds, 1e-9)

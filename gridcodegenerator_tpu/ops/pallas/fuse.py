"""Pallas kernel fusion: run a whole lane-major algorithm in one VMEM tile.

This is the TPU-native analog of the reference's ``_kernel`` tier
(``/root/reference/helpers/_code_generation_helpers.py:41-55`` block-level
loop + shared-memory scratch): the trailing batch axis is tiled into VMEM
blocks, one grid step per tile, and the *entire* algorithm (which the XLA
path executes as dozens of fused-but-HBM-bounded kernels) runs register/VMEM
resident — HBM traffic collapses to inputs + outputs exactly like the
reference's one-kernel-launch-per-algorithm design collapses global-memory
traffic to the ``gridData`` buffers.

The kernel body is the SAME traced jnp code as the XLA path (`ops/*` is
written einsum-free so Mosaic lowers it); fusion is therefore a pure wrapper,
and correctness is inherited from the already-oracle-validated builders.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 256


def _specs(shapes: Sequence[Tuple[int, ...]], block_b: int):
    """shapes are the per-sample (batch-stripped) shapes; the stored arrays
    are ``shape + (B,)`` and are tiled only along the trailing batch axis."""
    specs = []
    for shp in shapes:
        block = tuple(shp) + (block_b,)
        nlead = len(shp)

        def imap(i, _nlead=nlead):
            return (0,) * _nlead + (i,)

        specs.append(pl.BlockSpec(block, imap, memory_space=pltpu.VMEM))
    return specs


SUB2D = 8      # sublane rows of a 2-D batch tile (fills (8,128) f32 vregs)
LANE = 128


def _specs2d(shapes: Sequence[Tuple[int, ...]]):
    """Per-sample shapes stored as ``shape + (G, LANE)``; tiled to
    ``shape + (SUB2D, LANE)`` blocks along the G axis."""
    specs = []
    for shp in shapes:
        nlead = len(shp)

        def imap(i, _nlead=nlead):
            return (0,) * _nlead + (i, 0)

        specs.append(pl.BlockSpec(tuple(shp) + (SUB2D, LANE), imap,
                                  memory_space=pltpu.VMEM))
    return specs


def fuse_batched(
    fn: Callable,
    in_shapes: Sequence[Tuple[int, ...]],
    out_shapes: Sequence[Tuple[int, ...]],
    consts: Sequence[jnp.ndarray] = (),
    dtype=jnp.float32,
    block_b: int = DEFAULT_BLOCK_B,
    interpret: bool = False,
    vmem_limit_bytes: int | None = None,
    batch2d: bool = False,
) -> Callable:
    """Build a fused batched callable from a lane-major algorithm.

    ``fn(*consts, *arrays)`` maps inputs of shape ``in_shapes[k] + (Bt,)`` to
    a tuple of outputs of shape ``out_shapes[k] + (Bt,)``. ``consts`` are
    robot-model constants (inertias, tree transforms) resident in VMEM for
    every grid step — the analog of the reference's per-block XImats
    shared-memory copy (``_topology_helpers.py:155-331``). The returned
    callable takes full ``(..., B)`` arrays with B a multiple of ``block_b``
    and tiles the batch over a 1-D grid.

    ``batch2d``: when set and B divides into (8, 128) tiles, the batch axis
    is reshaped to a 2-D (sublane, lane) tile per grid step, so every
    elementwise op in the algorithm fills full (8, 128) f32 vregs. The flat
    layout pads the small structural leading dims (6-vectors, n-rows) into
    the 8-sublane dimension at 75%/87.5% fill — measured r5, this is the
    difference between the kernel table's flat tiers and the 2-D Riccati
    sweeps. Algorithms must be batch-rank agnostic (all of ``ops/*`` are).
    Calls whose B does not tile fall back to the flat layout.
    """
    in_shapes = [tuple(s) for s in in_shapes]
    out_shapes = [tuple(s) for s in out_shapes]
    consts = tuple(consts)
    n_const = len(consts)

    # constant specs: whole array every grid step
    const_specs = []
    for c in consts:
        nd = c.ndim

        def imap(i, _nd=nd):
            return (0,) * _nd

        const_specs.append(
            pl.BlockSpec(c.shape, imap, memory_space=pltpu.VMEM))

    def kernel(*refs):
        cvals = [r[...] for r in refs[:n_const]]
        ins = [r[...] for r in refs[n_const:n_const + len(in_shapes)]]
        outs = refs[n_const + len(in_shapes):]
        vals = fn(*cvals, *ins)
        if not isinstance(vals, (tuple, list)):
            vals = (vals,)
        assert len(vals) == len(outs), (len(vals), len(outs))
        for o_ref, v in zip(outs, vals):
            o_ref[...] = v

    def call(*arrays):
        B = arrays[0].shape[-1]
        params = {}
        if vmem_limit_bytes is not None:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes)
        if batch2d and not interpret and B % (SUB2D * LANE) == 0:
            G = B // LANE
            r2 = lambda z: z.reshape(z.shape[:-1] + (G, LANE))
            out = pl.pallas_call(
                kernel,
                grid=(G // SUB2D,),
                in_specs=const_specs + _specs2d(in_shapes),
                out_specs=tuple(_specs2d(out_shapes)),
                out_shape=tuple(
                    jax.ShapeDtypeStruct(s + (G, LANE), dtype)
                    for s in out_shapes),
                interpret=interpret,
                **params,
            )(*consts, *map(r2, arrays))
            flat = lambda z: z.reshape(z.shape[:-2] + (B,))
            if len(out_shapes) > 1:
                return tuple(flat(o) for o in out)
            return flat(out[0])
        assert B % block_b == 0, (B, block_b)
        out = pl.pallas_call(
            kernel,
            grid=(B // block_b,),
            in_specs=const_specs + _specs(in_shapes, block_b),
            out_specs=tuple(_specs(out_shapes, block_b)),
            out_shape=tuple(
                jax.ShapeDtypeStruct(s + (B,), dtype) for s in out_shapes),
            interpret=interpret,
            **params,
        )(*consts, *arrays)
        return out if len(out_shapes) > 1 else out[0]

    return call


def pad_to_block(x: jnp.ndarray, block_b: int) -> Tuple[jnp.ndarray, int]:
    """Pad the trailing batch axis up to a multiple of block_b."""
    B = x.shape[-1]
    rem = (-B) % block_b
    if rem == 0:
        return x, B
    pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
    return jnp.pad(x, pad), B

"""Pallas TPU kernel: in-VMEM bitonic block sort (SURVEY.md §2.4 T1).

Why: k-mer counting and the graph-build join are sort-bound, and XLA's
comparator sort on TPU measures ~1.2-1.5 T elementary-ops/s — it is
VPU-bound, so the lever is fewer ops per key, not bandwidth (BENCH.md).
This kernel sorts VMEM-resident blocks with a hand-unrolled bitonic
network: partners are materialized with two vector rolls + select, the
compare-exchange is a handful of VPU ops, and key/payload word counts are
exactly what the call site needs (lax.sort always drags every operand
through its generic comparator).

Layout: each block of `block` elements is viewed as (block/128, 128)
(sublanes x lanes); network distance j is a lane roll for j < 128 and a
sublane roll for j >= 128. One grid step sorts one block; blocks are
independent (ascending), so this is a drop-in for batched row sort.

Falls back to interpret mode off-TPU (CI runs on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _partner(x, j: int):
    """x[i ^ j] over the (R, 128) block view, for power-of-two j."""
    if j < LANES:
        c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        bit = (c & j) != 0
        return jnp.where(bit, pltpu.roll(x, j, 1),
                         pltpu.roll(x, LANES - j, 1))
    js = j // LANES
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    bit = (r & js) != 0
    return jnp.where(bit, pltpu.roll(x, js, 0),
                     pltpu.roll(x, x.shape[0] - js, 0))


def _idx_bit(shape, m: int):
    """(global_element_index & m) != 0 as a bool mask over the block view."""
    if m < LANES:
        c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (c & m) != 0
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (r & (m // LANES)) != 0


def _stage(xs, num_keys: int, j: int, kk: int):
    """One compare-exchange stage: distance j, phase width kk."""
    ps = [_partner(x, j) for x in xs]
    gt = xs[0] > ps[0]
    eq = xs[0] == ps[0]
    for w in range(1, num_keys):
        gt = gt | (eq & (xs[w] > ps[w]))
        eq = eq & (xs[w] == ps[w])
    # pure boolean algebra: Mosaic rejects select/compare on i1 vectors
    flip = _idx_bit(xs[0].shape, kk) ^ _idx_bit(xs[0].shape, j)
    take_partner = (~flip & gt) | (flip & ~gt & ~eq)
    return [jnp.where(take_partner, p, x) for x, p in zip(xs, ps)]


def _sort_kernel(num_keys: int, block: int, refs):
    n_arr = len(refs) // 2
    ins, outs = refs[:n_arr], refs[n_arr:]
    xs = [r[...] for r in ins]
    kk = 2
    while kk <= block:
        j = kk // 2
        while j >= 1:
            xs = _stage(xs, num_keys, j, kk)
            j //= 2
        kk *= 2
    for o, x in zip(outs, xs):
        o[...] = x


@functools.partial(jax.jit,
                   static_argnames=("num_keys", "block", "interpret"))
def sort_blocks(arrays, num_keys: int, block: int, interpret: bool = False):
    """Sort each contiguous `block`-element run of the input ascending.

    arrays: tuple of same-length 1-D uint32 arrays; length % block == 0,
    block a power of two >= 256. Lexicographic on the first num_keys
    arrays; the rest are carried payload. Equal keys keep no particular
    order (the counting/join consumers only need equal-keys-adjacent).
    Returns the sorted tuple.
    """
    assert block >= 2 * LANES and (block & (block - 1)) == 0, block
    n = arrays[0].shape[0]
    assert n % block == 0, (n, block)
    nblocks = n // block
    rows = block // LANES

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
                  for _ in arrays],
        out_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in arrays],
    )
    out = pl.pallas_call(
        lambda *refs: _sort_kernel(num_keys, block, refs),
        out_shape=[jax.ShapeDtypeStruct((nblocks * rows, LANES), a.dtype)
                   for a in arrays],
        grid_spec=grid_spec,
        interpret=interpret,
    )(*[a.reshape(nblocks * rows, LANES) for a in arrays])
    return tuple(o.reshape(-1) for o in out)


def sort_blocks_auto(arrays, num_keys: int, block: int):
    """Interpret-mode fallback off TPU (CI runs on CPU)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return sort_blocks(tuple(arrays), num_keys, block, interpret=not on_tpu)


def _merge_kernel(num_keys: int, block: int, refs):
    """Halving-only network: sorts a block that is already BITONIC —
    the in-VMEM tail (distances block/2 .. 1) of one merge level, fused
    into a single HBM trip instead of log2(block) XLA stages."""
    n_arr = len(refs) // 2
    ins, outs = refs[:n_arr], refs[n_arr:]
    xs = [r[...] for r in ins]
    j = block // 2
    while j >= 1:
        xs = _stage(xs, num_keys, j, block)
        j //= 2
    for o, x in zip(outs, xs):
        o[...] = x


@functools.partial(jax.jit,
                   static_argnames=("num_keys", "block", "interpret"))
def merge_blocks(arrays, num_keys: int, block: int, interpret: bool = False):
    """Sort each `block`-run ascending, assuming each run is bitonic
    (e.g. after the cross-block stages of a merge level). Same contract
    as sort_blocks otherwise."""
    assert block >= 2 * LANES and (block & (block - 1)) == 0, block
    n = arrays[0].shape[0]
    assert n % block == 0, (n, block)
    nblocks = n // block
    rows = block // LANES

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
                  for _ in arrays],
        out_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in arrays],
    )
    out = pl.pallas_call(
        lambda *refs: _merge_kernel(num_keys, block, refs),
        out_shape=[jax.ShapeDtypeStruct((nblocks * rows, LANES), a.dtype)
                   for a in arrays],
        grid_spec=grid_spec,
        interpret=interpret,
    )(*[a.reshape(nblocks * rows, LANES) for a in arrays])
    return tuple(o.reshape(-1) for o in out)

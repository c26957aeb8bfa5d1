"""Pallas TPU kernel: streaming digit histogram (SURVEY.md §2.4 T1).

Proof-of-concept for the hand-rolled radix-sort pipeline (BENCH.md): the
histogram phase of a radix pass, written as a Pallas kernel that streams
key tiles HBM -> VMEM and bins a digit per element. XLA's equivalent
(segment_sum scatter-add) measures ~130 M elem/s on v5e — far off HBM
bandwidth; this kernel bounds what a hand-scheduled pass achieves and is
the first stage of the future in-kernel partition.

Grid: one program per tile of TILE keys; each program histograms its tile
into its own output row (no cross-tile races); caller sums rows.
Falls back to interpret mode off-TPU (CI runs it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 256  # tile = TILE_ROWS x 128 elements
LANES = 128


def _hist_kernel(nbits: int, shift: int, hi_ref, lo_ref, out_ref):
    """One tile: bin digit = (key >> shift) & (2^nbits - 1) into out row."""
    nbins = 1 << nbits
    if shift >= 32:
        digits = (hi_ref[:] >> jnp.uint32(shift - 32)) & jnp.uint32(nbins - 1)
    elif shift + nbits <= 32:
        digits = (lo_ref[:] >> jnp.uint32(shift)) & jnp.uint32(nbins - 1)
    else:  # digit straddles the word boundary
        low_part = lo_ref[:] >> jnp.uint32(shift)
        high_part = hi_ref[:] << jnp.uint32(32 - shift)
        digits = (low_part | high_part) & jnp.uint32(nbins - 1)

    def body(d, _):
        cnt = jnp.sum((digits == d).astype(jnp.int32))
        out_ref[0, d] = cnt
        return 0

    jax.lax.fori_loop(0, nbins, body, 0)


@functools.partial(jax.jit, static_argnames=("nbits", "shift", "interpret"))
def digit_histogram(hi: jax.Array, lo: jax.Array, nbits: int = 8,
                    shift: int = 0, interpret: bool = False) -> jax.Array:
    """Histogram of (key >> shift) & (2^nbits - 1) over the key stream.

    hi/lo: uint32 pair stream, length a multiple of TILE_ROWS*128 (pad
    with sentinels; they land in the top bin like any other key).
    Returns int32[2^nbits].
    """
    n = hi.shape[0]
    tile = TILE_ROWS * LANES
    assert n % tile == 0, f"stream length {n} must be a multiple of {tile}"
    t = n // tile
    nbins = 1 << nbits

    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nbins), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    per_tile = pl.pallas_call(
        functools.partial(_hist_kernel, nbits, shift),
        out_shape=jax.ShapeDtypeStruct((t, nbins), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(hi.reshape(t * TILE_ROWS, LANES), lo.reshape(t * TILE_ROWS, LANES))
    return per_tile.sum(axis=0)


def digit_histogram_auto(hi, lo, nbits=8, shift=0):
    """Interpret-mode fallback off TPU (CI runs on CPU)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return digit_histogram(hi, lo, nbits, shift, interpret=not on_tpu)

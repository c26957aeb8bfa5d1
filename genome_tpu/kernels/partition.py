"""Pallas TPU kernel: B-way stable stream partition (SURVEY.md §2.4 K3).

The missing radix/partition primitive behind the counting headline
(BASELINE.json:2). TPU has no vector scatter, so an LSD radix sort at HBM
bandwidth is inexpressible — but a *partition pass* is: group each row of
the stream by bucket id (one cheap row sort on the short bucket key),
then move every (row, bucket) segment into its bucket's region with
chunk-aligned DMA appends spliced through per-bucket VMEM carry buffers
(the kernels/compact.py machinery generalized from 1 output cursor to B).
The HBM cursor of every bucket only ever advances in 1024-element chunks,
so all DMAs stay (8,128)-tile aligned; the sub-chunk remainder of each
bucket rides in its VMEM carry slot across the sequential grid.

Status: PARKED off the production path. The assembled partition counter
(row-sort by bucket -> this mover -> per-bucket single-word sorts -> RLE)
was measured BREAK-EVEN at best against the global 2-key lax.sort
(BENCH.md "Partition counter: measured post-mortem": phase A + mover +
phase C + boundary overhead ~ 440-520 ms vs 471 ms at 88M windows), so
the sort counter remains the default and only advertised fast path. The
kernel stays correctness-tested (tests/test_partition.py, interpret +
real-Mosaic lanes) as the general B-way partition primitive.

Grid is sequential over rows; per-bucket write cursors are *stateless*:
row r's cursor for bucket b is derived from the precomputed exclusive
prefix `rel[r, b]` (elements of b emitted by rows < r), so the kernel
carries no cross-row scalar state beyond the carry buffers themselves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genome_tpu.kernels.compact import _flat_roll_up_dyn

LANES = 128
CROWS = 8                    # one (8,128) uint32 tile = DMA granularity
CHUNK = CROWS * LANES        # 1024: per-bucket HBM cursor granularity
CARRY_ROWS = 2 * CROWS       # per-bucket carry staging: 2 chunks
PIECE = CHUNK                # max elements spliced per inner iteration

I32 = jnp.int32
U32 = jnp.uint32


def _move_kernel(n_block_rows: int, cap_rows: int,
                 seg_ref, rel_ref, rem_ref, out_ref, carry_ref, sem):
    """One grid step = one row of the (row-grouped) stream.

    seg_ref: SMEM (1, 1, B+1) — per-row bucket segment starts (sorted row).
    rel_ref: SMEM (1, 1, B)   — exclusive per-bucket totals from prior rows.
    rem_ref: VMEM (n_block_rows, 128) — this row's payload, grouped by
      bucket (ascending bucket id).
    out_ref: ANY/HBM (B * cap_rows, LANES) — bucket b owns rows
      [b*cap_rows, (b+1)*cap_rows).
    carry_ref: VMEM (B * CARRY_ROWS, LANES) persistent across the grid.
    sid: VMEM (CARRY_ROWS, LANES) int32 flat-index iota (constant input).
    """
    B = rel_ref.shape[-1]
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    span = CARRY_ROWS * LANES
    shape = (CARRY_ROWS, LANES)
    idx = (jax.lax.broadcasted_iota(I32, shape, 0) * LANES
           + jax.lax.broadcasted_iota(I32, shape, 1))
    max_chunk = cap_rows // CROWS - 1

    def bucket_body(b, _):
        s = seg_ref[0, 0, b]
        e = seg_ref[0, 0, b + 1]
        before = rel_ref[0, 0, b]
        crow = pl.multiple_of(b * CARRY_ROWS, CARRY_ROWS)

        def flush(chunkpos):
            # clamp: an overflowing bucket writes garbage in-bounds (the
            # caller's overflow flag forces a retry), never out of bounds
            safe = jnp.minimum(chunkpos, max_chunk)
            dst = pl.multiple_of(b * cap_rows + safe * CROWS, CROWS)
            cp = pltpu.make_async_copy(
                carry_ref.at[pl.ds(crow, CROWS), :],
                out_ref.at[pl.ds(dst, CROWS), :],
                sem)
            cp.start()
            cp.wait()

        def piece_body(state):
            off, fill, chunkpos = state
            src = s + off
            plen = jnp.minimum(PIECE, e - src)
            # aligned (CARRY_ROWS,128) window of the row block covering the
            # piece; clamp so the window never runs off the block's end
            arow = jnp.minimum((src // LANES) & ~(CROWS - 1),
                               n_block_rows - CARRY_ROWS)
            inb = rem_ref[pl.ds(pl.multiple_of(arow, CROWS), CARRY_ROWS), :]
            # place inb[src - arow*128 ..] at carry position fill: one
            # fused rotate by (fill - offset) mod span
            offset = src - arow * LANES
            placed = _flat_roll_up_dyn(inb, (span + fill - offset) % span)
            car = carry_ref[pl.ds(crow, CARRY_ROWS), :]
            merged = jnp.where((idx >= fill) & (idx < fill + plen),
                               placed, car)
            carry_ref[pl.ds(crow, CARRY_ROWS), :] = merged
            new_fill = fill + plen

            @pl.when(new_fill >= CHUNK)
            def _():
                flush(chunkpos)
                # slide the second chunk down into the flushed slot
                blk = carry_ref[pl.ds(crow + CROWS, CROWS), :]
                carry_ref[pl.ds(crow, CROWS), :] = blk

            did = (new_fill >= CHUNK).astype(I32)
            return (off + plen, new_fill - did * CHUNK, chunkpos + did)

        def piece_cond(state):
            off, _, _ = state
            return s + off < e

        fill0 = before & (CHUNK - 1)
        chunk0 = before >> 10  # CHUNK == 1024
        off, fill, chunkpos = jax.lax.while_loop(
            piece_cond, piece_body, (jnp.int32(0), fill0, chunk0))

        # last grid step: flush each bucket's residual (garbage tail within
        # the chunk is masked by the caller against the true bucket totals)
        @pl.when((t == nt - 1) & (fill > 0))
        def _():
            flush(chunkpos)

        return 0

    jax.lax.fori_loop(0, B, bucket_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("num_buckets", "bucket_cap", "row_len",
                                    "interpret"))
def partition_by_bucket(bid, rem, num_buckets: int, bucket_cap: int,
                        row_len: int = 262144, interpret: bool = False):
    """Stable B-way partition of (bid, rem) pairs into per-bucket regions.

    Args:
      bid: int32/uint32 (n,) bucket ids in [0, num_buckets).
      rem: uint32 (n,) payload moved to out[bid]. n % row_len == 0.
      bucket_cap: per-bucket region size (% CHUNK == 0). Overflow is
        reported when any bucket's total exceeds bucket_cap - CHUNK
        (the final flush writes whole chunks).

    Returns (out [num_buckets, bucket_cap] uint32, totals [num_buckets]
    int32, overflow bool). out[b, j] for j >= totals[b] is garbage —
    mask downstream. Within a bucket, elements keep stream order per row
    and ascending row order (stable in the row-major sense).
    """
    n = bid.shape[0]
    B = num_buckets
    assert n % row_len == 0 and row_len % (CROWS * LANES) == 0, (n, row_len)
    assert bucket_cap % CHUNK == 0, bucket_cap
    R = n // row_len

    sb, sr = jax.lax.sort((bid.astype(U32).reshape(R, row_len),
                           rem.reshape(R, row_len)),
                          dimension=1, num_keys=1)
    qs = jnp.arange(B + 1, dtype=U32)
    seg = jax.vmap(lambda row: jnp.searchsorted(row, qs, side="left"))(sb)
    seg = seg.astype(I32)
    lens = seg[:, 1:] - seg[:, :-1]                     # [R, B]
    rel = jnp.cumsum(lens, axis=0, dtype=I32) - lens    # exclusive by row
    totals = rel[-1] + lens[-1]
    overflow = (totals > bucket_cap - CHUNK).any()

    n_block_rows = row_len // LANES
    cap_rows = bucket_cap // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, B + 1), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, B), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_block_rows, LANES), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((B * CARRY_ROWS, LANES), U32),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        functools.partial(_move_kernel, n_block_rows, cap_rows),
        out_shape=jax.ShapeDtypeStruct((B * cap_rows, LANES), U32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg.reshape(R, 1, B + 1), rel.reshape(R, 1, B),
      sr.reshape(R * n_block_rows, LANES))
    return out.reshape(B, bucket_cap), totals, overflow


def partition_by_bucket_auto(bid, rem, num_buckets: int, bucket_cap: int,
                             row_len: int = 262144):
    """Interpret-mode fallback off TPU (CI runs on CPU)."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return partition_by_bucket(bid, rem, num_buckets, bucket_cap,
                               row_len=row_len, interpret=not on_tpu)

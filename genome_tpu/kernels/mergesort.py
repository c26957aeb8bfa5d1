"""Global 2-key merge sort: Pallas block sort + bitonic merge levels.

XLA's comparator sort (lax.sort) is the 490 ms wall of the counting
headline. This sorter spends the same O(n log^2 n) compare-exchange
stages but schedules them TPU-shaped:

- block sort: the in-VMEM Pallas bitonic (kernels/bitonic.py) sorts
  `block`-element runs with exactly the key/payload words needed;
- merge levels: runs merge pairwise. Each level is one XLA "mirror"
  stage (the half-cleaner pairing i <-> 2L-1-i, expressed as a reshape +
  reverse + select — elementwise, HBM-bound), then XLA halving stages at
  cross-block distances, then ONE Pallas pass fusing all log2(block)
  in-block halving stages into a single HBM trip (merge_blocks).
- non-power-of-two block counts pad with sentinel (0xFFFFFFFF) blocks,
  but every level only touches the prefix of runs containing real data,
  so padding costs at most the final level's roundup.

Sentinel rows sort to the end exactly like lax.sort on the counting
stream (canonical k-mers never equal the sentinel, kernels/count.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32 = jnp.uint32
_SENT = jnp.uint32(0xFFFFFFFF)


def _lex_gt(xa, xb, ya, yb):
    return (xa > ya) | ((xa == ya) & (xb > yb))


def _mirror(a, b, L: int):
    """Half-cleaner over each 2L run: pair i <-> 2L-1-i, mins to the
    first half (order kept), maxs to the second half (order kept)."""
    a2 = a.reshape(-1, 2, L)
    b2 = b.reshape(-1, 2, L)
    xa, xb = a2[:, 0], b2[:, 0]
    ya, yb = a2[:, 1, ::-1], b2[:, 1, ::-1]
    gt = _lex_gt(xa, xb, ya, yb)
    la = jnp.where(gt, ya, xa)
    lb = jnp.where(gt, yb, xb)
    ha = jnp.where(gt, xa, ya)
    hb = jnp.where(gt, xb, yb)
    a3 = jnp.stack([la, ha[:, ::-1]], axis=1).reshape(-1)
    b3 = jnp.stack([lb, hb[:, ::-1]], axis=1).reshape(-1)
    return a3, b3


def _halve(a, b, d: int):
    """Bitonic halving stage at distance d over every 2d segment."""
    a2 = a.reshape(-1, 2, d)
    b2 = b.reshape(-1, 2, d)
    xa, xb = a2[:, 0], b2[:, 0]
    ya, yb = a2[:, 1], b2[:, 1]
    gt = _lex_gt(xa, xb, ya, yb)
    a3 = jnp.stack([jnp.where(gt, ya, xa), jnp.where(gt, xa, ya)],
                   axis=1).reshape(-1)
    b3 = jnp.stack([jnp.where(gt, yb, xb), jnp.where(gt, xb, yb)],
                   axis=1).reshape(-1)
    return a3, b3


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def sort_pairs_merge(hi, lo, block: int = 65536, interpret: bool = False):
    """Full ascending lex sort of the (hi, lo) u32 pair stream.

    Requirements: n % block == 0 (count path pads with SENTINEL anyway).
    Equal keys keep no particular order (same contract as the counting
    sorter hook). Returns (hi_sorted, lo_sorted).
    """
    from genome_tpu.kernels.bitonic import merge_blocks, sort_blocks

    n = hi.shape[0]
    assert n % block == 0, (n, block)
    nb = n // block
    nbp = 1 << max(0, (nb - 1).bit_length())
    if nbp != nb:
        pad = (nbp - nb) * block
        hi = jnp.concatenate([hi, jnp.full((pad,), _SENT)])
        lo = jnp.concatenate([lo, jnp.full((pad,), _SENT)])

    # block sort only the real prefix; the sentinel tail is constant
    sh, sl = sort_blocks((hi[: nb * block], lo[: nb * block]), 2, block,
                         interpret=interpret)
    hi = jnp.concatenate([sh, hi[nb * block :]])
    lo = jnp.concatenate([sl, lo[nb * block :]])

    L = block
    while L < nbp * block:
        runs2 = -(-nb * block // (2 * L))  # 2L-runs holding real data
        active = runs2 * 2 * L
        a, b = hi[:active], lo[:active]
        a, b = _mirror(a, b, L)
        d = L // 2
        while d >= block:
            a, b = _halve(a, b, d)
            d //= 2
        a, b = merge_blocks((a, b), 2, block, interpret=interpret)
        hi = jnp.concatenate([a, hi[active:]]) if active < hi.shape[0] else a
        lo = jnp.concatenate([b, lo[active:]]) if active < lo.shape[0] else b
        L *= 2
    return hi[:n], lo[:n]

"""T2: de Bruijn graph construction on device (SURVEY.md §2.4, §3.1).

Reference analog: for each surviving k-mer, probe which of the <=4
single-base extensions also survive (`DNAMap.contains`, BASELINE.json:5).
TPU-native: vectorized binary search of all 8N extension queries (2
orientations x 4 bases) over the sorted canonical table — no hash probes,
pure batched gathers that XLA pipelines over HBM.

Output: succ[2N, 4] int32 oriented successor ids (-1 = absent), where
oriented id v = 2*i + s (SEMANTICS §3). Table slots beyond n_unique yield
rows of -1 and are never referenced by later passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from genome_tpu.kernels import u64

I32 = jnp.int32
U32 = jnp.uint32


def searchsorted_pair(table_hi, table_lo, n_valid, qh, ql):
    """Vectorized lower-bound binary search on a (hi, lo) sorted table.

    table entries at index >= n_valid are treated as +inf. Returns int32
    insertion positions (0..n_valid).
    """
    capacity = table_hi.shape[0]
    steps = max(1, (capacity - 1).bit_length())
    # derive carries from the (possibly shard-varying) inputs so the fori
    # carry types match under shard_map's varying-manual-axes tracking
    lo_b = (qh & jnp.uint32(0)).astype(I32)
    hi_b = lo_b + jnp.asarray(n_valid, I32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mh = table_hi[mid]
        ml = table_lo[mid]
        less = u64.lt(mh, ml, qh, ql)  # table[mid] < query
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
        return lo_b, hi_b

    lo_b, hi_b = jax.lax.fori_loop(0, steps + 1, body, (lo_b, hi_b))
    return lo_b


@functools.partial(jax.jit, static_argnames=("k",))
def build_graph_device(table_hi, table_lo, n_unique, k: int):
    """Sorted canonical table -> oriented successor array succ[2C, 4] int32.

    succ[2i+s, b] = oriented id of extension of node i (orientation s) by
    base b, or -1. Orientation 0 = stored canonical k-mer, 1 = its RC.
    """
    capacity = table_hi.shape[0]
    ids = jnp.arange(capacity, dtype=I32)
    valid_node = ids < n_unique

    # oriented k-mer values okv[2C]: even rows = table, odd rows = revcomp
    rh, rl = u64.revcomp(table_hi, table_lo, k)
    okv_hi = jnp.stack([table_hi, rh], axis=1).reshape(-1)
    okv_lo = jnp.stack([table_lo, rl], axis=1).reshape(-1)
    valid_o = jnp.repeat(valid_node, 2)

    # extension ext = (okv << 2 | b) masked to 2k bits
    sh, sl = u64.shl(okv_hi, okv_lo, 2)
    if k > 16:
        sh = sh & U32((1 << (2 * k - 32)) - 1)
    else:
        sh = jnp.zeros_like(sh)
        sl = sl & U32((1 << (2 * k)) - 1) if k < 16 else sl

    succ_cols = []
    for b in range(4):
        eh, el = sh, sl | U32(b)
        ch, cl = u64.canonical(eh, el, k)
        pos = searchsorted_pair(table_hi, table_lo, n_unique, ch, cl)
        pos_c = jnp.minimum(pos, capacity - 1)
        found = (pos < n_unique) & u64.eq(table_hi[pos_c], table_lo[pos_c], ch, cl)
        orient = (~u64.eq(eh, el, ch, cl)).astype(I32)
        col = jnp.where(found & valid_o, 2 * pos_c + orient, -1)
        succ_cols.append(col)
    succ = jnp.stack(succ_cols, axis=1)
    return succ, okv_hi, okv_lo

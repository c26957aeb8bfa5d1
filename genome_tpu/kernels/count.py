"""T1: k-mer counting on device = sort + segmented reduce (SURVEY.md §2.4).

This is the TPU-native replacement for the reference's `DNAMap`
open-addressing insert loop (BASELINE.json:5): instead of random-probe
hash inserts (DRAM-latency-bound), the whole k-mer stream is sorted and
counted by run-length encoding — streaming, HBM-bandwidth-bound work.

Correctness path uses XLA's lax.sort (two-key lexicographic on the uint32
pair); the Pallas radix sort (genome_tpu.kernels.sort_pallas) drops in for
speed. Sentinel note: invalid windows carry key (0xFFFFFFFF, 0xFFFFFFFF),
which can never equal a *canonical* k-mer for any k <= 32 (the all-T k-mer
canonicalizes to all-A), so sentinels sort last and are filtered exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from genome_tpu.kernels.extract import SENTINEL

U32 = jnp.uint32


def sort_pairs_xla(hi: jax.Array, lo: jax.Array, *extra):
    """Lexicographic sort of the (hi, lo) key pair, carrying extras along."""
    out = jax.lax.sort((hi, lo) + extra, num_keys=2)
    return out


@functools.partial(jax.jit, static_argnames=("capacity", "sorter"))
def count_kmers_device(
    hi: jax.Array,
    lo: jax.Array,
    min_coverage: jax.Array | int,
    capacity: int,
    sorter=None,
):
    """Canonical k-mer stream -> sorted unique table + counts (filtered).

    Args:
      hi, lo: flat uint32 pair stream (SENTINEL = invalid slots).
      min_coverage: count threshold (SEMANTICS §2).
      capacity: static output table size; if the number of distinct
        surviving k-mers exceeds it, `overflow` is set and results are
        truncated (caller retries with larger capacity; SURVEY §7 "hard
        parts": capacity-planned padded buffers + overflow counters).
      sorter: optional (hi, lo) -> (hi, lo) sorted, defaults to XLA sort.

    Returns dict with table_hi/table_lo/counts [capacity], n_unique (int32
    scalar), overflow (bool scalar).
    """
    m = hi.shape[0]
    if m == 0:
        z = jnp.zeros((capacity,), dtype=U32)
        return dict(table_hi=z, table_lo=z, counts=z,
                    n_unique=jnp.int32(0), overflow=jnp.bool_(False))
    if sorter is None:
        shi, slo = sort_pairs_xla(hi, lo)
    else:
        shi, slo = sorter(hi, lo)

    first = jnp.concatenate([
        jnp.ones((1,), dtype=jnp.bool_),
        (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]),
    ])
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1

    is_sent = shi == SENTINEL
    n_runs_real = jnp.sum(first & ~is_sent, dtype=jnp.int32)
    overflow = n_runs_real > capacity

    counts = jax.ops.segment_sum(
        jnp.ones((m,), dtype=U32), run_id, num_segments=capacity
    )
    # first element of each run carries the key; runs beyond capacity drop
    scatter_idx = jnp.where(first, run_id, capacity)
    run_hi = jnp.zeros((capacity,), dtype=U32).at[scatter_idx].set(shi, mode="drop")
    run_lo = jnp.zeros((capacity,), dtype=U32).at[scatter_idx].set(slo, mode="drop")

    ridx = jnp.arange(capacity, dtype=jnp.int32)
    valid = (ridx < n_runs_real) & (counts >= jnp.asarray(min_coverage, U32))
    # compact surviving runs to the front (stays sorted: stable positions)
    dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
    out_idx = jnp.where(valid, dest, capacity)
    table_hi = jnp.zeros((capacity,), dtype=U32).at[out_idx].set(run_hi, mode="drop")
    table_lo = jnp.zeros((capacity,), dtype=U32).at[out_idx].set(run_lo, mode="drop")
    out_counts = jnp.zeros((capacity,), dtype=U32).at[out_idx].set(counts, mode="drop")
    n_unique = valid.sum(dtype=jnp.int32)
    return dict(table_hi=table_hi, table_lo=table_lo, counts=out_counts,
                n_unique=n_unique, overflow=overflow)

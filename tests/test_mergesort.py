"""Global merge sort (kernels/mergesort.py) vs np.lexsort, interpret
mode on CPU; the merge_blocks halving network vs brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_tpu.kernels.bitonic import merge_blocks
from genome_tpu.kernels.mergesort import sort_pairs_merge


def _check_sorted(hi, lo, sh, sl):
    key = hi.astype(np.uint64) << 32 | lo
    skey = np.asarray(sh).astype(np.uint64) << 32 | np.asarray(sl)
    assert np.array_equal(np.sort(key), skey)


def test_merge_blocks_sorts_bitonic_runs():
    rng = np.random.default_rng(0)
    block, nb = 512, 4
    his, los = [], []
    for _ in range(nb):
        h = np.sort(rng.integers(0, 50, size=block, dtype=np.uint32))
        l = rng.integers(0, 1 << 31, size=block, dtype=np.uint32)
        # make a bitonic run: ascending first half, descending second
        h = np.concatenate([h[: block // 2], h[block // 2 :][::-1]])
        his.append(h)
        los.append(l)
    hi = np.concatenate(his)
    lo = np.concatenate(los)
    sh, sl = merge_blocks((jnp.asarray(hi), jnp.asarray(lo)), 1, block,
                          interpret=True)
    sh = np.asarray(sh)
    for b in range(nb):
        s = slice(b * block, (b + 1) * block)
        assert np.array_equal(np.sort(hi[s]), sh[s])


@pytest.mark.parametrize("nblocks", [1, 2, 3, 4, 5, 8, 11])
def test_sort_pairs_merge_matches_numpy(nblocks):
    rng = np.random.default_rng(nblocks)
    block = 512
    n = nblocks * block
    hi = rng.integers(0, 1 << 10, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    sh, sl = sort_pairs_merge(jnp.asarray(hi), jnp.asarray(lo),
                              block=block, interpret=True)
    _check_sorted(hi, lo, sh, sl)


def test_sort_pairs_merge_with_sentinels():
    rng = np.random.default_rng(9)
    block = 512
    n = 3 * block
    hi = rng.integers(0, 1 << 10, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    hi[::7] = 0xFFFFFFFF
    lo[::7] = 0xFFFFFFFF
    sh, sl = sort_pairs_merge(jnp.asarray(hi), jnp.asarray(lo),
                              block=block, interpret=True)
    _check_sorted(hi, lo, sh, sl)


def test_sort_pairs_merge_duplicates_and_ties():
    rng = np.random.default_rng(10)
    block = 512
    n = 6 * block
    hi = rng.integers(0, 4, size=n, dtype=np.uint32)   # heavy ties
    lo = rng.integers(0, 8, size=n, dtype=np.uint32)
    sh, sl = sort_pairs_merge(jnp.asarray(hi), jnp.asarray(lo),
                              block=block, interpret=True)
    _check_sorted(hi, lo, sh, sl)


@pytest.mark.tpu
def test_sort_pairs_merge_tpu():
    rng = np.random.default_rng(11)
    n = 11 * 65536
    hi = rng.integers(0, 1 << 10, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    sh, sl = sort_pairs_merge(jnp.asarray(hi), jnp.asarray(lo))
    _check_sorted(hi, lo, sh, sl)

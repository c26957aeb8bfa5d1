"""Pallas kernel tier (SURVEY.md §4.2): bitonic block sort and stream
compaction vs NumPy oracles, interpret mode on CPU (real TPU covered by
the bench/driver runs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_tpu.kernels.bitonic import sort_blocks
from genome_tpu.kernels.compact import CHUNK, TILE, compact_flagged


def test_bitonic_blocks_two_key_with_payload():
    rng = np.random.default_rng(0)
    n, block = 2048, 512
    hi = rng.integers(0, 8, size=n, dtype=np.uint32)  # many ties
    lo = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    w = rng.integers(0, 100, size=n, dtype=np.uint32)
    sh, sl, sw = map(np.asarray, sort_blocks(
        (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(w)), 2, block,
        interpret=True))
    for b in range(n // block):
        s = slice(b * block, (b + 1) * block)
        key = hi[s].astype(np.uint64) << 32 | lo[s]
        skey = sh[s].astype(np.uint64) << 32 | sl[s]
        assert np.array_equal(np.sort(key), skey)
        # payload rides with its key: (key, w) multiset preserved
        assert np.array_equal(np.sort(key * 1000 + w[s]),
                              np.sort(skey * 1000 + sw[s]))


def test_bitonic_single_key():
    rng = np.random.default_rng(1)
    n, block = 1024, 256
    x = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    (sx,) = sort_blocks((jnp.asarray(x),), 1, block, interpret=True)
    sx = np.asarray(sx)
    for b in range(n // block):
        s = slice(b * block, (b + 1) * block)
        assert np.array_equal(np.sort(x[s]), sx[s])


@pytest.mark.parametrize("p", [0.0, 0.07, 0.9, 1.0])
def test_compact_flagged_matches_numpy(p):
    rng = np.random.default_rng(int(p * 100) + 2)
    n = TILE
    flags = rng.random(n) < p
    a = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    b = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    cap = ((int(flags.sum()) + CHUNK) // CHUNK + 1) * CHUNK
    (oa, ob), pos, tot, ovf = compact_flagged(
        jnp.asarray(flags), (jnp.asarray(a), jnp.asarray(b)), cap,
        interpret=True)
    idx = np.flatnonzero(flags)
    assert int(tot) == idx.size and not bool(ovf)
    assert np.array_equal(np.asarray(pos)[: idx.size], idx)
    assert np.array_equal(np.asarray(oa)[: idx.size], a[idx])
    assert np.array_equal(np.asarray(ob)[: idx.size], b[idx])


def _compact_case(flag_counts, cap_slack_chunks=2, interpret=True, seed=3):
    """Build an nt-tile input whose per-tile flagged counts are given
    (prime-ish values exercise every rem in the carry splice), run the
    compactor, and check in-order exact extraction against NumPy."""
    rng = np.random.default_rng(seed)
    nt = len(flag_counts)
    n = nt * TILE
    flags = np.zeros(n, bool)
    for t, c in enumerate(flag_counts):
        pos = rng.choice(TILE, size=c, replace=False) + t * TILE
        flags[pos] = True
    a = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    b = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    total = int(flags.sum())
    cap = (total // CHUNK + cap_slack_chunks) * CHUNK
    (oa, ob), pos, tot, ovf = compact_flagged(
        jnp.asarray(flags), (jnp.asarray(a), jnp.asarray(b)), cap,
        interpret=interpret)
    idx = np.flatnonzero(flags)
    assert int(tot) == idx.size and not bool(ovf)
    assert np.array_equal(np.asarray(pos)[: idx.size], idx)
    assert np.array_equal(np.asarray(oa)[: idx.size], a[idx])
    assert np.array_equal(np.asarray(ob)[: idx.size], b[idx])


# per-tile counts chosen so the carry remainder (count mod CHUNK) cycles
# through distinct nonzero values, including a zero-flag tile, a full
# tile, and an exactly-chunk-aligned tile — the rem-splice/_flat_roll_up_dyn
# paths across sequential grid programs (kernels/compact.py:122-173)
_MULTITILE_CASES = [
    (1009, 2027, 4093, 577),          # prime-ish, rem nonzero every tile
    (0, 1, TILE, 2048),               # empty tile, singleton, full, aligned
    (CHUNK - 1, 1, CHUNK + 1, 997),   # straddle chunk boundaries
    (3571, 0, 0, 3571, 31),           # gap tiles between carries
]


@pytest.mark.parametrize("counts", _MULTITILE_CASES)
def test_compact_flagged_multitile_carry(counts):
    _compact_case(counts, interpret=True)


def test_compact_flagged_multitile_random():
    rng = np.random.default_rng(11)
    counts = [int(c) for c in rng.integers(0, TILE + 1, size=5)]
    _compact_case(counts, interpret=True, seed=12)


def test_compact_flagged_multitile_overflow():
    # total spills past capacity mid-grid: overflow flag set, prefix intact
    n = 3 * TILE
    flags = np.ones(n, bool)
    a = np.arange(n, dtype=np.uint32)
    cap = 4 * CHUNK
    (oa,), pos, tot, ovf = compact_flagged(
        jnp.asarray(flags), (jnp.asarray(a),), cap, interpret=True)
    assert bool(ovf) and int(tot) == n
    assert np.array_equal(np.asarray(oa)[: cap - CHUNK],
                          a[: cap - CHUNK])


@pytest.mark.tpu
@pytest.mark.parametrize("counts", _MULTITILE_CASES)
def test_compact_flagged_multitile_carry_tpu(counts):
    """Same cases through real Mosaic codegen (interpret can diverge)."""
    _compact_case(counts, interpret=False)


@pytest.mark.tpu
def test_bitonic_blocks_tpu():
    rng = np.random.default_rng(5)
    n, block = 4096, 1024
    hi = rng.integers(0, 8, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    sh, sl = map(np.asarray, sort_blocks(
        (jnp.asarray(hi), jnp.asarray(lo)), 2, block, interpret=False))
    for b in range(n // block):
        s = slice(b * block, (b + 1) * block)
        key = hi[s].astype(np.uint64) << 32 | lo[s]
        assert np.array_equal(np.sort(key), sh[s].astype(np.uint64) << 32 | sl[s])


def test_compact_flagged_overflow():
    n = TILE
    flags = np.ones(n, bool)
    a = np.arange(n, dtype=np.uint32)
    (oa,), pos, tot, ovf = compact_flagged(
        jnp.asarray(flags), (jnp.asarray(a),), 2 * CHUNK, interpret=True)
    assert bool(ovf) and int(tot) == n
    assert np.array_equal(np.asarray(oa)[: 2 * CHUNK], a[: 2 * CHUNK])

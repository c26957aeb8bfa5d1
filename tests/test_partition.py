"""kernels/partition.py (B-way stable stream partition) vs a NumPy oracle.

The partition counter was measured break-even vs the global sort on TPU
(BENCH.md post-mortem) so it is parked off the production path, but the
kernel itself stays correctness-tested: multi-row stability, per-bucket
carry splicing across grid steps, chunk-boundary fills, and overflow.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_tpu.kernels.partition import CHUNK, partition_by_bucket

ROW = 2048  # small row_len keeps interpret mode fast; % CHUNK == 0


def _oracle(bid, rem, B, row_len):
    """Stable partition: per bucket, rows in order, stream order in row."""
    R = bid.size // row_len
    out = [[] for _ in range(B)]
    for r in range(R):
        rb = bid[r * row_len : (r + 1) * row_len]
        rr = rem[r * row_len : (r + 1) * row_len]
        for b in range(B):
            out[b].append(rr[rb == b])
    return [np.concatenate(x) for x in out]


def _case(seed, R, B, bucket_cap, skew=None, expect_ovf=False):
    rng = np.random.default_rng(seed)
    n = R * ROW
    if skew is None:
        bid = rng.integers(0, B, size=n, dtype=np.int32)
    else:
        bid = rng.choice(B, size=n, p=skew).astype(np.int32)
    rem = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    out, totals, ovf = partition_by_bucket(
        jnp.asarray(bid), jnp.asarray(rem), B, bucket_cap, row_len=ROW,
        interpret=True)
    assert bool(ovf) == expect_ovf
    exp = _oracle(bid, rem, B, ROW)
    totals = np.asarray(totals)
    out = np.asarray(out)
    for b in range(B):
        assert totals[b] == exp[b].size
        if not expect_ovf:
            assert np.array_equal(out[b, : totals[b]], exp[b]), b


def test_partition_single_row():
    _case(0, R=1, B=8, bucket_cap=2 * CHUNK)


def test_partition_multirow_carry_splice():
    # per-bucket per-row loads ~ROW/B = 256: every bucket's carry buffer
    # fills across several grid steps before each chunk flush
    _case(1, R=6, B=8, bucket_cap=4 * CHUNK)


def test_partition_skewed_chunk_boundaries():
    # one hot bucket crossing many chunk boundaries; one near-empty
    skew = np.full(8, 0.3 / 6)
    skew[3], skew[5] = 0.65, 0.05
    _case(2, R=5, B=8, bucket_cap=8 * CHUNK, skew=skew)


def test_partition_all_one_bucket():
    bid = np.zeros(2 * ROW, np.int32)
    rem = np.arange(2 * ROW, dtype=np.uint32)
    cap = ((2 * ROW) // CHUNK + 1) * CHUNK
    out, totals, ovf = partition_by_bucket(
        jnp.asarray(bid), jnp.asarray(rem), 4, cap, row_len=ROW,
        interpret=True)
    assert not bool(ovf)
    assert int(np.asarray(totals)[0]) == 2 * ROW
    assert np.array_equal(np.asarray(out)[0, : 2 * ROW], rem)
    assert (np.asarray(totals)[1:] == 0).all()


def test_partition_overflow_flag():
    # hot bucket exceeds bucket_cap - CHUNK: flagged, nothing out of bounds
    skew = np.full(4, 0.1 / 3)
    skew[0] = 0.9
    _case(3, R=4, B=4, bucket_cap=2 * CHUNK, skew=skew, expect_ovf=True)


@pytest.mark.tpu
def test_partition_multirow_tpu():
    """Same splice-heavy case through real Mosaic codegen."""
    rng = np.random.default_rng(7)
    R, B = 4, 16
    n = R * 262144
    bid = rng.integers(0, B, size=n, dtype=np.int32)
    rem = rng.integers(0, 1 << 31, size=n, dtype=np.uint32)
    cap = ((n // B) // CHUNK + 8) * CHUNK
    out, totals, ovf = partition_by_bucket(
        jnp.asarray(bid), jnp.asarray(rem), B, cap, interpret=False)
    assert not bool(ovf)
    exp = _oracle(bid, rem, B, 262144)
    totals = np.asarray(totals)
    out = np.asarray(out)
    for b in range(B):
        assert totals[b] == exp[b].size
        assert np.array_equal(out[b, : totals[b]], exp[b]), b

"""Pallas digit-histogram kernel vs NumPy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from genome_tpu.kernels import u64
from genome_tpu.kernels.pallas_hist import TILE_ROWS, LANES, digit_histogram_auto


@pytest.mark.parametrize("nbits,shift", [(8, 0), (8, 16), (8, 28), (8, 34),
                                         (4, 30), (10, 32)])
def test_digit_histogram_matches_numpy(nbits, shift):
    rng = np.random.default_rng(nbits * 100 + shift)
    n = 2 * TILE_ROWS * LANES
    keys = rng.integers(0, 1 << 42, size=n, dtype=np.uint64)
    hi, lo = u64.from_u64_np(keys)
    import jax.numpy as jnp
    got = np.asarray(digit_histogram_auto(jnp.asarray(hi), jnp.asarray(lo),
                                          nbits, shift))
    digits = ((keys >> np.uint64(shift)) & np.uint64((1 << nbits) - 1))
    expect = np.bincount(digits.astype(np.int64), minlength=1 << nbits)
    assert (got == expect).all()
    assert got.sum() == n

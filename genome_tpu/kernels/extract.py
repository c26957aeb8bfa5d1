"""T0/T1: read packing (host) + canonical k-mer window extraction (device).

Replaces the reference's rolling k-mer iteration feeding `DNAMap.insert`
(SURVEY.md §3.2) with a vectorized, jit-compiled window pack over static
[B, L] read batches. Invalid windows (non-ACGT or padding) become the
sentinel key (0xFFFFFFFF, 0xFFFFFFFF), which sorts after every real k-mer
(valid keys have hi < 2^(2k-32)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genome_tpu.kernels import u64
from genome_tpu.utils import dna

SENTINEL = np.uint32(0xFFFFFFFF)
PAD_CODE = 4  # same as dna.INVALID


def pack_reads(reads: list[str], length: int | None = None) -> np.ndarray:
    """Host: list of read strings -> uint8 code matrix [B, L], padded with 4.

    Reads longer than `length` are truncated; shorter ones padded (padding
    yields invalid windows, so semantics match per-read extraction).
    """
    if not reads:
        return np.full((0, length or 0), PAD_CODE, dtype=np.uint8)
    L = length or max(len(r) for r in reads)
    out = np.full((len(reads), L), PAD_CODE, dtype=np.uint8)
    for i, r in enumerate(reads):
        c = dna.encode(r)[:L]
        out[i, : c.size] = c
    return out


def pack_codes_host(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host: uint8 code matrix [B, L] -> (packed [B, ceil(L/4)] 4 codes
    per byte, invalid [B, ceil(L/8)] validity bitmask).

    Device->host code matrices are the big e2e transfer (1 B/base); this
    packs to 0.3125 B/base so the host->device link moves ~3.2x less.
    Codes >= 4 (N/pad) pack as arbitrary 2-bit values and are restored
    via the mask on device (extract_canonical_kmers_packed).

    Fast path: the native row-parallel packer (io/native gt_pack_codes,
    ~10x the numpy passes below at E. coli scale); byte-identical output
    (CI-compared), numpy fallback when the toolchain is unavailable.
    """
    try:
        from genome_tpu.io.native.cio import pack_codes_native
        r = pack_codes_native(np.ascontiguousarray(codes, dtype=np.uint8))
        if r is not None:
            return r[0], r[1]
    except Exception:
        pass
    return _pack_codes_numpy(codes)


def _pack_codes_numpy(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Numpy reference implementation of pack_codes_host (fallback + the
    oracle the native packer is CI-compared against)."""
    B, L = codes.shape
    L4 = -(-L // 4) * 4
    L8 = -(-L // 8) * 8
    c = np.full((B, L8), PAD_CODE, dtype=np.uint8)
    c[:, :L] = codes
    bad = c >= 4
    c2 = (c & 3).astype(np.uint8)
    packed = (c2[:, 0::4] | (c2[:, 1::4] << 2) | (c2[:, 2::4] << 4)
              | (c2[:, 3::4] << 6))[:, : L4 // 4]
    weights = (1 << np.arange(8, dtype=np.uint8))
    invalid = (bad.reshape(B, L8 // 8, 8) * weights[None, None, :]).sum(
        axis=2).astype(np.uint8)
    return packed, invalid


@functools.partial(jax.jit, static_argnames=("k", "L"))
def extract_canonical_kmers_packed(packed: jax.Array, invalid: jax.Array,
                                   k: int, L: int):
    """extract_canonical_kmers on the packed host format (pack_codes_host).

    Unpacks on device (cheap vector ops XLA fuses into the window loop)
    and yields the identical canonical (hi, lo) stream for the first L
    columns."""
    B = packed.shape[0]
    p = packed.astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 2
    codes4 = (p[:, :, None] >> shifts[None, None, :]) & 3
    codes = codes4.reshape(B, -1)
    iv = invalid.astype(jnp.uint32)
    bshifts = jnp.arange(8, dtype=jnp.uint32)
    bad8 = (iv[:, :, None] >> bshifts[None, None, :]) & 1
    bad = bad8.reshape(B, -1)
    codes = jnp.where(bad[:, : codes.shape[1]] > 0, jnp.uint32(PAD_CODE),
                      codes)
    return extract_canonical_kmers(codes[:, :L], k)


@functools.partial(jax.jit, static_argnames=("k", "L", "L_real"))
def extract_canonical_kmers_packed_nomask(packed: jax.Array, k: int, L: int,
                                          L_real: int, n_rows: jax.Array):
    """Mask-free variant of extract_canonical_kmers_packed for inputs with
    no N/invalid bases in the real region (native packer's
    real_has_invalid == False): validity is exactly the row bound
    (row < n_rows) plus the static column bound (window fits in the
    first L_real columns), so the 1-bit-per-base mask never crosses the
    host->device link (it is ~1/3 of the packed wire bytes).

    L is the padded (8-aligned) width the packed buffer encodes; L_real
    the true read length — pad columns decode as code 0 and are excluded
    by the bound, matching the masked path bit-for-bit (CI-compared)."""
    B = packed.shape[0]
    p = packed.astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 2
    codes4 = (p[:, :, None] >> shifts[None, None, :]) & 3
    codes = codes4.reshape(B, -1)[:, :L]
    ch, cl = extract_canonical_kmers(codes, k)
    nwin = L - k + 1
    if nwin <= 0:
        return ch, cl
    # [B, nwin] broadcast (not a flat arange): a flat index wraps int32
    # when B*nwin >= 2^31, silently corrupting the validity mask.
    row = jnp.arange(B, dtype=jnp.int32)[:, None]
    t = jnp.arange(nwin, dtype=jnp.int32)[None, :]
    bad = ((row >= jnp.asarray(n_rows, jnp.int32))
           | (t + k > L_real)).reshape(-1)
    ch = jnp.where(bad, SENTINEL, ch)
    cl = jnp.where(bad, SENTINEL, cl)
    return ch, cl


@functools.partial(jax.jit, static_argnames=("k",))
def extract_canonical_kmers(codes: jax.Array, k: int):
    """[B, L] uint8 codes -> flat canonical k-mer stream ((hi, lo) uint32).

    Returns (hi, lo) of shape [B*(L-k+1)]; invalid windows are SENTINEL.
    """
    codes = codes.astype(jnp.uint32)
    B, L = codes.shape
    nwin = L - k + 1
    if nwin <= 0:
        z = jnp.full((0,), SENTINEL, dtype=jnp.uint32)
        return z, z
    hi = jnp.zeros((B, nwin), dtype=jnp.uint32)
    lo = jnp.zeros((B, nwin), dtype=jnp.uint32)
    bad = jnp.zeros((B, nwin), dtype=jnp.int32)
    for t in range(k):  # static unroll: k shifted adds, fused by XLA
        c = codes[:, t : t + nwin]
        hi, lo = u64.shl(hi, lo, 2)
        lo = lo | (c & jnp.uint32(3))
        bad = bad + (c >> jnp.uint32(2)).astype(jnp.int32)  # 1 iff code >= 4
    ch, cl = u64.canonical(hi, lo, k)
    invalid = bad > 0
    ch = jnp.where(invalid, SENTINEL, ch)
    cl = jnp.where(invalid, SENTINEL, cl)
    return ch.reshape(-1), cl.reshape(-1)

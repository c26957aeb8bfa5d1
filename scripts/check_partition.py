"""Correctness + throughput check for kernels/partition.py on device.

Usage: python scripts/check_partition.py [small|bench|sweep]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from genome_tpu.kernels.partition import (CHUNK, partition_by_bucket,
                                          partition_by_bucket_auto)


def ref_partition(bid, rem, B, cap, row_len):
    """NumPy oracle: row-grouped stable partition."""
    R = bid.size // row_len
    out = np.full((B, cap), 0xDEADBEEF, dtype=np.uint64)
    tot = np.zeros(B, dtype=np.int64)
    for r in range(R):
        rb = bid[r * row_len:(r + 1) * row_len]
        rr = rem[r * row_len:(r + 1) * row_len]
        order = np.argsort(rb, kind="stable")
        rb, rr = rb[order], rr[order]
        for b in range(B):
            seg = rr[rb == b]
            w = seg[:max(0, cap - tot[b])]  # clip (only matters post-ovf)
            out[b, tot[b]:tot[b] + w.size] = w
            tot[b] += seg.size
    return out, tot


def check(B, cap, row_len, R, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    n = R * row_len
    if skew:
        bid = np.minimum(rng.geometric(0.08, size=n) - 1, B - 1).astype(np.uint32)
    else:
        bid = rng.integers(0, B, size=n, dtype=np.uint32)
    rem = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    out, tot, ovf = partition_by_bucket_auto(
        jnp.asarray(bid), jnp.asarray(rem), B, cap, row_len=row_len)
    out, tot, ovf = np.asarray(out), np.asarray(tot), bool(ovf)
    eout, etot = ref_partition(bid, rem, B, cap, row_len)
    assert (tot == etot).all(), (tot, etot)
    eovf = bool((etot > cap - CHUNK).any())
    assert ovf == eovf, (ovf, eovf)
    if not ovf:
        for b in range(B):
            got = out[b, :tot[b]]
            want = eout[b, :tot[b]].astype(np.uint32)
            assert (got == want).all(), (
                b, np.nonzero(got != want)[0][:5], got[:8], want[:8])
    print(f"OK B={B} cap={cap} row_len={row_len} R={R} skew={skew} ovf={ovf}")


def bench_move(B, n, row_len, reps=3):
    rng = np.random.default_rng(0)
    bid = jnp.asarray(rng.integers(0, B, size=n, dtype=np.uint32))
    rem = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
    avg = n // B
    cap = (-(-int(avg * 1.15) // CHUNK)) * CHUNK + CHUNK

    f = jax.jit(lambda a, b: partition_by_bucket(a, b, B, cap,
                                                 row_len=row_len))
    out = f(bid, rem)
    assert not bool(out[2]), "overflow in bench config"
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(bid, rem)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    # rowsort-only baseline to isolate the mover's share
    g = jax.jit(lambda a, b: jax.lax.sort(
        (a.reshape(-1, row_len), b.reshape(-1, row_len)),
        dimension=1, num_keys=1))
    jax.block_until_ready(g(bid, rem))
    t0 = time.perf_counter()
    jax.block_until_ready(g(bid, rem))
    sort_dt = time.perf_counter() - t0
    print(f"B={B:5d} n={n} row_len={row_len}: total {best*1e3:7.1f} ms "
          f"({n/best/1e9:.2f} G/s) rowsort-only {sort_dt*1e3:7.1f} ms "
          f"mover~{(best-sort_dt)*1e3:7.1f} ms "
          f"({n/max(best-sort_dt,1e-9)/1e9:.2f} G elem/s)", flush=True)


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "small"
    if case == "small":
        check(B=8, cap=2048, row_len=1024 * 2, R=3)
        check(B=16, cap=3072, row_len=1024 * 4, R=2, skew=True)
        check(B=16, cap=2048, row_len=1024 * 4, R=4, skew=True)  # overflow
    elif case == "bench":
        check(B=64, cap=1024 * 48, row_len=262144, R=10)
        bench_move(1024, 88_080_384, 262144)
    elif case == "sweep":
        for B in (16, 64, 256, 1024, 4096):
            bench_move(B, 88_080_384, 262144)
    else:
        raise SystemExit(case)


if __name__ == "__main__":
    main()

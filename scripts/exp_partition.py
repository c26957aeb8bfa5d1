"""Round-2 design measurements for the B-way partition counter.

Cases:
  skew   — per-hi-bucket (1024 bins) mass of the bench workload's canonical
           k-mer stream: max/avg decides per-bucket capacity policy.
  shapes — candidate row-sort / bitonic shapes for partition phases.

Usage: python scripts/exp_partition.py CASE
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

from genome_tpu.kernels.extract import extract_canonical_kmers


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_codes(scale=1.0, k=21):
    genome_len = int(4_600_000 * scale)
    read_len = 100
    num_reads = int(genome_len * 24 / read_len)
    batch = 1 << 17
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - read_len + 1, size=num_reads)
    num_padded = ((num_reads + batch - 1) // batch) * batch
    codes = np.full((num_padded, read_len), 4, dtype=np.uint8)
    codes[:num_reads] = genome[starts[:, None] + np.arange(read_len)[None, :]]
    return jnp.asarray(codes), k


def main():
    case = sys.argv[1]
    rng = np.random.default_rng(0)

    if case == "skew":
        codes, k = bench_codes()

        @jax.jit
        def hist(c):
            hi, lo = extract_canonical_kmers(c, k)
            # valid hi < 2^(2k-32) = 1024 for k=21; SENTINEL -> bin 1024
            b = jnp.minimum(hi, jnp.uint32(1024)).astype(jnp.int32)
            h = jax.ops.segment_sum(jnp.ones_like(b), b, num_segments=1025)
            return h

        h = np.asarray(hist(codes))
        real = h[:1024]
        n = real.sum()
        print(f"n_valid={n} sentinel={h[1024]}")
        print(f"avg={n/1024:.0f} max={real.max()} max/avg={real.max()*1024/n:.3f}")
        print(f"p99={np.percentile(real, 99):.0f} "
              f"p90={np.percentile(real, 90):.0f}")
        # mass beyond a seg of 1.0x/1.25x/1.5x/2.0x avg
        for f in (1.0, 1.25, 1.5, 2.0):
            seg = int(f * n / 1024)
            over = np.maximum(real - seg, 0).sum()
            nover = (real > seg).sum()
            print(f"seg={f:.2f}x avg: buckets_over={nover} mass_over={over} "
                  f"({over/n*100:.2f}%)")
    elif case == "shapes":
        n = 88_080_384
        hi = jnp.asarray(rng.integers(0, 1024, size=n, dtype=np.uint32))
        lo = jnp.asarray(rng.integers(0, 1 << 31, size=n, dtype=np.uint32))

        for rowlen in (131072, 262144, 524288):
            rows = n // rowlen

            @jax.jit
            def f(a, b, rows=rows, rowlen=rowlen):
                o = jax.lax.sort((a.reshape(rows, rowlen),
                                  b.reshape(rows, rowlen)),
                                 dimension=1, num_keys=1)
                return o[0][:, 0].sum() + o[1][:, -1].sum()
            dt = timeit(f, hi, lo)
            print(f"lax rowsort {rows}x{rowlen} 1key+1pay: {dt*1e3:.0f} ms "
                  f"({n/dt/1e9:.2f} G/s)", flush=True)

        from genome_tpu.kernels.bitonic import sort_blocks
        for block in (131072, 262144):
            @jax.jit
            def g(a, b, block=block):
                o = sort_blocks((a, b), 1, block)
                return o[0][::block].sum() + o[1][::block].sum()
            dt = timeit(g, hi, lo)
            print(f"bitonic {block} 1key+1pay: {dt*1e3:.0f} ms "
                  f"({n/dt/1e9:.2f} G/s)", flush=True)

        # per-bucket lo sort candidate: 1 word only
        for block in (131072, 262144):
            @jax.jit
            def h1(b, block=block):
                o = sort_blocks((b,), 1, block)
                return o[0][::block].sum()
            dt = timeit(h1, lo)
            print(f"bitonic {block} 1key: {dt*1e3:.0f} ms "
                  f"({n/dt/1e9:.2f} G/s)", flush=True)

        @jax.jit
        def h2(b):
            o = jax.lax.sort((b.reshape(672, 131072),), dimension=1,
                             num_keys=1)
            return o[0][:, 0].sum()
        dt = timeit(h2, lo)
        print(f"lax rowsort 672x131072 1key: {dt*1e3:.0f} ms "
              f"({n/dt/1e9:.2f} G/s)", flush=True)
    else:
        raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()

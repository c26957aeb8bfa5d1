"""Microbenchmarks for TPU primitive rates that drive kernel design choices.

Usage: python scripts/ubench.py CASE [N]
Cases: cumsum, cummax_rev, rle, rowsort_512k, rowsort_128k_1key,
       rowsort_32k, sort_global

Timing rule (BENCH.md): force a scalar reduction + host transfer; on the
axon relay block_until_ready resolves without materializing.
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


def timeit(fn, *args, reps=3):
    out = fn(*args)  # compile
    _ = float(np.asarray(out))
    best = 1e9
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    case = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 88_080_384  # 88M, /32K
    rng = np.random.default_rng(0)

    if case == "cumsum":
        x = jnp.asarray(rng.integers(0, 2, size=n, dtype=np.int32))
        f = jax.jit(lambda v: jnp.cumsum(v)[-1])
        dt = timeit(f, x)
        print(f"cumsum {n}: {dt*1e3:.1f} ms  {n/dt/1e9:.3f} G elem/s")
    elif case == "cummax_rev":
        x = jnp.asarray(rng.integers(0, n, size=n, dtype=np.int32))
        f = jax.jit(lambda v: jax.lax.associative_scan(
            jnp.maximum, v, reverse=True)[0])
        dt = timeit(f, x)
        print(f"cummax_rev {n}: {dt*1e3:.1f} ms  {n/dt/1e9:.3f} G elem/s")
    elif case == "rle":
        # the RLE tail of count_weighted, minus the sort: runs on sorted-ish
        cap = 1 << 23
        hi = jnp.asarray(rng.integers(0, 1024, size=n, dtype=np.uint32))
        lo = jnp.asarray(np.sort(rng.integers(0, 1 << 31, size=n,
                                              dtype=np.uint32)))
        w = jnp.ones((n,), jnp.uint32)

        @jax.jit
        def f(shi, slo, sw):
            first = jnp.concatenate([
                jnp.ones((1,), bool),
                (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
            run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
            counts = jax.ops.segment_sum(sw.astype(jnp.uint32), run_id,
                                         num_segments=cap)
            scatter_idx = jnp.where(first, run_id, cap)
            run_hi = jnp.zeros((cap,), jnp.uint32).at[scatter_idx].set(
                shi, mode="drop")
            return counts.sum() + run_hi.sum()
        dt = timeit(f, hi, lo, w)
        print(f"rle {n}: {dt*1e3:.1f} ms  {n/dt/1e9:.3f} G elem/s")
    elif case == "rle_noseg":
        # RLE via next-head distance: no segment_sum; cumsum + capacity scatters
        cap = 1 << 23
        hi = jnp.asarray(rng.integers(0, 1024, size=n, dtype=np.uint32))
        lo = jnp.asarray(np.sort(rng.integers(0, 1 << 31, size=n,
                                              dtype=np.uint32)))

        @jax.jit
        def f(shi, slo):
            first = jnp.concatenate([
                jnp.ones((1,), bool),
                (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
            run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
            idx = jnp.arange(n, dtype=jnp.int32)
            scatter_idx = jnp.where(first, run_id, cap)
            starts = jnp.full((cap,), n, jnp.int32).at[scatter_idx].set(
                idx, mode="drop")
            nruns = run_id[-1] + 1
            ends = jnp.where(jnp.arange(cap) + 1 < nruns,
                             jnp.roll(starts, -1), n)
            counts = jnp.where(jnp.arange(cap) < nruns, ends - starts, 0)
            run_hi = jnp.zeros((cap,), jnp.uint32).at[scatter_idx].set(
                shi, mode="drop")
            return counts.sum() + run_hi.sum()
        dt = timeit(f, hi, lo)
        print(f"rle_noseg {n}: {dt*1e3:.1f} ms  {n/dt/1e9:.3f} G elem/s")
    elif case.startswith("rowsort"):
        # rowsort_<rowlen>_<nkeys>keys_<npay>pay e.g. rowsort_524288_1keys_1pay
        _, rowlen, nkeys, npay = case.split("_")
        rowlen = int(rowlen)
        nkeys = int(nkeys[:-4])
        npay = int(npay[:-3])
        rows = n // rowlen
        arrs = [jnp.asarray(rng.integers(0, 1 << 31, size=(rows, rowlen),
                                         dtype=np.uint32))
                for _ in range(nkeys + npay)]

        @jax.jit
        def f(*xs):
            out = jax.lax.sort(xs, dimension=1, num_keys=nkeys)
            return sum(o[:, 0].astype(jnp.uint64).sum() for o in out)
        dt = timeit(f, *arrs)
        tot = rows * rowlen
        print(f"{case} rows={rows}: {dt*1e3:.1f} ms  {tot/dt/1e9:.3f} G keys/s")
    elif case.startswith("bitonic"):
        # bitonic_<block>_<nkeys>keys_<npay>pay
        from genome_tpu.kernels.bitonic import sort_blocks
        _, block, nkeys, npay = case.split("_")
        block = int(block)
        nkeys = int(nkeys[:-4])
        npay = int(npay[:-3])
        nn = (n // block) * block
        arrs = tuple(jnp.asarray(rng.integers(0, 1 << 31, size=nn,
                                              dtype=np.uint32))
                     for _ in range(nkeys + npay))

        @jax.jit
        def f(*xs):
            out = sort_blocks(xs, nkeys, block)
            return sum(o[:: block].astype(jnp.uint64).sum() for o in out)
        dt = timeit(f, *arrs)
        print(f"{case}: {dt*1e3:.1f} ms  {nn/dt/1e9:.3f} G keys/s")
    elif case == "kjoin_parts":
        cap = 5242880
        n2 = 2 * cap
        m = 2 * n2
        rh = jnp.asarray(rng.integers(0, 256, size=m, dtype=np.uint32))
        rl = jnp.asarray(rng.integers(0, 1 << 31, size=m, dtype=np.uint32))
        pay = jnp.asarray(rng.integers(0, 1 << 31, size=m, dtype=np.uint32))

        @jax.jit
        def srt(a, b, c):
            o = jax.lax.sort((a, b, c), num_keys=3)
            return o[0][0] + o[2][-1]
        print(f"sort3x{m/1e6:.0f}M: {timeit(srt, rh, rl, pay)*1e3:.0f} ms")

        @jax.jit
        def srt2(a, b, c):
            o = jax.lax.sort((a, b, c), num_keys=2)
            return o[0][0] + o[2][-1]
        print(f"sort2k3a_{m/1e6:.0f}M: {timeit(srt2, rh, rl, pay)*1e3:.0f} ms")

        @jax.jit
        def look(a, b, c):
            I32 = jnp.int32
            sp = c
            is_b = (sp >> jnp.uint32(31)) == 0
            vid = ((sp >> jnp.uint32(2)) & jnp.uint32((1 << 29) - 1)).astype(I32)
            vb = (sp & jnp.uint32(3)).astype(I32)
            slots = jnp.stack([jnp.where(is_b & (vb == q), vid, -1)
                               for q in range(4)], axis=1)
            bcast = slots
            for s in range(1, 8):
                same = (a[s:] == a[:-s]) & (b[s:] == b[:-s])
                shifted = jnp.where(same[:, None], slots[:-s], -1)
                padq = jnp.full((s, 4), -1, dtype=I32)
                bcast = jnp.maximum(bcast, jnp.concatenate([padq, shifted]))
            return bcast.sum()
        print(f"lookback_{m/1e6:.0f}M: {timeit(look, rh, rl, pay)*1e3:.0f} ms")

        @jax.jit
        def scat(c):
            vid = ((c >> jnp.uint32(2)) & jnp.uint32((1 << 29) - 1)).astype(jnp.int32)
            rows = jnp.stack([vid, vid + 1, vid + 2, vid + 3], axis=1)
            out = jnp.full((n2, 4), -1, jnp.int32).at[
                jnp.minimum(vid, n2)].set(rows, mode="drop")
            return out.sum()
        print(f"scatter_rows_{m/1e6:.0f}M: {timeit(scat, pay)*1e3:.0f} ms")
    elif case == "sort_global":
        hi = jnp.asarray(rng.integers(0, 1024, size=n, dtype=np.uint32))
        lo = jnp.asarray(rng.integers(0, 1 << 31, size=n, dtype=np.uint32))

        @jax.jit
        def f(a, b):
            sa, sb = jax.lax.sort((a, b), num_keys=2)
            return sa[0].astype(jnp.uint64) + sb[-1]
        dt = timeit(f, hi, lo)
        print(f"sort_global {n}: {dt*1e3:.1f} ms  {n/dt/1e9:.3f} G keys/s")
    else:
        raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()

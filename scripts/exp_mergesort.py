"""Measure the pieces of a bitonic merge-sort replacement for the count
phase's global 2-key lax.sort (the 490 ms wall of the headline).

Plan under test: Pallas block sort (existing kernels/bitonic.py) then
log2(nblocks) pairwise merge levels, each = one XLA mirror stage +
(level-1) XLA halving stages at cross-block distances + one Pallas pass
running the final in-block halving stages in VMEM.

Measured here (pow2 sizes; production needs non-pow2 handling):
  A. lax.sort 2-key baseline at n
  B. sort_blocks 2-key at the largest feasible block
  C. one XLA mirror + halving stage cost at n (fusion check: k stages)
  D. Pallas in-block merge pass (halving-only network)
  E. assembled full sort vs lax.sort — time + correctness
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def timeit(f, *args, reps=3):
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        s = jax.tree.leaves(r)[0]
        _ = jnp.asarray(s).ravel()[0].item()  # force materialization
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = 1 << 26  # 67.1M
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 10, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    hi_d, lo_d = jnp.asarray(hi), jnp.asarray(lo)

    # A: lax.sort baselines
    lax2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    tA = timeit(lax2, hi_d, lo_d)
    print(f"A  lax.sort 2key {n>>20}M: {tA*1e3:.1f} ms "
          f"({n/tA/1e9:.2f} G/s)", flush=True)
    lax1p = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    tA2 = timeit(lax1p, lo_d, hi_d)
    print(f"A2 lax.sort 1key+1pay: {tA2*1e3:.1f} ms "
          f"({n/tA2/1e9:.2f} G/s)", flush=True)
    lax1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1))
    tA3 = timeit(lax1, lo_d)
    print(f"A3 lax.sort 1key only: {tA3*1e3:.1f} ms "
          f"({n/tA3/1e9:.2f} G/s)", flush=True)

    # B: Pallas block sort, 2-key
    from genome_tpu.kernels.bitonic import sort_blocks
    for blk in (65536, 131072):
        try:
            f = jax.jit(functools.partial(sort_blocks, num_keys=2, block=blk))
            tB = timeit(f, (hi_d, lo_d))
            print(f"B sort_blocks 2key block={blk}: {tB*1e3:.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"B block={blk}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # C: XLA cross-block stages. Mirror at run length L, halving at dist d.
    def mirror(a, b, L):
        a2 = a.reshape(-1, 2, L)
        b2 = b.reshape(-1, 2, L)
        xa, ya = a2[:, 0], a2[:, 1, ::-1]
        xb, yb = b2[:, 0], b2[:, 1, ::-1]
        gt = (xa > ya) | ((xa == ya) & (xb > yb))
        la = jnp.where(gt, ya, xa)
        lb = jnp.where(gt, yb, xb)
        ha = jnp.where(gt, xa, ya)
        hb = jnp.where(gt, xb, yb)
        a3 = jnp.stack([la, ha[:, ::-1]], axis=1).reshape(-1)
        b3 = jnp.stack([lb, hb[:, ::-1]], axis=1).reshape(-1)
        return a3, b3

    def halve(a, b, d):
        a2 = a.reshape(-1, 2, d)
        b2 = b.reshape(-1, 2, d)
        xa, ya = a2[:, 0], a2[:, 1]
        xb, yb = b2[:, 0], b2[:, 1]
        gt = (xa > ya) | ((xa == ya) & (xb > yb))
        a3 = jnp.stack([jnp.where(gt, ya, xa), jnp.where(gt, xa, ya)],
                       axis=1).reshape(-1)
        b3 = jnp.stack([jnp.where(gt, yb, xb), jnp.where(gt, xb, yb)],
                       axis=1).reshape(-1)
        return a3, b3

    one_mirror = jax.jit(functools.partial(mirror, L=1 << 22))
    tC1 = timeit(lambda a, b: one_mirror(a, b), hi_d, lo_d)
    print(f"C mirror stage: {tC1*1e3:.2f} ms", flush=True)
    one_halve = jax.jit(functools.partial(halve, d=1 << 20))
    tC2 = timeit(lambda a, b: one_halve(a, b), hi_d, lo_d)
    print(f"C halve stage:  {tC2*1e3:.2f} ms", flush=True)

    @jax.jit
    def five_stages(a, b):
        for d in (1 << 21, 1 << 20, 1 << 19, 1 << 18, 1 << 17):
            a, b = halve(a, b, d)
        return a, b
    tC3 = timeit(five_stages, hi_d, lo_d)
    print(f"C 5 chained halves: {tC3*1e3:.2f} ms "
          f"({tC3/5*1e3:.2f} ms/stage — fusion check)", flush=True)

    # D: Pallas in-block merge pass (halving-only network), if built
    try:
        from genome_tpu.kernels.bitonic import merge_blocks
        for blk in (65536, 131072):
            try:
                f = jax.jit(functools.partial(merge_blocks, num_keys=2,
                                              block=blk))
                tD = timeit(f, (hi_d, lo_d))
                print(f"D merge_blocks 2key block={blk}: {tD*1e3:.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"D block={blk}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    except ImportError:
        print("D merge_blocks: not built yet", flush=True)

    # F: the lo-major counting-sort pieces — extract equal-lo runs,
    # 2-key sort the extracted subset, scatter fixed hi back
    slo, shi_p = lax1p(lo_d, hi_d)

    @jax.jit
    def fixup(slo, shi):
        m = slo.shape[0]
        same = jnp.concatenate([jnp.zeros((1,), jnp.bool_),
                                slo[1:] == slo[:-1]])
        flag = same | jnp.concatenate([same[1:], jnp.zeros((1,), jnp.bool_)])
        from genome_tpu.kernels.compact import compact_flagged, CHUNK
        cap = (m // 8 // CHUNK) * CHUNK + CHUNK
        (xlo, xhi), pos, cnt, ovf = compact_flagged(flag, (slo, shi), cap)
        fl, fh = jax.lax.sort((xlo, xhi), num_keys=2)
        out_hi = shi.at[jnp.where(jnp.arange(pos.shape[0]) <
                                  jnp.minimum(cnt, cap), pos, m)].set(
            fh, mode="drop")
        return out_hi, cnt, ovf

    tF = timeit(fixup, slo, shi_p)
    fixed_hi, cnt, ovf = fixup(slo, shi_p)
    print(f"F fixup (extract+sort+scatter): {tF*1e3:.1f} ms "
          f"(run elems {int(cnt)}, ovf {bool(ovf)})", flush=True)
    print(f"F total lo-major: {(tA2+tF)*1e3:.1f} ms vs 2key {tA*1e3:.1f}",
          flush=True)
    # correctness: lex (lo, hi) order must match a true 2-key sort
    el3, eh3 = jax.lax.sort((lo_d, hi_d), num_keys=2)
    ok = bool((jnp.asarray(fixed_hi) == eh3).all()) and \
        bool((slo == el3).all())
    print(f"F correctness vs lax 2key (lo-major): {ok}", flush=True)

    # E: assembled full merge sort, if built
    try:
        from genome_tpu.kernels.mergesort import sort_pairs_merge
        f = jax.jit(sort_pairs_merge)
        tE = timeit(f, hi_d, lo_d)
        print(f"E full merge sort: {tE*1e3:.1f} ms ({n/tE/1e9:.2f} G/s) "
              f"vs lax {tA*1e3:.1f} ms", flush=True)
        sh, sl = f(hi_d, lo_d)
        eh, el = lax2(hi_d, lo_d)
        ok = bool((sh == eh).all()) and bool((sl == el).all())
        print(f"E correctness vs lax.sort: {ok}", flush=True)
    except ImportError:
        print("E sort_pairs_merge: not built yet", flush=True)


if __name__ == "__main__":
    main()

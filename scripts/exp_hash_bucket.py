"""Floor falsification probe (VERDICT r4 next #4): attack the ~122 M/s
buildable-construct floor sideways.

Two parts, one process (run on the real chip, nothing else on the TPU):

A. PROFILE the production 88M 2-key `lax.sort`: wall at bench shape,
   the compiled HLO structure (what XLA actually lowers sort to on TPU —
   stage loop bounds, fusion count), and a jax.profiler trace dump whose
   top ops are summarized to stdout. This turns the floor's "stage-count
   arithmetic" into an observed pass structure.

B. ATTACK construct: hash-uniform bucket partition + DEFERRED unique
   sort. Round 2 measured the value-ordered bucket scheme break-even,
   with two named killers: canonical-key skew (2x per-bucket inflation)
   and the mover/scatter cost. This variant removes the skew entirely
   (buckets = fmix32 of the full key -> multinomial-uniform loads) and
   exploits the 24x coverage: counting only needs equal keys ADJACENT,
   so buckets never need to be value-ordered — RLE runs per bucket and
   only the ~n/24-element unique table pays a (cheap) global sort at the
   end. What it cannot remove is the partition move itself: the
   destinations are data-dependent, so it pays either the measured
   ~0.18 G/s XLA scatter x2 words or a second sort. The numbers decide.

Prints '[exp]'-prefixed lines; append the outcome to BENCH.md either way.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    return jnp.asarray(x).reshape(-1)[0].item()  # forced materialization


def _timed(fn, *args, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        _sync(r[0] if isinstance(r, tuple) else r)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best, r


def main() -> int:
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from genome_tpu.io.benchdata import bench_workload
    from genome_tpu.kernels.extract import extract_canonical_kmers

    w = bench_workload(float(os.environ.get("BENCH_SCALE", "1.0")))
    k = w["k"]
    codes = jnp.asarray(w["clean"])
    hi, lo = jax.jit(lambda c: extract_canonical_kmers(c, k))(codes)
    n = int(hi.shape[0])
    print(f"[exp] stream n={n} (k={k})", flush=True)

    # ---------- A. profile the production global sort ----------
    sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    dt, _ = _timed(sort2, hi, lo)
    print(f"[exp] lax.sort 2-key {n}: {dt*1e3:.1f} ms "
          f"({n/dt/1e9:.3f} G keys/s)", flush=True)

    # compiled HLO structure: how many fusions/loops the sort lowers to
    txt = sort2.lower(hi, lo).compile().as_text()
    marks = {
        "sort": txt.count(" sort("),
        "fusion": txt.count(" fusion("),
        "while": txt.count(" while("),
        "custom-call": txt.count(" custom-call("),
        "copy": txt.count(" copy("),
        "transpose": txt.count(" transpose("),
    }
    print(f"[exp] compiled-HLO op counts: {marks}", flush=True)
    loops = [ln.strip()[:160] for ln in txt.splitlines()
             if " while(" in ln or "trip_count" in ln][:8]
    for ln in loops:
        print(f"[exp] hlo-loop: {ln}", flush=True)

    prof_dir = os.path.join(REPO, "prof_sort")
    with jax.profiler.trace(prof_dir):
        _sync(sort2(hi, lo)[0])
    print(f"[exp] profiler trace -> {prof_dir}", flush=True)
    try:
        import glob
        import gzip
        import json as _json
        cand = sorted(glob.glob(os.path.join(
            prof_dir, "**", "*.trace.json.gz"), recursive=True))
        if cand:
            with gzip.open(cand[-1], "rt") as f:
                tr = _json.load(f)
            evs = [e for e in tr.get("traceEvents", [])
                   if e.get("ph") == "X" and e.get("dur", 0) > 0]
            agg = {}
            for e in evs:
                name = e["name"]
                # keep device-side ops; drop host Python frame events
                if ".py" in name or name.startswith("$") \
                        or "asarray" in name or name == "trace":
                    continue
                agg[name] = agg.get(name, 0) + e["dur"]
            top = sorted(agg.items(), key=lambda kv: -kv[1])[:12]
            for name, dur in top:
                print(f"[exp] trace-top: {dur/1e3:9.2f} ms  {name[:110]}",
                      flush=True)
    except Exception as e:  # trace format drift: report, don't die
        print(f"[exp] trace parse failed: {e!r}", flush=True)

    # ---------- B. hash-uniform buckets + deferred unique sort ----------
    from genome_tpu.dist.partition import _fmix32_jnp

    B_BITS, ROW = 11, 32768
    B = 1 << B_BITS
    SENT = jnp.uint32(0xFFFFFFFF)

    def attack(hi, lo):
        m = hi.shape[0]          # static under jit (retraces per shape)
        nn = -(-m // ROW) * ROW
        pad = nn - m
        h = jnp.concatenate([hi, jnp.full((pad,), SENT)])
        l2 = jnp.concatenate([lo, jnp.full((pad,), SENT)])
        sent = (h == SENT) & (l2 == SENT)
        # multinomial-uniform buckets: fmix of the full 42-bit key
        b = (_fmix32_jnp(h * jnp.uint32(0x9E3779B9) ^ l2)
             >> jnp.uint32(32 - B_BITS)).astype(jnp.int32)
        b = jnp.where(sent, B, b)
        T = nn // ROW
        # phase A: per-row sort by bucket carrying both key words
        sb, sh, sl = jax.lax.sort(
            (b.reshape(T, ROW), h.reshape(T, ROW), l2.reshape(T, ROW)),
            dimension=1, num_keys=1)
        # destinations: (row,bucket) histogram + exclusive prefix + rank
        flat = (jnp.arange(T, dtype=jnp.int32)[:, None] * (B + 1)
                + sb).reshape(-1)
        histrb = jax.ops.segment_sum(
            jnp.ones((nn,), jnp.int32), flat,
            num_segments=T * (B + 1)).reshape(T, B + 1)
        # slack: hash buckets are uniform over UNIQUE keys, but all ~20
        # copies of a k-mer share a bucket, so load variance is
        # multiplicity-amplified: rel sigma ~ sqrt(mult / avg_load).
        # 4-sigma headroom, assuming ~20x coverage multiplicity.
        avg = nn / B
        slack = 1.1 + 4.0 * (20.0 / avg) ** 0.5
        seg = int(-(-slack * avg // 256) * 256)
        pre = jnp.cumsum(histrb, axis=0) - histrb
        col = jax.lax.broadcasted_iota(jnp.int32, (T, ROW), 1)
        newrun = jnp.concatenate(
            [jnp.ones((T, 1), bool), sb[:, 1:] != sb[:, :-1]], axis=1)
        runstart = jax.lax.cummax(jnp.where(newrun, col, 0), axis=1)
        rank = col - runstart
        within = jnp.take_along_axis(pre, sb, axis=1) + rank
        ok = (within < seg) & (sb < B)
        ovf = (histrb[:, :B].sum(axis=0) > seg).any()
        dest = jnp.where(ok, sb * seg + within, B * seg).reshape(-1)
        # THE move: two unique-index scatters (the known cost center)
        out_hi = jnp.full((B * seg,), SENT).at[dest].set(
            sh.reshape(-1), mode="drop", unique_indices=True)
        out_lo = jnp.full((B * seg,), SENT).at[dest].set(
            sl.reshape(-1), mode="drop", unique_indices=True)
        # phase C: per-bucket 2-key sorts (uniform loads, ~5% padding)
        ch, cl = jax.lax.sort(
            (out_hi.reshape(B, seg), out_lo.reshape(B, seg)),
            dimension=1, num_keys=2)
        # RLE per bucket (equal keys adjacent within a bucket)
        ch, cl = ch.reshape(-1), cl.reshape(-1)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), (ch[1:] != ch[:-1]) | (cl[1:] != cl[:-1])])
        real = ~((ch == SENT) & (cl == SENT))
        nuniq = (first & real).sum()
        return ch, cl, first, nuniq, ovf

    attack_j = jax.jit(attack)

    # stage timings (separately jitted pieces double-count the
    # host<->device sync, so also time the fused whole)
    dt_all, res = _timed(attack_j, hi, lo)
    nuniq = int(res[3])
    ovf = bool(res[4])
    print(f"[exp] attack fused total: {dt_all*1e3:.1f} ms "
          f"(n_unique={nuniq}, ovf={ovf}) vs lax.sort {dt*1e3:.1f} ms",
          flush=True)

    # correctness spot-check vs the production counter at small n
    from genome_tpu.kernels.count import count_kmers_device
    sh_, sl_ = hi[: 1 << 20], lo[: 1 << 20]
    small = jax.jit(attack)(sh_, sl_)
    ref = count_kmers_device(sh_, sl_, 1, 1 << 21)
    n_ref = int(ref["n_unique"])
    n_got = int(small[3])
    print(f"[exp] small-n unique: attack={n_got} ref={n_ref} "
          f"match={n_got == n_ref}", flush=True)

    # deferred unique-table sort cost at the real unique scale
    uh = hi[:nuniq] if nuniq <= n else hi
    ul = lo[:nuniq] if nuniq <= n else lo
    dt_u, _ = _timed(sort2, uh, ul)
    print(f"[exp] deferred unique sort ({int(uh.shape[0])}): "
          f"{dt_u*1e3:.1f} ms", flush=True)
    print(f"[exp] attack+unique = {(dt_all+dt_u)*1e3:.1f} ms vs "
          f"baseline {dt*1e3:.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark harness: headline k-mers/sec/chip for count+build
(BASELINE.json:2). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured throughput over the driver-set target of 80% of
the HBM roofline for 6-pass radix counting (~96 B/k-mer; BASELINE.md) on
the detected chip — the reference itself has no published numbers
(BASELINE.json:13 `published: {}`).

Workload: simulated E. coli-scale read set (genome 4.6 Mbp, 100 bp reads,
~24x coverage) generated as code matrices host-side; timed region is the
device pipeline extract -> canonical -> sort -> segmented-reduce count ->
successor build, excluding host IO. Scale with BENCH_SCALE (default 1.0).
"""

import json
import os
import sys
import time

import numpy as np

# chip HBM bandwidth table (B/s); fallback is v5e-class
_HBM = {
    "v5e": 819e9, "v5 lite": 819e9, "v5litepod": 819e9,
    "v4": 1228e9, "v5p": 2765e9, "v6e": 1640e9, "v6 lite": 1640e9,
}
_RADIX_BYTES_PER_KMER = 96.0  # 6 passes x (8B read + 8B write), BASELINE.md


def _detect_bw(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _HBM.items():
        if key in kind:
            return bw
    return 819e9


def main() -> int:
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from genome_tpu.graph.build import build_graph_device
    from genome_tpu.kernels.count import count_kmers_device
    from genome_tpu.kernels.extract import extract_canonical_kmers

    dev = jax.devices()[0]
    bw = _detect_bw(dev)

    k = 21
    genome_len = int(4_600_000 * scale)
    read_len = 100
    num_reads = int(genome_len * 24 / read_len)
    # batch only sets read-count padding granularity (single dispatch):
    # 1<<17 padded 75k phantom reads = 6M sentinel windows through the
    # sort (6.4% of the stream) at E. coli scale
    batch = 4096

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - read_len + 1, size=num_reads)
    capacity = 1 << max(13, int(np.ceil(np.log2(genome_len * 1.5))))
    num_padded = ((num_reads + batch - 1) // batch) * batch
    all_codes = np.full((num_padded, read_len), 4, dtype=np.uint8)
    all_codes[:num_reads] = genome[starts[:, None] + np.arange(read_len)[None, :]]

    # measured on TPU v5 lite @22M: sort 48 M/s, bucket 11 M/s, hashtable
    # 0.6 M/s (BENCH.md) — global sort is the current fastest counting path
    strategy = os.environ.get("BENCH_COUNTER", "sort")

    @jax.jit
    def count(codes):
        # one dispatch: extract -> canonical -> count
        his, los = extract_canonical_kmers(codes, k)
        if strategy == "bucket":
            from genome_tpu.kernels.sort_bucket import count_kmers_bucket
            res = count_kmers_bucket(his, los, 2, capacity, k=k)
        elif strategy == "hashtable":
            from genome_tpu.kernels.hash_table import count_kmers_hashtable
            res = count_kmers_hashtable(his, los, 2, capacity)
        else:
            res = count_kmers_device(his, los, 2, capacity)
        return res["table_hi"], res["table_lo"], res["n_unique"], res["overflow"]

    @jax.jit
    def build(th, tl, n):
        succ, okv_hi, okv_lo = build_graph_device(th, tl, n, k)
        # scalar outputs force real execution even on runtimes where
        # block_until_ready resolves without materializing (axon relay)
        return succ.sum()

    codes_dev = jnp.asarray(all_codes)  # staged once; timed region is compute

    def run():
        th, tl, n_uni, ovf = count(codes_dev)
        n = int(n_uni)  # host sync; then compact the table before build
        # 1/64 rounding granularity: the build join sorts 4*cap2 records,
        # so slack here is the single biggest build cost knob (a 1/8 step
        # padded up to 19% at E. coli scale). Recompiles when n_unique
        # crosses a step boundary; the persistent cache absorbs it.
        step = max(256, 1 << max(0, n.bit_length() - 6))
        cap2 = min(capacity, -(-n // step) * step)
        chk = build(th[:cap2], tl[:cap2], n_uni)
        return n, bool(ovf), int(chk)

    def timed_run():
        t0 = time.perf_counter()
        n_uni, ovf, _ = run()
        return time.perf_counter() - t0, n_uni, ovf

    run()  # warmup: compile everything
    dt, n_uni, ovf = min(timed_run() for _ in range(3))
    if ovf:
        print(json.dumps({"metric": "kmers_per_sec_per_chip", "value": 0,
                          "unit": "kmers/s", "vs_baseline": 0.0,
                          "error": "capacity overflow"}))
        return 1

    n_windows = num_reads * (read_len - k + 1)  # real windows only
    value = n_windows / dt
    target = 0.8 * bw / _RADIX_BYTES_PER_KMER

    # ---- e2e reads -> contigs wall (count+build+simplify+emit), on reads
    # with a 0.2% substitution error rate so simplification has real work.
    # Reported inside the same single JSON line as extra keys.
    codes_err = all_codes.copy()
    err = rng.random((num_reads, read_len)) < 0.002
    nerr = int(err.sum())
    codes_err[:num_reads][err] = (
        (all_codes[:num_reads][err] + rng.integers(1, 4, nerr, dtype=np.uint8))
        % 4)
    from genome_tpu.graph.build import build_graph_device as _bgd
    from genome_tpu.graph.contigs import emit_contigs
    from genome_tpu.graph.simplify import (clip_tips_pass, final_chain_state,
                                           pop_bubbles_pass)
    from genome_tpu.params import AssemblyParams

    params = AssemblyParams(k=k, min_coverage=2)

    @jax.jit
    def count_full(codes):
        his, los = extract_canonical_kmers(codes, k)
        r = count_kmers_device(his, los, 2, capacity)
        return (r["table_hi"], r["table_lo"], r["counts"], r["n_unique"],
                r["overflow"])

    build_jit = jax.jit(lambda a, b, m: _bgd(a, b, m, k))

    def e2e():
        th, tl, cnts, n_uni, _ = count_full(jnp.asarray(codes_err))
        n = int(n_uni)
        step = max(256, 1 << max(0, n.bit_length() - 6))
        cap2 = min(capacity, -(-n // step) * step)
        th, tl, cnts = th[:cap2], tl[:cap2], cnts[:cap2]
        succ, okh, okl = build_jit(th, tl, n_uni)
        alive = jnp.ones((cap2,), dtype=jnp.bool_)
        valid = jnp.arange(cap2, dtype=jnp.int32) < n_uni
        tip_len = jnp.int32(params.tip_len_eff)
        bub_len = jnp.int32(params.bubble_len_eff)
        for _ in range(params.max_rounds):
            alive, c1 = clip_tips_pass(succ, okh, okl, cnts, alive, valid,
                                       tip_len, max_len=params.tip_len_eff)
            alive, c2 = pop_bubbles_pass(succ, okh, okl, cnts, alive, valid,
                                         bub_len,
                                         max_len=params.bubble_len_eff)
            if not (bool(c1) or bool(c2)):
                break
        fs = final_chain_state(succ, okh, okl, cnts, alive, valid)
        return emit_contigs(fs, okh, okl, k, params.min_contig_len)

    contigs = e2e()  # warmup/compile
    t0 = time.perf_counter()
    contigs = e2e()
    e2e_dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "kmers_per_sec_per_chip_count_build",
        "value": round(value),
        "unit": "kmers/s",
        "vs_baseline": round(value / target, 4),
        "e2e_wall_s": round(e2e_dt, 3),
        "e2e_contigs": len(contigs),
        "e2e_bp": sum(map(len, contigs)),
    }))
    print(f"# device={dev.device_kind} windows={n_windows} "
          f"unique={n_uni} wall_s={dt:.3f} hbm_target={target:.3e}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

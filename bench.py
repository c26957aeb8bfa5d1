"""Benchmark harness: headline k-mers/sec/chip for count+build
(BASELINE.json:2). Prints ONE JSON line with:

  value / vs_baseline   — throughput vs the driver-set 80%-of-HBM-radix
                          target (~6.8 G/s on v5e). BENCH.md "roofline
                          reality" shows that target assumes a vector
                          scatter TPUs don't have; it is kept for
                          comparability.
  vs_sort_floor         — throughput vs the MEASURED speed-of-light for
                          any sort/partition-based counter on this chip
                          (~145 M k-mers/s at 88M windows on v5e: a
                          bitonic network needs >= log^2(n)/2 compare
                          stages at the measured 1.2-1.5 T elem-ops/s
                          VPU rate; BENCH.md cycle-level post-mortem).
  e2e_*                 — full reads->contigs wall via the production
                          run_pipeline, decomposed per phase (count/
                          build/simplify/contigs), on reads with a 0.2%
                          error rate so simplification has real work.
  parity_device_sha     — SHA256 of the e2e contig set.
  parity_golden_sha     — same workload through the golden CPU oracle
                          (cached in bench_golden_cache.json keyed by
                          (reads, params-hash); recompute with
                          BENCH_GOLDEN=1 — it only changes when
                          SEMANTICS changes).

Workload: genome_tpu.io.benchdata (E. coli scale: 4.6 Mbp, 100 bp reads,
24x). Timed headline region is extract -> canonical -> count -> build on
pre-staged device codes. Scale with BENCH_SCALE (default 1.0).
"""

import json
import os
import sys
import time

# chip HBM bandwidth table (B/s); fallback is v5e-class
_HBM = {
    "v5e": 819e9, "v5 lite": 819e9, "v5litepod": 819e9,
    "v4": 1228e9, "v5p": 2765e9, "v6e": 1640e9, "v6 lite": 1640e9,
}
_RADIX_BYTES_PER_KMER = 96.0  # 6 passes x (8B read + 8B write), BASELINE.md
# measured sort-based speed-of-light on v5e at 88M windows (BENCH.md
# "roofline reality"); scales ~ with VPU rate, pinned per-chip below
_SORT_FLOOR_KMERS_S = {"v5e": 145e6, "v5 lite": 145e6}
# measured BUILDABLE-construct floor: the fastest count+build any
# construct actually built on this chip achieved is ~0.72 s at 88M
# windows (~122 M/s) — lax.sort's own lower bound after the round-3
# Pallas-sort post-mortem (BENCH.md "Global-sort replacement"). This is
# the stop-condition metric; vs_sort_floor is the theoretical
# stage-count bound no construct reached. BASELINE.md defines both.
_BUILDABLE_FLOOR_KMERS_S = {"v5e": 122e6, "v5 lite": 122e6}


def _detect(table, device, default):
    kind = getattr(device, "device_kind", "").lower()
    for key, v in table.items():
        if key in kind:
            return v
    return default


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
    from genome_tpu.io.benchdata import (bench_workload, codes_to_reads,
                                         contigs_sha, workload_key)
    from genome_tpu.kernels.count import count_kmers_device
    from genome_tpu.kernels.extract import extract_canonical_kmers
    from genome_tpu.params import AssemblyParams

    dev = jax.devices()[0]
    bw = _detect(_HBM, dev, 819e9)
    floor = _detect(_SORT_FLOOR_KMERS_S, dev, 145e6)
    bfloor = _detect(_BUILDABLE_FLOOR_KMERS_S, dev, 122e6)

    # host->device link probe (~100 ms): the axon relay's bandwidth
    # varies ~2x session-over-session and dominates the e2e count phase
    # (BENCH.md round-4 "count-phase residual") — recording it in the
    # artifact lets a reader separate link weather from compute. The sum
    # fetch forces real materialization (block_until_ready can resolve
    # without it on this runtime).
    import numpy as _np
    _pa = _np.arange((4 << 20) // 4, dtype=_np.uint32)
    _ = jax.device_put(_pa).sum().item()  # warm the path
    _best = None
    for _i in range(3):
        _t0 = time.perf_counter()
        _ = jax.device_put(_pa).sum().item()
        _dt = time.perf_counter() - _t0
        _best = _dt if _best is None or _dt < _best else _best
    link_mb_per_s = round(_pa.nbytes / _best / 1e6, 1)

    w = bench_workload(scale)
    k, capacity = w["k"], w["capacity"]

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

    codes_dev = jnp.asarray(w["clean"])  # staged once; timed region is compute

    def run():
        th, tl, n_uni, ovf = count(codes_dev)
        n = int(n_uni)  # host sync; then compact the table before build
        # 1/64 rounding granularity: the build join sorts 4*cap2 records,
        # so slack here is the single biggest build cost knob. Recompiles
        # when n_unique crosses a step; the persistent cache absorbs it.
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

    n_windows = w["n_windows"]  # real windows only
    value = n_windows / dt
    target = 0.8 * bw / _RADIX_BYTES_PER_KMER

    # ---- e2e reads -> contigs through the production pipeline (metrics
    # give the per-phase decomposition; no drift vs the CLI path).
    from genome_tpu.assemble.metrics import Metrics
    from genome_tpu.assemble.pipeline import run_pipeline

    params = AssemblyParams(k=k, min_coverage=2)
    run_pipeline(w["err"], params, capacity=capacity,
                 metrics=Metrics(quiet=True))  # warmup: compile everything
    # min-of-2 timed runs: relay-latency jitter showed 0.2 s emit spread
    # across round-3 driver runs at identical HEAD (VERDICT r3 weak #7)
    e2e_dt, m, res = None, None, None
    for _ in range(2):
        mi = Metrics(quiet=True)
        t0 = time.perf_counter()
        ri = run_pipeline(w["err"], params, capacity=capacity, metrics=mi)
        dt_i = time.perf_counter() - t0
        if e2e_dt is None or dt_i < e2e_dt:
            e2e_dt, m, res = dt_i, mi, ri
    contigs = res["contigs"]
    phases = {e["phase"]: e["wall_s"] for e in m.events
              if e["event"] == "phase_end"}
    contig_ev = next((e for e in m.events if e["event"] == "phase_end"
                      and e["phase"] == "contigs"), {})

    dev_sha = contigs_sha(contigs)

    def _n50(cs):
        ls = sorted(map(len, cs), reverse=True)
        tot, half, acc = sum(ls), sum(ls) / 2, 0
        for x in ls:
            acc += x
            if acc >= half:
                return x
        return 0

    # ---- realistic-repeat workload (rRNA-operon/IS planting, ~1% of
    # genome): the graph actually has collapsed chains and hard bubbles.
    # Same shapes as the legacy workload so compiles are reused.
    # Disable with BENCH_REPEATS=0.
    rep = {}
    if os.environ.get("BENCH_REPEATS", "1") != "0":
        wr = bench_workload(scale, repeats=True)
        run_pipeline(wr["err"], params, capacity=capacity,
                     metrics=Metrics(quiet=True))  # warm (n_unique shifts)
        r_dt, r_m, r_res = None, None, None
        for _ in range(2):
            mi = Metrics(quiet=True)
            t0 = time.perf_counter()
            ri = run_pipeline(wr["err"], params, capacity=capacity,
                              metrics=mi)
            dt_i = time.perf_counter() - t0
            if r_dt is None or dt_i < r_dt:
                r_dt, r_m, r_res = dt_i, mi, ri
        r_contigs = r_res["contigs"]
        r_phases = {e["phase"]: e["wall_s"] for e in r_m.events
                    if e["event"] == "phase_end"}
        r_sha = contigs_sha(r_contigs)
        rep = {
            "repeat_e2e_wall_s": round(r_dt, 3),
            "repeat_contigs": len(r_contigs),
            "repeat_bp": sum(map(len, r_contigs)),
            "repeat_n50": _n50(r_contigs),
            "repeat_count_s": r_phases.get("count"),
            "repeat_simplify_s": r_phases.get("simplify"),
            "repeat_contigs_s": r_phases.get("contigs"),
            "repeat_parity_device_sha": r_sha,
        }

    # ---- golden-parity artifact (BASELINE.json:10): cached golden digest
    golden_sha = None
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_golden_cache.json")
    key = workload_key(w, params.params_hash())
    cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    if key in cache:
        golden_sha = cache[key]
    elif os.environ.get("BENCH_GOLDEN") == "1":
        from genome_tpu.golden import assemble_golden
        reads = codes_to_reads(w["err"], w["num_reads"])
        golden_sha = contigs_sha(assemble_golden(reads, params))
        cache[key] = golden_sha
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    if rep:
        r_key = workload_key(wr, params.params_hash())
        r_golden = cache.get(r_key)
        if r_golden is None and os.environ.get("BENCH_GOLDEN") == "1":
            from genome_tpu.golden import assemble_golden
            reads = codes_to_reads(wr["err"], wr["num_reads"])
            r_golden = contigs_sha(assemble_golden(reads, params))
            cache[r_key] = r_golden
            with open(cache_path, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        rep["repeat_parity_golden_sha"] = r_golden
        rep["repeat_parity_ok"] = (
            None if r_golden is None
            else r_golden == rep["repeat_parity_device_sha"])

    out = {
        "metric": "kmers_per_sec_per_chip_count_build",
        "value": round(value),
        "unit": "kmers/s",
        "link_mb_per_s": link_mb_per_s,
        "vs_baseline": round(value / target, 4),
        "vs_sort_floor": round(value / floor, 4),
        "vs_buildable_floor": round(value / bfloor, 4),
        "e2e_wall_s": round(e2e_dt, 3),
        "e2e_count_s": phases.get("count"),
        "e2e_build_s": phases.get("build"),
        "e2e_simplify_s": phases.get("simplify"),
        "e2e_contigs_s": phases.get("contigs"),
        "e2e_final_s": contig_ev.get("final_s"),
        "e2e_emit_s": contig_ev.get("emit_s"),
        "e2e_contigs": len(contigs),
        "e2e_bp": sum(map(len, contigs)),
        "e2e_n50": _n50(contigs),
        "parity_device_sha": dev_sha,
        "parity_golden_sha": golden_sha,
        "parity_ok": (None if golden_sha is None else golden_sha == dev_sha),
        **rep,
    }
    print(json.dumps(out))
    print(f"# device={dev.device_kind} windows={n_windows} "
          f"unique={n_uni} wall_s={dt:.3f} hbm_target={target:.3e} "
          f"sort_floor={floor:.3e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-process TPU measurement batch (the axon relay charges ~10-14 min
of warmup per fresh process — batch everything once):

1. bench.py main()  — the graded headline + e2e + repeat-workload JSON
2. count-phase probe — instrumented re-run attributing the e2e count
   residual (VERDICT r3 missing #4)

Output: bench JSON line(s) on stdout (bench.py contract), then probe
lines prefixed '[probe]'. Run me on the real chip with no other TPU job.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def main() -> int:
    sys.path.insert(0, REPO)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    rc = bench.main()
    if rc != 0:
        return rc

    # ---- count-phase probe (same process: compiles all warm) ----
    import jax
    from genome_tpu.assemble import pipeline as P
    from genome_tpu.assemble.metrics import Metrics
    from genome_tpu.io.benchdata import bench_workload
    from genome_tpu.params import AssemblyParams

    w = bench_workload(float(os.environ.get("BENCH_SCALE", "1.0")))
    params = AssemblyParams(k=w["k"], min_coverage=2)

    orig_codes = P._extract_stream_codes

    def timed_codes(codes, k, batch_reads, chunk_rows=1 << 21):
        t0 = time.perf_counter()
        r = orig_codes(codes, k, batch_reads, chunk_rows)
        jax.block_until_ready(r)
        print(f"[probe] extract_stream_codes: "
              f"{time.perf_counter()-t0:.3f} s", flush=True)
        return r

    P._extract_stream_codes = timed_codes

    from genome_tpu.kernels import count as C
    orig_count = C.count_kmers_device

    def timed_count(hi, lo, mc, cap, sorter=None):
        t0 = time.perf_counter()
        r = orig_count(hi, lo, mc, cap, sorter)
        jax.block_until_ready(r["counts"])
        print(f"[probe] count_kmers_device(cap={cap}): "
              f"{time.perf_counter()-t0:.3f} s "
              f"n={int(r['n_unique'])}", flush=True)
        return r

    P.count_kmers_device = timed_count

    m = Metrics(quiet=True)
    t0 = time.perf_counter()
    P.run_pipeline(w["err"], params, capacity=w["capacity"], metrics=m)
    dt = time.perf_counter() - t0
    phases = {e["phase"]: round(e["wall_s"], 3) for e in m.events
              if e["event"] == "phase_end"}
    rounds = [(e.get("round"), e.get("wall_s")) for e in m.events
              if e["event"] == "simplify_round"]
    print(f"[probe] timed e2e: {dt:.2f} s phases={phases}", flush=True)
    print(f"[probe] simplify rounds (wall_s): {rounds}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

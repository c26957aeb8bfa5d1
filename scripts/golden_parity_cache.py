"""Populate bench_golden_cache.json: run the golden CPU oracle on the
bench e2e workload and record its contig-set SHA256. Re-run only when
SEMANTICS (or the workload) changes; bench.py then compares the device
pipeline's digest against this cache every round."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from genome_tpu.golden import assemble_golden
from genome_tpu.io.benchdata import (bench_workload, codes_to_reads,
                                     contigs_sha, workload_key)
from genome_tpu.params import AssemblyParams


def main():
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    repeats = os.environ.get("BENCH_REPEATS_GOLDEN") == "1"
    w = bench_workload(scale, repeats=repeats)
    params = AssemblyParams(k=w["k"], min_coverage=2)
    key = workload_key(w, params.params_hash())
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_golden_cache.json")
    cache = {}
    if os.path.exists(path):
        with open(path) as f:
            cache = json.load(f)
    if key in cache and "--force" not in sys.argv:
        print(f"cached: {key} -> {cache[key]}")
        return
    reads = codes_to_reads(w["err"], w["num_reads"])
    t0 = time.time()
    contigs = assemble_golden(reads, params)
    sha = contigs_sha(contigs)
    print(f"golden: {len(contigs)} contigs, {sum(map(len, contigs))} bp, "
          f"{time.time()-t0:.0f}s, sha {sha}")
    cache[key] = sha
    with open(path, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    print(f"wrote {path} [{key}]")


if __name__ == "__main__":
    main()

"""Does the axon relay overlap host->device transfers with device
compute? Measures single-shot count vs K-chunk count with interleaved
pack/put/extract/sort dispatches. Decides whether a chunk-overlapped
count path is worth wiring into the pipeline."""

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


def main():
    from genome_tpu.io.benchdata import bench_workload
    from genome_tpu.io.native.cio import pack_codes_native
    from genome_tpu.kernels.count import count_kmers_device, count_weighted
    from genome_tpu.kernels.extract import (
        SENTINEL, extract_canonical_kmers_packed_nomask)

    w = bench_workload(1.0)
    codes = w["clean"]
    k, cap = w["k"], w["capacity"]
    R, L = codes.shape
    Lp = ((L + 7) // 8) * 8

    def single():
        packed, _inv, _hv = pack_codes_native(
            np.ascontiguousarray(codes), L_out=Lp, rows_out=R)
        hi, lo = extract_canonical_kmers_packed_nomask(
            jnp.asarray(packed), k, Lp, L, jnp.int32(R))
        res = count_kmers_device(hi, lo, 2, cap)
        return int(res["n_unique"])

    def chunked(K):
        rows = -(-R // K)
        rows = -(-rows // 256) * 256
        parts = []
        for i in range(0, R, rows):
            chunk = np.ascontiguousarray(codes[i : i + rows])
            cr = chunk.shape[0]
            rp = rows
            packed, _inv, _hv = pack_codes_native(chunk, L_out=Lp,
                                                  rows_out=rp)
            hi, lo = extract_canonical_kmers_packed_nomask(
                jnp.asarray(packed), k, Lp, L, jnp.int32(cr))
            parts.append(count_kmers_device(hi, lo, 1, cap))
        his, los, ws = [], [], []
        for t in parts:
            v = jnp.arange(cap, dtype=jnp.int32) < t["n_unique"]
            his.append(jnp.where(v, t["table_hi"], SENTINEL))
            los.append(jnp.where(v, t["table_lo"], SENTINEL))
            ws.append(jnp.where(v, t["counts"], 0))
        res = count_weighted(jnp.concatenate(his), jnp.concatenate(los),
                             jnp.concatenate(ws), 2, cap)
        return int(res["n_unique"])

    n0 = single()
    for name, f in [("single", single), ("chunk2", lambda: chunked(2)),
                    ("chunk4", lambda: chunked(4))]:
        f()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = f()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.0f} ms n={n} (match={n == n0})",
              flush=True)


if __name__ == "__main__":
    main()

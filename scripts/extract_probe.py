"""Attribute the e2e count phase with REAL sync points (scalar .item()
forces execution on the axon relay where block_until_ready can resolve
without materializing). TPU."""

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


def force(x):
    return jnp.sum(x[..., -1]).item() if x.ndim else x.item()


def main():
    from genome_tpu.io.benchdata import bench_workload
    from genome_tpu.kernels.count import count_kmers_device
    from genome_tpu.kernels.extract import (extract_canonical_kmers,
                                            extract_canonical_kmers_packed,
                                            pack_codes_host)

    w = bench_workload(1.0)
    codes = w["err"]
    k, capacity = w["k"], w["capacity"]
    L = codes.shape[1]
    Lp = ((L + 7) // 8) * 8
    cr = codes.shape[0]
    step = max(256, 1 << max(0, (cr - 1).bit_length() - 5))
    rpad = -(-cr // step) * step

    def run_once(label, use_packed, rep=2):
        best = {}
        for _ in range(rep + 1):  # first is warmup
            t0 = time.perf_counter()
            buf = np.full((rpad, Lp), 4, dtype=np.uint8)
            buf[:cr, :L] = codes
            t1 = time.perf_counter()
            if use_packed:
                packed, invalid = pack_codes_host(buf)
                t2 = time.perf_counter()
                p_d = jnp.asarray(packed)
                iv_d = jnp.asarray(invalid)
                _ = p_d[0, 0].item()  # force transfer
                t3 = time.perf_counter()
                hi, lo = extract_canonical_kmers_packed(p_d, iv_d, k, Lp)
            else:
                t2 = time.perf_counter()
                c_d = jnp.asarray(buf)
                _ = c_d[0, 0].item()
                t3 = time.perf_counter()
                hi, lo = extract_canonical_kmers(c_d, k)
            _ = hi[-1].item()  # force extraction
            t4 = time.perf_counter()
            res = count_kmers_device(hi, lo, 2, capacity)
            n = int(res["n_unique"])
            t5 = time.perf_counter()
            d = dict(hostpad=t1 - t0, pack=t2 - t1, xfer=t3 - t2,
                     extract=t4 - t3, count=t5 - t4, total=t5 - t0)
            for kk, v in d.items():
                best[kk] = min(best.get(kk, 9e9), v)
        print(f"{label}: " + " ".join(f"{kk}={v*1e3:.0f}ms"
                                      for kk, v in best.items()) +
              f" n={n}", flush=True)

    run_once("packed path", True)
    run_once("raw-codes path", False)


if __name__ == "__main__":
    main()

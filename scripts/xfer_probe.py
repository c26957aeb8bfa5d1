"""Host->device transfer granularity + dispatch latency on the axon
relay (forced syncs). Decides whether the pipeline should chunk its
wire transfers."""

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
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, size=28 << 20, dtype=np.uint8)  # ~29 MB

    # scalar roundtrip latency
    x = jnp.zeros((8,), jnp.int32)
    _ = x.sum().item()
    for _ in range(2):
        t0 = time.perf_counter()
        _ = x.sum().item()
        print(f"scalar roundtrip: {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)

    def put_whole():
        d = jnp.asarray(a)
        return d.ravel()[-1].item()

    def put_chunks(n):
        parts = np.array_split(a, n)
        ds = [jnp.asarray(p) for p in parts]
        return sum(d.ravel()[-1].item() for d in ds[-1:]) + ds[0].ravel()[0].item()

    for label, f in [("whole 29MB", put_whole),
                     ("4 chunks", lambda: put_chunks(4)),
                     ("16 chunks", lambda: put_chunks(16))]:
        f()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{label}: {dt*1e3:.0f} ms ({a.nbytes/dt/1e6:.0f} MB/s)",
              flush=True)

    # device_put with donation/async: measure put WITHOUT waiting, then a
    # dependent reduce (how the pipeline actually consumes it)
    @jax.jit
    def consume(d):
        return d.astype(jnp.uint32).sum()

    def put_consume():
        d = jnp.asarray(a)
        return int(consume(d))
    put_consume()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        put_consume()
        ts.append(time.perf_counter() - t0)
    print(f"put+consume(jit): {min(ts)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Round-5 one-process TPU measurement batch (the axon relay charges
~10-14 min of warmup per fresh process — batch everything once):

1. bench.py main() at BENCH_SCALE=1 — graded headline + e2e + repeat
   workload + link probe JSON (stdout, bench contract).
2. bench.py main() at BENCH_SCALE=2 — the 2^24-cliff verification: with
   the widened packed ruler schemes, e2e_final_s should be ~2x the
   scale-1 value (round 4 measured 4.2x on the unpacked fallback).
3. scripts/exp_hash_bucket.py main() — the buildable-floor profile +
   hash-bucket attack construct ('[exp]' lines).

Run on the real chip with NO other TPU or CPU job (2-core box: a stray
pytest inflates every phase ~25%, r4 lesson). Output lines are JSON for
the two bench runs plus '[exp]'/'[probe]' prefixed diagnostics.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    bench = _load("bench", os.path.join(REPO, "bench.py"))

    print("[batch] === bench BENCH_SCALE=1 ===", flush=True)
    os.environ["BENCH_SCALE"] = "1.0"
    rc = bench.main()
    if rc != 0:
        return rc

    print("[batch] === bench BENCH_SCALE=2 (cliff check) ===", flush=True)
    os.environ["BENCH_SCALE"] = "2.0"
    os.environ["BENCH_REPEATS"] = "0"  # scale-2: cliff check only
    rc = bench.main()
    if rc != 0:
        print(f"[batch] scale-2 bench rc={rc} (continuing)", flush=True)
    os.environ["BENCH_SCALE"] = "1.0"
    os.environ.pop("BENCH_REPEATS", None)

    print("[batch] === floor probe (exp_hash_bucket) ===", flush=True)
    exp = _load("exp_hash_bucket",
                os.path.join(REPO, "scripts", "exp_hash_bucket.py"))
    return exp.main()


if __name__ == "__main__":
    sys.exit(main())

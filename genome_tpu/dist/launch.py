"""Multi-process SPMD worker/launcher for partitioned assembly.

Worker (one per host/process; BASELINE.json:11 analog):

    python -m genome_tpu.dist.launch --coordinator host0:12355 \
        --num-processes 2 --process-id 0 reads.fastq -o contigs.fasta

Each process reads the SAME input file and takes its own contiguous read
shard (process_id-th of num_processes); process 0 writes the output.
For the localhost fake-cluster CI pattern (SURVEY §4.5), run every
process on one machine with JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="genome_tpu.dist.launch")
    p.add_argument("reads", nargs="+")
    p.add_argument("-o", "--output", default="contigs.fasta")
    p.add_argument("--coordinator", default="localhost:12355")
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--k", type=int, default=21)
    p.add_argument("--min-coverage", type=int, default=2)
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force N virtual CPU devices (testing)")
    args = p.parse_args(argv)

    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.cpu_devices}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    from genome_tpu.dist.multihost import assemble_multihost, initialize
    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    initialize(args.coordinator, args.num_processes, args.process_id)

    from genome_tpu.dist.assemble import shard_reads
    from genome_tpu.io import read_fastx, write_fasta
    from genome_tpu.params import AssemblyParams

    reads = []
    for path in args.reads:
        reads.extend(read_fastx(path))
    local = shard_reads(reads, args.num_processes)[args.process_id]
    params = AssemblyParams(k=args.k, min_coverage=args.min_coverage)
    contigs = assemble_multihost(local, params)
    if args.process_id == 0:
        write_fasta(args.output, contigs)
        print(f"[genome_tpu.dist] wrote {len(contigs)} contigs to "
              f"{args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

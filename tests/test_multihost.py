"""Multi-process (jax.distributed) localhost fake-cluster test
(SURVEY.md §4.5b): 2 processes x 4 virtual CPU devices, contigs must be
identical to the golden single-host result."""

import os
import socket
import subprocess
import sys

import pytest

from genome_tpu.golden import assemble_golden
from genome_tpu.io import random_genome, read_fastx, simulate_reads
from genome_tpu.params import AssemblyParams


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_localhost_assembly(tmp_path):
    reads = simulate_reads(random_genome(600, seed=70), read_len=70,
                           coverage=10, error_rate=0.01, seed=71)
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    out = tmp_path / "contigs.fasta"
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the TPU plugin out of workers
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd()] + env.get("PYTHONPATH", "").split(os.pathsep))

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "genome_tpu.dist.launch", str(fq),
             "-o", str(out), "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--k", "15", "--cpu-devices", "4", "--forbid-replicated"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    params = AssemblyParams(k=15)
    assert read_fastx(out) == assemble_golden(reads, params)

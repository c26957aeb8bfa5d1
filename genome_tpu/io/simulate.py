"""Deterministic read simulator (SURVEY.md §4 fixtures; reference analog:
the E. coli simulated test read sets, BASELINE.json:7,10).

Seeded numpy Generator end to end: same seed -> same genome/reads on any
platform."""

from __future__ import annotations

import numpy as np

from genome_tpu.utils import dna

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(length: int, seed: int = 0, gc: float = 0.5) -> str:
    """Uniform-ish random genome string of the given length."""
    rng = np.random.default_rng(seed)
    p_at = (1.0 - gc) / 2
    p_gc = gc / 2
    codes = rng.choice(4, size=length, p=[p_at, p_gc, p_gc, p_at])
    return _BASES[codes].tobytes().decode("ascii")


def simulate_reads(
    genome: str,
    read_len: int = 100,
    coverage: float = 30.0,
    error_rate: float = 0.0,
    circular: bool = False,
    seed: int = 0,
    rc_fraction: float = 0.5,
) -> list[str]:
    """Uniformly sampled reads with optional substitution errors.

    Reads are sampled from both strands (each read reverse-complemented with
    probability rc_fraction). For circular genomes reads may wrap the origin.
    """
    rng = np.random.default_rng(seed)
    g = dna.encode(genome)
    n = len(g)
    if n < read_len and not circular:
        raise ValueError("genome shorter than read length")
    num_reads = int(np.ceil(coverage * n / read_len))
    if circular:
        starts = rng.integers(0, n, size=num_reads)
        idx = (starts[:, None] + np.arange(read_len)[None, :]) % n
        reads = g[idx]
    else:
        starts = rng.integers(0, n - read_len + 1, size=num_reads)
        reads = g[starts[:, None] + np.arange(read_len)[None, :]]
    reads = reads.astype(np.uint8)

    if error_rate > 0:
        err = rng.random(reads.shape) < error_rate
        # substitute with a *different* base: add 1..3 mod 4
        bump = rng.integers(1, 4, size=reads.shape).astype(np.uint8)
        reads = np.where(err, (reads + bump) % 4, reads)

    flip = rng.random(num_reads) < rc_fraction
    out: list[str] = []
    for i in range(num_reads):
        s = _BASES[reads[i]].tobytes().decode("ascii")
        out.append(dna.revcomp_str(s) if flip[i] else s)
    return out

"""Golden (NumPy) assembler vs tiny (pure Python) oracle — exact contig
equality across random fixtures, plus property tests (SURVEY.md §4 tier 1)."""

import numpy as np
import pytest

from genome_tpu.golden import assemble_golden, assemble_tiny, count_canonical_kmers
from genome_tpu.golden.tiny import count_kmers as tiny_count
from genome_tpu.io import random_genome, simulate_reads
from genome_tpu.params import AssemblyParams
from genome_tpu.utils import dna


def _case(seed, glen, read_len, coverage, error_rate, circular, k, mincov):
    g = random_genome(glen, seed=seed)
    reads = simulate_reads(g, read_len=read_len, coverage=coverage,
                           error_rate=error_rate, circular=circular, seed=seed + 1)
    params = AssemblyParams(k=k, min_coverage=mincov)
    return g, reads, params


CASES = [
    # seed glen rlen cov err circ k mincov
    (0, 300, 50, 10, 0.00, False, 11, 1),
    (1, 500, 60, 15, 0.01, False, 11, 2),
    (2, 400, 50, 20, 0.02, False, 9, 2),
    (3, 600, 80, 12, 0.00, True, 13, 1),
    (4, 800, 70, 18, 0.015, True, 15, 2),
    (5, 200, 40, 25, 0.03, False, 7, 2),
    (6, 1000, 100, 10, 0.005, False, 21, 1),
    (7, 350, 50, 15, 0.01, False, 5, 3),
]


@pytest.mark.parametrize("case", CASES, ids=[f"case{c[0]}" for c in CASES])
def test_golden_matches_tiny(case):
    _, reads, params = _case(*case)
    assert assemble_golden(reads, params) == assemble_tiny(reads, params)


def test_counting_matches_tiny():
    _, reads, params = _case(1, 500, 60, 15, 0.01, False, 11, 1)
    kmers, counts = count_canonical_kmers(reads, params.k, 1)
    expect = tiny_count(reads, params.k)
    got = {dna.kmer_to_str(int(v), params.k): int(c) for v, c in zip(kmers, counts)}
    assert got == dict(expect)


def test_counting_chunked_merge_identical():
    _, reads, params = _case(2, 2000, 80, 10, 0.01, False, 15, 1)
    a = count_canonical_kmers(reads, params.k, 2)
    b = count_canonical_kmers(reads, params.k, 2, chunk_kmers=1000)
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


def test_perfect_linear_reconstruction():
    # Error-free reads reconstruct one contig spanning the genome except the
    # (undersampled) extreme ends, which may lose a few bases of coverage.
    g = random_genome(1500, seed=42)
    reads = simulate_reads(g, read_len=100, coverage=30, error_rate=0.0, seed=43)
    params = AssemblyParams(k=21, min_coverage=1)
    contigs = assemble_golden(reads, params)
    assert len(contigs) == 1
    c = contigs[0]
    assert c in g or dna.revcomp_str(c) in g
    assert len(c) >= len(g) - 2 * 100


def test_perfect_circular_reconstruction():
    n, k = 1200, 21
    g = random_genome(n, seed=7)
    reads = simulate_reads(g, read_len=100, coverage=30, error_rate=0.0,
                           circular=True, seed=8)
    params = AssemblyParams(k=k, min_coverage=1)
    contigs = assemble_golden(reads, params)
    assert len(contigs) == 1
    assert len(contigs[0]) == n + k - 1  # cycle emitted linearly (SEMANTICS §6)
    # every contig k-mer is a genome k-mer (wrapping)
    genome_kmers = set(tiny_count([g + g[: k - 1]], k))
    contig_kmers = set(tiny_count([contigs[0]], k))
    assert contig_kmers <= genome_kmers


def test_rc_invariance():
    _, reads, params = _case(4, 800, 70, 18, 0.015, True, 15, 2)
    rc_reads = [dna.revcomp_str(r) for r in reads]
    assert assemble_golden(reads, params) == assemble_golden(rc_reads, params)


def test_read_order_invariance():
    _, reads, params = _case(1, 500, 60, 15, 0.01, False, 11, 2)
    rng = np.random.default_rng(99)
    shuffled = list(reads)
    rng.shuffle(shuffled)
    assert assemble_golden(reads, params) == assemble_golden(shuffled, params)


def test_contigs_are_walks_of_surviving_kmers():
    _, reads, params = _case(2, 400, 50, 20, 0.02, False, 9, 2)
    kmers, _ = count_canonical_kmers(reads, params.k, params.min_coverage)
    surviving = set(kmers.tolist())
    for contig in assemble_golden(reads, params):
        w = dna.canonical_kmers_of_read(contig, params.k)
        assert set(w.tolist()) <= surviving


def test_n_bases_dropped():
    reads = ["ACGTNACGTACGT", "NNNN", "ACG"]
    kmers, counts = count_canonical_kmers(reads, 5, 1)
    expect = tiny_count(reads, 5)
    got = {dna.kmer_to_str(int(v), 5): int(c) for v, c in zip(kmers, counts)}
    assert got == dict(expect)


def test_empty_input():
    params = AssemblyParams(k=11, min_coverage=2)
    assert assemble_golden([], params) == []
    assert assemble_golden(["ACGT"], params) == []  # shorter than k


def test_tip_is_clipped():
    # Perfect reads plus one low-coverage dangling branch -> identical output
    g = random_genome(900, seed=11)
    reads = simulate_reads(g, read_len=90, coverage=25, error_rate=0.0, seed=12)
    params = AssemblyParams(k=15, min_coverage=1)
    base = assemble_golden(reads, params)
    # a read that matches the genome then diverges (forms a tip branch)
    tip_read = g[100:140] + "ACGTACGTAC"
    with_tip = assemble_golden(reads + [tip_read], params)
    assert with_tip == base == assemble_tiny(reads + [tip_read], params)

"""Device-side contig emission vs the host path — exact equality
(the device path is the production emitter; the host path is the oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from genome_tpu.graph.build import build_graph_device
from genome_tpu.graph.contigs import emit_contigs, emit_contigs_device
from genome_tpu.graph.simplify import final_chain_state, simplify_device
from genome_tpu.io import random_genome, simulate_reads
from genome_tpu.kernels import u64
from genome_tpu.golden.assembler import count_canonical_kmers
from genome_tpu.params import AssemblyParams

from tests.test_golden import CASES, _case


def _final_state(reads, params, cap_pad=0):
    kmers, counts = count_canonical_kmers(reads, params.k,
                                          params.min_coverage)
    cap = kmers.size + cap_pad
    th = np.zeros(cap, np.uint32)
    tl = np.zeros(cap, np.uint32)
    th[: kmers.size], tl[: kmers.size] = u64.from_u64_np(kmers)
    cnt = np.zeros(cap, np.uint32)
    cnt[: kmers.size] = counts
    succ, okh, okl = build_graph_device(
        jnp.asarray(th), jnp.asarray(tl), jnp.int32(kmers.size), params.k)
    valid = jnp.arange(cap, dtype=jnp.int32) < kmers.size
    alive = jnp.ones((cap,), jnp.bool_)
    alive = simplify_device(succ, okh, okl, jnp.asarray(cnt), alive, valid,
                            params)
    fs = final_chain_state(succ, okh, okl, jnp.asarray(cnt), alive, valid)
    return fs, okh, okl


@pytest.mark.parametrize("case", CASES, ids=[f"case{c[0]}" for c in CASES])
def test_device_emission_matches_host(case):
    _, reads, params = _case(*case)
    # pad capacity to a multiple of 8 so n2 % 16 == 0 (device-path gate)
    kmers, _ = count_canonical_kmers(reads, params.k, params.min_coverage)
    pad = (-kmers.size) % 8
    fs, okh, okl = _final_state(reads, params, cap_pad=pad)
    host = emit_contigs(fs, okh, okl, params.k, params.min_contig_len)
    dev = emit_contigs_device(fs, okh, okl, params.k, params.min_contig_len)
    assert dev == host


def test_device_emission_overflow_retry_and_min_len():
    _, reads, params = _case(1, 500, 60, 15, 0.01, False, 11, 2)
    kmers, _ = count_canonical_kmers(reads, params.k, params.min_coverage)
    pad = (-kmers.size) % 8
    fs, okh, okl = _final_state(reads, params, cap_pad=pad)
    host = emit_contigs(fs, okh, okl, params.k, 30)
    # contig_cap=... tiny forces the overflow-retry doubling path
    dev = emit_contigs_device(fs, okh, okl, params.k, 30, contig_cap=1)
    assert dev == host


def test_device_emission_fallback_on_indivisible_capacity():
    _, reads, params = _case(2, 400, 50, 20, 0.02, False, 9, 2)
    kmers, _ = count_canonical_kmers(reads, params.k, params.min_coverage)
    # force n2 % 16 != 0 -> host fallback, still identical
    pad = (-kmers.size) % 8 + 1
    fs, okh, okl = _final_state(reads, params, cap_pad=pad)
    host = emit_contigs(fs, okh, okl, params.k)
    dev = emit_contigs_device(fs, okh, okl, params.k)
    assert dev == host


def test_device_emission_circular():
    g = random_genome(900, seed=31)
    reads = simulate_reads(g, read_len=90, coverage=25, error_rate=0.0,
                           circular=True, seed=32)
    params = AssemblyParams(k=13, min_coverage=1)
    kmers, _ = count_canonical_kmers(reads, params.k, params.min_coverage)
    pad = (-kmers.size) % 8
    fs, okh, okl = _final_state(reads, params, cap_pad=pad)
    host = emit_contigs(fs, okh, okl, params.k)
    dev = emit_contigs_device(fs, okh, okl, params.k)
    assert dev == host
    assert len(dev) == 1


def test_device_emission_empty():
    z = jnp.zeros((0,), jnp.int32)
    fs = dict(head=z, dist=z, primary=z.astype(jnp.bool_),
              alive_o=z.astype(jnp.bool_))
    assert emit_contigs_device(fs, z.astype(jnp.uint32),
                               z.astype(jnp.uint32), 11) == []

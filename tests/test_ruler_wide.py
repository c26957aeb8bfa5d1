"""Widened packed ruler-ranking schemes (graph/simplify.py _PACK_SCHEMES).

The round-4 cliff: past 2^24 oriented ids the packed single-gather
phase-1 doubling no longer fit (p:24 | d:8 in one u32) and the final
phase ran unpacked at ~4x cost. The ladder adds (25-bit, 7-bit-dist) and
(26-bit, stride-8, 6-bit-dist) schemes. These tests drive every scheme
point — including saturation fix-up and the unpacked redo — on synthetic
chain graphs small enough for CPU, checked against a NumPy walk oracle.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from genome_tpu.graph.simplify import (_PACK_SCHEMES, _rank_rulers,
                                       _rank_rulers_impl)


def _chains_links(chains, n2):
    """prev_u/next_u arrays from explicit node-id chains."""
    prev_u = np.full(n2, -1, np.int32)
    next_u = np.full(n2, -1, np.int32)
    for ch in chains:
        for a, b in zip(ch, ch[1:]):
            next_u[a] = b
            prev_u[b] = a
    return jnp.asarray(next_u), jnp.asarray(prev_u)


def _oracle(chains, n2):
    head = np.arange(n2, dtype=np.int32)
    dist = np.zeros(n2, np.int32)
    for ch in chains:
        for i, v in enumerate(ch):
            head[v] = ch[0]
            dist[v] = i
    return head, dist


def _random_chains(rng, n2, n_chains):
    ids = rng.permutation(n2)
    cuts = np.sort(rng.choice(n2 - 1, size=n_chains - 1, replace=False) + 1)
    return [list(ids[a:b]) for a, b in
            zip(np.concatenate([[0], cuts]), np.concatenate([cuts, [n2]]))]


@pytest.mark.parametrize("scheme", _PACK_SCHEMES, ids=lambda s: f"b{s[0]}")
def test_scheme_matches_oracle_random(scheme):
    _, stride, d_bits, sat_k = scheme
    rng = np.random.default_rng(scheme[0])
    n2 = 4096
    chains = _random_chains(rng, n2, 37)
    nxt, prv = _chains_links(chains, n2)
    oh, od = _oracle(chains, n2)
    head, dist, ok = _rank_rulers_impl(nxt, prv, stride, d_bits, sat_k,
                                       packed=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(head), oh)
    np.testing.assert_array_equal(np.asarray(dist), od)


@pytest.mark.parametrize("scheme", _PACK_SCHEMES, ids=lambda s: f"b{s[0]}")
def test_scheme_saturation_fixup(scheme):
    """A chain routed through non-ruler ids for > 2^d_bits steps forces
    distance saturation; the fix-up walk must restore exact values."""
    _, stride, d_bits, sat_k = scheme
    n2 = 8192
    sat = (1 << d_bits) - 1
    # ids that are never rulers (id % stride != 0), run length > 2*sat
    pool = [i for i in range(1, n2) if i % stride != 0]
    long_chain = pool[: 2 * sat + 40]
    rng = np.random.default_rng(7)
    rest = sorted(set(range(n2)) - set(long_chain))
    other = _random_chains(rng, len(rest), 11)
    chains = [long_chain] + [[rest[i] for i in ch] for ch in other]
    nxt, prv = _chains_links(chains, n2)
    oh, od = _oracle(chains, n2)
    head, dist, ok = _rank_rulers_impl(nxt, prv, stride, d_bits, sat_k,
                                       packed=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(head), oh)
    np.testing.assert_array_equal(np.asarray(dist), od)


def test_sat_buffer_overflow_falls_back_unpacked():
    """sat_k=1 with many saturated nodes -> fix-up reports not-ok and the
    unpacked redo still produces exact results."""
    _, stride, d_bits, _ = _PACK_SCHEMES[0]
    n2 = 8192
    sat = (1 << d_bits) - 1
    pool = [i for i in range(1, n2) if i % stride != 0]
    chains = [pool[: 2 * sat + 40]]
    nxt, prv = _chains_links(chains, n2)
    oh, od = _oracle(chains, n2)
    head, dist, ok = _rank_rulers_impl(nxt, prv, stride, d_bits, sat_k=1,
                                       packed=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(head), oh)
    np.testing.assert_array_equal(np.asarray(dist), od)


def test_cycle_reports_not_ok():
    n2 = 1024
    cyc = [5, 9, 33, 47, 12, 5]  # closed walk (last == first)
    prev_u = np.full(n2, -1, np.int32)
    next_u = np.full(n2, -1, np.int32)
    for a, b in zip(cyc, cyc[1:]):
        next_u[a] = b
        prev_u[b] = a
    _, _, ok = _rank_rulers(jnp.asarray(next_u), jnp.asarray(prev_u))
    assert not bool(ok)


def test_dispatch_matches_across_schemes():
    """All scheme points agree with each other and the unpacked path on
    the same graph (the dispatch in _rank_rulers only changes cost)."""
    rng = np.random.default_rng(3)
    n2 = 4096
    chains = _random_chains(rng, n2, 23)
    nxt, prv = _chains_links(chains, n2)
    ref = None
    for _, stride, d_bits, sat_k in _PACK_SCHEMES:
        for packed in (True, False):
            h, d, ok = _rank_rulers_impl(nxt, prv, stride, d_bits, sat_k,
                                         packed)
            assert bool(ok)
            if ref is None:
                ref = (np.asarray(h), np.asarray(d))
            else:
                np.testing.assert_array_equal(np.asarray(h), ref[0])
                np.testing.assert_array_equal(np.asarray(d), ref[1])

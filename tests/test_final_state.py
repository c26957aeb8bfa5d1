"""Ruler-based final chain state vs the dense doubling oracle — exact
(head, dist, primary) equality on paths, cycles, and assembled graphs."""

import jax.numpy as jnp
import numpy as np
import pytest

from genome_tpu.graph.simplify import (_chain_state, _rank_rulers,
                                       final_chain_state)
from genome_tpu.kernels import u64


def _random_chain_graph(rng, n_nodes, n_chains, with_cycle=False):
    """Build a synthetic next/prev structure as a permutation of ids split
    into chains; returns (next_u, prev_u) oriented-id arrays of size n2
    where only even ids participate (odd = untouched twins)."""
    n2 = 2 * n_nodes
    perm = rng.permutation(n_nodes) * 2  # even oriented ids
    next_u = np.full(n2, -1, np.int32)
    cuts = np.sort(rng.choice(np.arange(1, n_nodes), n_chains - 1,
                              replace=False)) if n_chains > 1 else np.array([], int)
    segs = np.split(perm, cuts)
    for si, s in enumerate(segs):
        for a, b in zip(s[:-1], s[1:]):
            next_u[a] = b
        if with_cycle and si == 0 and len(s) > 2:
            next_u[s[-1]] = s[0]
    prev_u = np.full(n2, -1, np.int32)
    for v in range(n2):
        if next_u[v] >= 0:
            prev_u[next_u[v]] = v
    return jnp.asarray(next_u), jnp.asarray(prev_u)


def _dense_rank(next_u, prev_u):
    """Reference ranking by sequential walk (numpy)."""
    nxt = np.asarray(next_u)
    prv = np.asarray(prev_u)
    n2 = nxt.shape[0]
    head = np.arange(n2, dtype=np.int32)
    dist = np.zeros(n2, np.int32)
    for h in range(n2):
        if prv[h] >= 0:
            continue
        v, d = h, 0
        while True:
            head[v], dist[v] = h, d
            v = nxt[v]
            if v < 0:
                break
            d += 1
    return head, dist


@pytest.mark.parametrize("seed,n,chains", [(0, 50, 1), (1, 300, 7),
                                           (2, 1000, 40), (3, 64, 64)])
def test_ruler_rank_matches_walk(seed, n, chains):
    rng = np.random.default_rng(seed)
    next_u, prev_u = _random_chain_graph(rng, n, chains)
    head, dist, ok = _rank_rulers(next_u, prev_u)
    assert bool(ok)
    eh, ed = _dense_rank(next_u, prev_u)
    assert (np.asarray(head) == eh).all()
    assert (np.asarray(dist) == ed).all()


def test_ruler_rank_detects_cycle():
    rng = np.random.default_rng(5)
    next_u, prev_u = _random_chain_graph(rng, 400, 3, with_cycle=True)
    _, _, ok = _rank_rulers(next_u, prev_u)
    assert not bool(ok)


def test_final_state_matches_dense_oracle():
    """final_chain_state (ruler fast path) == dense _chain_state-derived
    state on an assembled real graph."""
    from genome_tpu.golden.assembler import count_canonical_kmers
    from genome_tpu.graph.build import build_graph_device
    from genome_tpu.io import random_genome, simulate_reads

    for seed, circular in [(11, False), (12, True)]:
        k = 13
        reads = simulate_reads(random_genome(900, seed=seed), read_len=90,
                               coverage=20, error_rate=0.01,
                               circular=circular, seed=seed + 1)
        kmers, counts = count_canonical_kmers(reads, k, 2)
        cap = kmers.size + (-kmers.size) % 8
        th = np.zeros(cap, np.uint32)
        tl = np.zeros(cap, np.uint32)
        th[: kmers.size], tl[: kmers.size] = u64.from_u64_np(kmers)
        cnt = np.zeros(cap, np.uint32)
        cnt[: kmers.size] = counts
        succ, okh, okl = build_graph_device(
            jnp.asarray(th), jnp.asarray(tl), jnp.int32(kmers.size), k)
        valid = jnp.arange(cap, dtype=jnp.int32) < kmers.size
        alive = jnp.ones((cap,), jnp.bool_)
        fs = final_chain_state(succ, okh, okl, jnp.asarray(cnt), alive, valid)
        st = _chain_state(succ, okh, okl, jnp.asarray(cnt), alive, valid)
        ids = jnp.arange(2 * cap, dtype=jnp.int32)
        primary = st["is_head"] & u64.le(okh[ids], okl[ids],
                                         st["twin_hi"], st["twin_lo"])
        assert (np.asarray(fs["head"]) == np.asarray(st["head"])).all()
        assert (np.asarray(fs["dist"]) == np.asarray(st["dist"])).all()
        assert (np.asarray(fs["primary"]) == np.asarray(primary)).all()


@pytest.mark.parametrize("seed,n,chains", [(0, 50, 1), (1, 300, 7),
                                           (2, 1000, 40), (3, 64, 64)])
def test_unrolled_rank_matches_walk(seed, n, chains):
    from genome_tpu.graph.simplify import _rank_rulers_unrolled
    rng = np.random.default_rng(seed)
    next_u, prev_u = _random_chain_graph(rng, n, chains)
    head, dist, ok = _rank_rulers_unrolled(next_u, prev_u)
    eh, ed = _dense_rank(next_u, prev_u)
    assert bool(ok)
    sel = np.asarray(prev_u) >= 0
    sel |= np.asarray(next_u) >= 0
    assert (np.asarray(head)[sel] == eh[sel]).all()
    assert (np.asarray(dist)[sel] == ed[sel]).all()


def test_unrolled_rank_detects_cycle():
    from genome_tpu.graph.simplify import _rank_rulers_unrolled
    rng = np.random.default_rng(5)
    next_u, prev_u = _random_chain_graph(rng, 200, 4, with_cycle=True)
    _, _, ok = _rank_rulers_unrolled(next_u, prev_u)
    assert not bool(ok)


def test_ruler_rank_saturated_gap_exact():
    """A chain with 400+ consecutive non-ruler ids saturates the packed
    8-bit phase-1 distance; the walk fix-up must restore exact (head,
    dist) (graph/simplify.py _phase1_sat_fixup)."""
    n_nodes = 4000
    n2 = 2 * n_nodes
    # chain over even oriented ids 2*i with i % 8 != 0 (never a ruler):
    ids = [2 * i for i in range(1, n_nodes) if i % 8][:420]
    next_u = np.full(n2, -1, np.int32)
    for a, b in zip(ids[:-1], ids[1:]):
        next_u[a] = b
    prev_u = np.full(n2, -1, np.int32)
    for v in range(n2):
        if next_u[v] >= 0:
            prev_u[next_u[v]] = v
    head, dist, ok = _rank_rulers(jnp.asarray(next_u), jnp.asarray(prev_u))
    eh, ed = _dense_rank(jnp.asarray(next_u), jnp.asarray(prev_u))
    assert bool(ok)
    sel = (prev_u >= 0) | (next_u >= 0)
    assert (np.asarray(head)[sel] == eh[sel]).all()
    assert (np.asarray(dist)[sel] == ed[sel]).all()
    assert ed[sel].max() >= 300  # the fixture really exceeds the 8-bit cap

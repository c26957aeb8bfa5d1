"""Walk-pass candidate-buffer ladder: force every rung (tiny M -> bigger
M -> dense fallback) and assert each produces the dense passes' exact
result. This makes the escalation branches and the dense passes —
otherwise dead-until-overflow in CI — load-bearing tested code."""

import jax.numpy as jnp
import numpy as np

from genome_tpu.golden.assembler import count_canonical_kmers
from genome_tpu.graph.build import build_graph_device
from genome_tpu.graph.simplify import (clip_tips_pass, clip_tips_pass_dense,
                                       pop_bubbles_pass,
                                       pop_bubbles_pass_dense)
from genome_tpu.io import random_genome, simulate_reads
from genome_tpu.kernels import u64
from genome_tpu.params import AssemblyParams


def _graph(seed=17, glen=1500, err=0.02, k=13):
    """Error-heavy fixture: plenty of tips AND bubbles, many chain heads."""
    reads = simulate_reads(random_genome(glen, seed=seed), read_len=80,
                           coverage=25, error_rate=err, seed=seed + 1)
    params = AssemblyParams(k=k, min_coverage=2)
    kmers, counts = count_canonical_kmers(reads, k, params.min_coverage)
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
    return succ, okh, okl, jnp.asarray(cnt), alive, valid, params


def _n_heads(succ, alive, valid):
    from genome_tpu.graph.simplify import _degrees, _links
    alive_o = jnp.repeat(alive & valid, 2)
    outdeg, usucc = _degrees(succ, alive_o)
    _, prev_u = _links(outdeg, usucc)
    return int((alive_o & (prev_u < 0)).sum())


def test_ladder_every_rung_matches_dense():
    succ, okh, okl, cnt, alive, valid, params = _graph()
    tip_len = jnp.int32(params.tip_len_eff)
    bub_len = jnp.int32(params.bubble_len_eff)
    nh = _n_heads(succ, alive, valid)
    assert nh > 8, "fixture must have many chain heads"
    small = 1 << max(1, (nh // 4).bit_length() - 1)  # overflows
    big = 1 << nh.bit_length()                       # fits

    ad, cd = clip_tips_pass_dense(succ, okh, okl, cnt, alive, valid,
                                  tip_len, max_len=params.tip_len_eff)
    for ladder in [(big,),               # first rung fits
                   (small, big),         # rung 1 overflows -> rung 2
                   (small,),             # all rungs overflow -> dense
                   (small, small)]:      # both rungs overflow -> dense
        a, c = clip_tips_pass(succ, okh, okl, cnt, alive, valid, tip_len,
                              max_len=params.tip_len_eff, walk_m=ladder)
        assert bool(c) == bool(cd), ladder
        assert np.array_equal(np.asarray(a), np.asarray(ad)), ladder

    # bubbles on the post-tip graph (more candidate variety)
    bd, cbd = pop_bubbles_pass_dense(succ, okh, okl, cnt, ad, valid,
                                     bub_len, max_len=params.bubble_len_eff)
    nh2 = _n_heads(succ, ad, valid)
    small2 = 1 << max(1, (nh2 // 4).bit_length() - 1)
    big2 = 1 << nh2.bit_length()
    for ladder in [(big2,), (small2, big2), (small2,)]:
        b, cb = pop_bubbles_pass(succ, okh, okl, cnt, ad, valid, bub_len,
                                 max_len=params.bubble_len_eff,
                                 walk_m=ladder)
        assert bool(cb) == bool(cbd), ladder
        assert np.array_equal(np.asarray(b), np.asarray(bd)), ladder
    assert bool(cd) and bool(cbd), "fixture must exercise real kills"


def test_full_simplify_fixpoint_ladder_invariant():
    """Entire fixpoint loop under a forced tiny first rung == default."""
    from genome_tpu.graph.simplify import simplify_device

    succ, okh, okl, cnt, alive, valid, params = _graph(seed=23, glen=1000)
    ref = simplify_device(succ, okh, okl, cnt, alive, valid, params)

    # monkeypatch-free: drive the loop manually with a tiny ladder
    tip_len = jnp.int32(params.tip_len_eff)
    bub_len = jnp.int32(params.bubble_len_eff)
    a = alive
    for _ in range(params.max_rounds):
        a, c1 = clip_tips_pass(succ, okh, okl, cnt, a, valid, tip_len,
                               max_len=params.tip_len_eff, walk_m=(2,))
        a, c2 = pop_bubbles_pass(succ, okh, okl, cnt, a, valid, bub_len,
                                 max_len=params.bubble_len_eff, walk_m=(2,))
        if not (bool(c1) or bool(c2)):
            break
    assert np.array_equal(np.asarray(a), np.asarray(ref))


def test_incremental_degrees_and_links_match_dense():
    """run_pass_inc's carried (outdeg, usucc) AND (next_u, prev_u) ==
    dense recompute after every pass (dead rows included)."""
    import jax.numpy as jnp
    from genome_tpu.graph.simplify import (_degrees_jit, _links_jit,
                                           run_pass_inc)

    succ, okh, okl, cnt, alive, valid, params = _graph(seed=29, glen=1800,
                                                       err=0.025)
    tip_len = jnp.int32(params.tip_len_eff)
    bub_len = jnp.int32(params.bubble_len_eff)
    deg = None
    lc = None
    for rnd in range(6):
        for kind, thr, ml in [("tips", tip_len, params.tip_len_eff),
                              ("bubbles", bub_len, params.bubble_len_eff)]:
            alive, ch, _links, deg, lc = run_pass_inc(
                kind, succ, okh, okl, cnt, alive, valid, thr, ml, deg, lc)
            assert deg is not None, "kill overflow unexpected at this scale"
            assert lc is not None, "link overflow unexpected at this scale"
            od_d, us_d = _degrees_jit(succ, alive, valid)
            assert np.array_equal(np.asarray(deg[0]), np.asarray(od_d)), \
                (rnd, kind, "outdeg")
            assert np.array_equal(np.asarray(deg[1]), np.asarray(us_d)), \
                (rnd, kind, "usucc")
            nx_d, pv_d = _links_jit(od_d, us_d)
            assert np.array_equal(np.asarray(lc[0]), np.asarray(nx_d)), \
                (rnd, kind, "next_u")
            assert np.array_equal(np.asarray(lc[1]), np.asarray(pv_d)), \
                (rnd, kind, "prev_u")
        if not bool(ch):
            break


def test_incremental_loop_matches_dense_loop():
    """simplify_device (incremental) == pure dense pass loop."""
    import jax.numpy as jnp
    from genome_tpu.graph.simplify import (clip_tips_pass_dense,
                                           pop_bubbles_pass_dense,
                                           simplify_device)

    succ, okh, okl, cnt, alive0, valid, params = _graph(seed=31, glen=1200)
    got = simplify_device(succ, okh, okl, cnt, alive0, valid, params)
    a = alive0
    tip_len = jnp.int32(params.tip_len_eff)
    bub_len = jnp.int32(params.bubble_len_eff)
    for _ in range(params.max_rounds):
        a, c1 = clip_tips_pass_dense(succ, okh, okl, cnt, a, valid, tip_len,
                                     max_len=params.tip_len_eff)
        a, c2 = pop_bubbles_pass_dense(succ, okh, okl, cnt, a, valid,
                                       bub_len,
                                       max_len=params.bubble_len_eff)
        if not (bool(c1) or bool(c2)):
            break
    assert np.array_equal(np.asarray(got), np.asarray(a))

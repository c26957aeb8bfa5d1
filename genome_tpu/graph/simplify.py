"""T2: graph simplification under jit (SURVEY.md §3.3, BASELINE.json:5).

Reference analog: worklist/DFS tip clipping, bubble popping and unitig
compaction mutating a JVM object graph. TPU-native: data-parallel masked
passes over static-capacity arrays — chain decomposition is pointer
*doubling* (O(log n) gather rounds instead of sequential walks), tips and
bubbles are per-chain predicates + scatter kills, and the fixpoint loop
runs in host Python with device changed-flags (SEMANTICS §5 pins).

All shapes are static in the table capacity C; n_unique is dynamic.
Oriented node ids v = 2*i + s as in SEMANTICS §3; `rc(v) = v ^ 1`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from genome_tpu.kernels import u64

I32 = jnp.int32
U32 = jnp.uint32


def _degrees(succ, alive_o):
    """outdeg + unique-successor per oriented node against alive mask."""
    tgt = succ  # [2C, 4]
    ok = (tgt >= 0) & alive_o[jnp.clip(tgt, 0, None)] & alive_o[:, None]
    outdeg = ok.sum(axis=1, dtype=I32)
    usucc = jnp.where(ok, tgt, -1).max(axis=1)
    return outdeg, usucc


def _links(outdeg, usucc):
    """next/prev unique-link arrays (SEMANTICS §4)."""
    n2 = outdeg.shape[0]
    ids = jnp.arange(n2, dtype=I32)
    has = outdeg == 1
    w = jnp.where(has, usucc, 0)
    next_u = jnp.where(has & (outdeg[w ^ 1] == 1), w, -1)
    nx = next_u[ids ^ 1]
    prev_u = jnp.where(nx >= 0, nx ^ 1, -1)
    return next_u, prev_u


def _chain_state(succ, okv_hi, okv_lo, counts, alive, valid_node,
                 max_len: int | None = None):
    """Chain decomposition by pointer doubling. Returns per-oriented-node
    and per-head arrays (all [2C]-shaped; OOB scatter ids are dropped).

    valid_node: bool [C] — which table slots hold real nodes (a prefix mask
    single-host; an arbitrary mask for hash-partitioned global tables).

    max_len (static): when the caller only acts on chains of length
    <= max_len (tips/bubbles), doubling may stop after
    ~log2(max_len) + 1 rounds instead of log2(n2): truncation can never
    mint a false head (head == ids requires prev == -1), and a longer
    chain's computed length is min(true_len, 2^rounds) > max_len, so it
    still fails the length predicate. Only full-rounds callers
    (final_chain_state) see exact lengths for arbitrarily long chains."""
    capacity = alive.shape[0]
    n2 = 2 * capacity
    ids = jnp.arange(n2, dtype=I32)
    alive_o = jnp.repeat(alive & valid_node, 2)

    outdeg, usucc = _degrees(succ, alive_o)
    next_u, prev_u = _links(outdeg, usucc)

    rounds = max(1, (n2 - 1).bit_length() + 1)
    if max_len is not None:
        rounds = min(rounds, max(2, int(max_len).bit_length() + 1))
    p0 = jnp.where(prev_u >= 0, prev_u, ids)

    # phase 1: converge; detect cycles (head of a path has prev == -1)
    def dbl(_, q):
        return q[q]
    q = jax.lax.fori_loop(0, rounds, dbl, p0)
    in_cycle = alive_o & (prev_u[q] >= 0)

    if max_len is None:
        # cycle head = node with min oriented k-mer value (SEMANTICS §4;
        # value-based, layout-independent). Min-doubling carrying
        # (okv, id). Acyclic graphs skip the loop via lax.cond.
        def mndbl(_, carry):
            mh, ml, mi, qq = carry
            ch, cl, ci = mh[qq], ml[qq], mi[qq]
            take = u64.lt(ch, cl, mh, ml)
            mh = jnp.where(take, ch, mh)
            ml = jnp.where(take, cl, ml)
            mi = jnp.where(take, ci, mi)
            return mh, ml, mi, qq[qq]

        def run_mndbl(_):
            _, _, mi, qf = jax.lax.fori_loop(
                0, rounds, mndbl, (okv_hi, okv_lo, ids, p0))
            return mi, qf

        mn_i, q_f = jax.lax.cond(in_cycle.any(), run_mndbl,
                                 lambda _: (ids, ids), None)
        # verify the window actually wrapped: in a true cycle every
        # member's window min is the same node; on a path, my window and
        # my 2^rounds-ancestor's window are disjoint node sets, so their
        # mins differ (okv values are unique).
        rep_break = in_cycle & (mn_i == ids) & (mn_i[q_f] == mn_i)
        prev2 = jnp.where(rep_break, -1, prev_u)
    else:
        # tip/bubble passes never act on cycles: unbroken cycle members
        # never satisfy head == ids (no fixpoint), and the wraparound
        # case (cycle length divides 2^rounds, head == ids everywhere)
        # is excluded by the candidates' ~cyc_head condition — so cycle
        # breaking, and its 4-gather doubling loop, can be skipped.
        prev2 = prev_u

    # phase 2: head + distance with cycles broken at their reps
    def hd(_, carry):
        p, d = carry
        return p[p], d + d[p]
    p = jnp.where(prev2 >= 0, prev2, ids)
    d = jnp.where(prev2 >= 0, 1, 0).astype(I32)
    p, d = jax.lax.fori_loop(0, rounds, hd, (p, d))
    head = jnp.where(alive_o, p, -1)
    dist = jnp.where(alive_o, d, 0)
    is_head = alive_o & (head == ids)

    # per-head aggregates (segment id = head; dead nodes -> OOB id n2)
    seg = jnp.where(alive_o, head, n2)
    length = jax.ops.segment_max(dist + 1, seg, num_segments=n2)
    length = jnp.where(is_head, length, 0)
    cyc_head = jnp.zeros(n2, dtype=jnp.bool_).at[
        jnp.where(in_cycle, head, n2)].set(True, mode="drop")
    is_tail = alive_o & (next_u == -1)
    tail_of = jnp.full(n2, -1, dtype=I32).at[
        jnp.where(is_tail, head, n2)].set(ids, mode="drop")
    node_counts = jnp.repeat(counts, 2).astype(U32)
    # coverage limbs (exact sums; bubble chains are short so limbs fit)
    cov_lo = jax.ops.segment_sum(node_counts & U32(0xFFFF), seg, num_segments=n2)
    cov_hi = jax.ops.segment_sum(node_counts >> U32(16), seg, num_segments=n2)
    cov_hi = cov_hi + (cov_lo >> U32(16))
    cov_lo = cov_lo & U32(0xFFFF)
    # twin-head okv: okv(rc(tail)) for paths, min okv over RC set for cycles
    tail_c = jnp.clip(tail_of, 0, None)
    twin_hi = jnp.where(tail_of >= 0, okv_hi[tail_c ^ 1], U32(0xFFFFFFFF))
    twin_lo = jnp.where(tail_of >= 0, okv_lo[tail_c ^ 1], U32(0xFFFFFFFF))
    cyc_seg = jnp.where(in_cycle, head, n2)
    cyc_hi = jnp.full(n2, 0xFFFFFFFF, dtype=U32).at[cyc_seg].min(
        okv_hi[ids ^ 1], mode="drop")
    # two-word segment-min: min lo among nodes whose hi attains the min
    lo_cand = jnp.where(okv_hi[ids ^ 1] == cyc_hi[jnp.clip(head, 0, None)],
                        okv_lo[ids ^ 1], U32(0xFFFFFFFF))
    cyc_lo = jnp.full(n2, 0xFFFFFFFF, dtype=U32).at[cyc_seg].min(
        lo_cand, mode="drop")
    use_cyc = is_head & cyc_head
    twin_hi = jnp.where(use_cyc, cyc_hi, twin_hi)
    twin_lo = jnp.where(use_cyc, cyc_lo, twin_lo)

    return dict(outdeg=outdeg, usucc=usucc, next_u=next_u, head=head,
                dist=dist, is_head=is_head, length=length, cyc_head=cyc_head,
                tail_of=tail_of, cov_hi=cov_hi, cov_lo=cov_lo,
                twin_hi=twin_hi, twin_lo=twin_lo, alive_o=alive_o)


def _kill_heads(alive, st, doomed_heads: jax.Array):
    """Kill every canonical node whose chain head is doomed."""
    head = st["head"]
    node_doomed = st["alive_o"] & (head >= 0) & doomed_heads[jnp.clip(head, 0, None)]
    canon_doomed = node_doomed.reshape(-1, 2).any(axis=1)
    return alive & ~canon_doomed


@functools.partial(jax.jit, static_argnames=("max_len",))
def clip_tips_pass(succ, okv_hi, okv_lo, counts, alive, valid_node, tip_len,
                   max_len: int | None = None):
    """One tip-clipping pass (SEMANTICS §5). Returns (alive, changed).

    max_len: static copy of tip_len enabling truncated doubling
    (_chain_state docstring); semantics are identical with or without."""
    st = _chain_state(succ, okv_hi, okv_lo, counts, alive, valid_node,
                      max_len)
    n2 = succ.shape[0]
    ids = jnp.arange(n2, dtype=I32)
    cand = st["is_head"] & ~st["cyc_head"] & (st["length"] <= tip_len)
    start_open = st["outdeg"][ids ^ 1] == 0  # indeg(head) == 0
    tails = st["tail_of"]
    end_open = (tails >= 0) & (st["outdeg"][jnp.clip(tails, 0, None)] == 0)
    doomed = cand & (start_open != end_open)
    alive2 = _kill_heads(alive, st, doomed)
    return alive2, doomed.any()


@functools.partial(jax.jit, static_argnames=("max_len",))
def pop_bubbles_pass(succ, okv_hi, okv_lo, counts, alive, valid_node,
                     bubble_len, max_len: int | None = None):
    """One bubble-popping pass (SEMANTICS §5). Returns (alive, changed).

    max_len: static copy of bubble_len enabling truncated doubling."""
    st = _chain_state(succ, okv_hi, okv_lo, counts, alive, valid_node,
                      max_len)
    n2 = succ.shape[0]
    ids = jnp.arange(n2, dtype=I32)
    outdeg, usucc = st["outdeg"], st["usucc"]
    tails = st["tail_of"]
    indeg_head = outdeg[ids ^ 1]
    tail_c = jnp.clip(tails, 0, None)
    cand = (st["is_head"] & ~st["cyc_head"] & (st["length"] <= bubble_len)
            & (indeg_head == 1) & (tails >= 0) & (outdeg[tail_c] == 1))
    p = jnp.where(cand, usucc[ids ^ 1] ^ 1, 0)   # unique pred of head
    s = jnp.where(cand, usucc[tail_c], 0)        # unique succ of tail

    def okv(idx):
        return okv_hi[idx], okv_lo[idx]

    # direction pin: (okv[p], okv[s]) <= (okv[s^1], okv[p^1]) lex
    ph, pl = okv(p)
    sh_, sl_ = okv(s)
    rsh, rsl = okv(s ^ 1)
    rph, rpl = okv(p ^ 1)
    proc = u64.lt(ph, pl, rsh, rsl) | (u64.eq(ph, pl, rsh, rsl) & u64.le(sh_, sl_, rph, rpl))
    selfrc = p == (s ^ 1)
    primary = u64.le(okv_hi[ids], okv_lo[ids], st["twin_hi"], st["twin_lo"])
    keep = cand & proc & (~selfrc | primary)

    big = jnp.int32(n2)
    p_k = jnp.where(keep, p, big)
    s_k = jnp.where(keep, s, big)
    # sort by (p, s, cov desc, okv(head) asc); first of each group is kept
    keys = (p_k, s_k, ~st["cov_hi"], ~st["cov_lo"], okv_hi[ids], okv_lo[ids])
    sp, ss, _, _, _, _, sh = jax.lax.sort(keys + (ids,), num_keys=6)
    validm = sp < big
    same_prev = jnp.concatenate([
        jnp.zeros((1,), dtype=jnp.bool_),
        (sp[1:] == sp[:-1]) & (ss[1:] == ss[:-1]),
    ])
    doomed_sorted = validm & same_prev  # non-first member of a >=2 group
    doomed = jnp.zeros(n2, dtype=jnp.bool_).at[
        jnp.where(doomed_sorted, sh, big)].set(True, mode="drop")
    alive2 = _kill_heads(alive, st, doomed)
    return alive2, doomed.any()


@jax.jit
def final_chain_state(succ, okv_hi, okv_lo, counts, alive, valid_node):
    """Chain state + primary mask for contig emission (SEMANTICS §6)."""
    st = _chain_state(succ, okv_hi, okv_lo, counts, alive, valid_node)
    n2 = succ.shape[0]
    ids = jnp.arange(n2, dtype=I32)
    primary = st["is_head"] & u64.le(
        okv_hi[ids], okv_lo[ids], st["twin_hi"], st["twin_lo"])
    return dict(head=st["head"], dist=st["dist"], primary=primary,
                alive_o=st["alive_o"])


def simplify_device(succ, okv_hi, okv_lo, counts, alive, valid_node, params):
    """Fixpoint loop (host-driven): tips then bubbles per round (SEMANTICS §5)."""
    tip_len = jnp.int32(params.tip_len_eff)
    bubble_len = jnp.int32(params.bubble_len_eff)
    for _ in range(params.max_rounds):
        alive, c1 = clip_tips_pass(succ, okv_hi, okv_lo, counts, alive,
                                   valid_node, tip_len,
                                   max_len=params.tip_len_eff)
        alive, c2 = pop_bubbles_pass(succ, okv_hi, okv_lo, counts, alive,
                                     valid_node, bubble_len,
                                     max_len=params.bubble_len_eff)
        if not (bool(c1) or bool(c2)):
            break
    return alive

"""Contig emission: device chain state -> canonical contig strings (host).

Device arrays (head/dist/primary per oriented node) come from
graph.simplify.final_chain_state; the string assembly itself is host-side
NumPy (output writing is host work anyway, SURVEY.md §3.1 writeContigs).
Semantics: SEMANTICS.md §6.
"""

from __future__ import annotations

import numpy as np

from genome_tpu.utils import dna


def emit_contigs(final_state, okv_hi, okv_lo, k: int,
                 min_contig_len: int = 0, node_primary: bool = False) -> list[str]:
    """Assemble canonical contig strings from chain state.

    Args:
      final_state: dict with head/dist/primary/alive_o (device or numpy).
      okv_hi, okv_lo: oriented k-mer values per oriented node.
      node_primary: primary is a per-NODE flag (the head's primary already
        gathered to every chain member — the sharded final state's form,
        where indexing primary[head] would need a cross-shard gather)
        instead of a per-head flag indexed via head.
    Returns sorted canonical contig list.
    """
    head = np.asarray(final_state["head"])
    dist = np.asarray(final_state["dist"])
    primary = np.asarray(final_state["primary"])
    alive_o = np.asarray(final_state["alive_o"])
    okv = (np.asarray(okv_hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        okv_lo, dtype=np.uint64)

    if node_primary:
        sel = alive_o & (head >= 0) & primary
    else:
        sel = alive_o & (head >= 0) & primary[np.clip(head, 0, None)]
    if not sel.any():
        return []
    vh, vd, vv = head[sel], dist[sel], okv[sel]
    order = np.lexsort((vd, vh))
    vh, vd, vv = vh[order], vd[order], vv[order]
    starts = np.flatnonzero(np.concatenate([[True], vh[1:] != vh[:-1]]))
    ends = np.concatenate([starts[1:], [vh.size]])
    last = (vv & np.uint64(3)).astype(np.uint8)
    out: list[str] = []
    for a, b in zip(starts, ends):
        seq = dna.kmer_to_str(int(vv[a]), k) + dna.decode(last[a + 1 : b])
        c = min(seq, dna.revcomp_str(seq))
        if len(c) >= min_contig_len:
            out.append(c)
    return sorted(out)

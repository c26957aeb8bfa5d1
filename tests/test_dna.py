"""Unit tests for host-side DNA encoding (SEMANTICS.md §1)."""

import numpy as np
import pytest

from genome_tpu.utils import dna


def test_encode_decode_roundtrip():
    s = "ACGTACGTNNacgt"
    codes = dna.encode(s)
    assert list(codes) == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 0, 1, 2, 3]
    assert dna.decode(codes) == "ACGTACGTNNACGT"


def test_pack_order_is_lex_order():
    rng = np.random.default_rng(0)
    k = 9
    kmers = ["".join(dna.BASES[c] for c in rng.integers(0, 4, k)) for _ in range(200)]
    packed = [dna.str_to_kmer(s) for s in kmers]
    assert sorted(kmers) == [dna.kmer_to_str(v, k) for v in sorted(packed)]


@pytest.mark.parametrize("k", [3, 5, 15, 21, 31])
def test_revcomp_u64_matches_string(k):
    rng = np.random.default_rng(k)
    for _ in range(50):
        s = "".join(dna.BASES[c] for c in rng.integers(0, 4, k))
        v = np.array([dna.str_to_kmer(s)], dtype=np.uint64)
        rc_v = dna.revcomp_u64(v, k)[0]
        assert dna.kmer_to_str(int(rc_v), k) == dna.revcomp_str(s)


def test_revcomp_involution():
    rng = np.random.default_rng(1)
    for k in (5, 21, 31):
        v = rng.integers(0, 1 << (2 * k), size=1000, dtype=np.uint64)
        assert (dna.revcomp_u64(dna.revcomp_u64(v, k), k) == v).all()


def test_extract_kmers_drops_invalid_windows():
    k = 3
    seq = "ACGNTACG"
    got = dna.extract_kmers_u64(dna.encode(seq), k)
    expect = [dna.str_to_kmer(w) for w in ["ACG", "TAC", "ACG"]]
    assert sorted(got.tolist()) == sorted(expect)


def test_short_read_yields_nothing():
    assert dna.extract_kmers_u64(dna.encode("ACG"), 5).size == 0


def test_canonical_min():
    k = 5
    s = "AATTC"  # rc = GAATT
    c = dna.canonical_u64(np.array([dna.str_to_kmer(s)], dtype=np.uint64), k)[0]
    assert dna.kmer_to_str(int(c), k) == min(s, dna.revcomp_str(s))

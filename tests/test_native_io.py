"""Native (C++) FASTA/FASTQ parser vs the Python parser — identical code
matrices on every fixture (SURVEY.md §2.4 native-layer obligation)."""

import gzip

import numpy as np
import pytest

from genome_tpu.io import random_genome, simulate_reads
from genome_tpu.io.fastx import read_fastx
from genome_tpu.io.native import native_available, parse_fastx_codes
from genome_tpu.io.native.cio import _map_file, _parse_python
from genome_tpu.kernels.extract import pack_reads

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="no C++ toolchain")


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i} extra meta\n{r}\n+\n{'I' * len(r)}\n")


def _expect(path, length=None):
    return pack_reads(read_fastx(path), length)


@needs_native
def test_native_fastq_matches_python(tmp_path):
    reads = simulate_reads(random_genome(500, seed=1), read_len=80,
                           coverage=5, seed=2)
    reads[3] = reads[3][:20] + "NnxX" + reads[3][24:]  # odd letters
    p = tmp_path / "r.fastq"
    _write_fastq(p, reads)
    got = parse_fastx_codes(str(p))
    assert (got == _expect(p)).all()


@needs_native
def test_native_fasta_multiline_matches_python(tmp_path):
    p = tmp_path / "g.fasta"
    g1, g2 = random_genome(137, seed=3), random_genome(61, seed=4)
    with open(p, "w") as f:
        f.write(">a desc\n")
        for i in range(0, len(g1), 50):
            f.write(g1[i : i + 50] + "\n")
        f.write(">b\n" + g2 + "\n")
    got = parse_fastx_codes(str(p))
    assert got.shape == (2, 137)
    assert (got == _expect(p)).all()


@needs_native
def test_native_gzip(tmp_path):
    reads = ["ACGTACGT", "TTTT"]
    p = tmp_path / "r.fastq.gz"
    with gzip.open(p, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    got = parse_fastx_codes(str(p))
    assert (got == _expect(p)).all()


@needs_native
def test_native_crlf(tmp_path):
    p = tmp_path / "crlf.fasta"
    with open(p, "wb") as f:
        f.write(b">a\r\nACGT\r\nGG\r\n>b\r\nTT\r\n")
    got = parse_fastx_codes(str(p))
    assert (got == pack_reads(["ACGTGG", "TT"])).all()


@needs_native
def test_native_fixed_length_truncation(tmp_path):
    p = tmp_path / "r.fastq"
    _write_fastq(p, ["ACGTACGTAC", "GG"])
    got = parse_fastx_codes(str(p), length=4)
    assert got.shape == (2, 4)
    assert (got == pack_reads(["ACGTACGTAC", "GG"], 4)).all()


@needs_native
def test_native_errors(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("hello\n")
    with pytest.raises(ValueError, match="not FASTA/FASTQ"):
        parse_fastx_codes(str(bad))
    trunc = tmp_path / "t.fastq"
    trunc.write_text("@a\nACGT\n+\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_fastx_codes(str(trunc))


@needs_native
def test_native_empty_file(tmp_path):
    p = tmp_path / "e.fa"
    p.write_text("")
    assert parse_fastx_codes(str(p)).shape[0] == 0


def test_python_fallback_matches(tmp_path):
    reads = simulate_reads(random_genome(300, seed=9), read_len=60,
                           coverage=3, seed=10)
    p = tmp_path / "r.fastq"
    _write_fastq(p, reads)
    buf, _n = _map_file(str(p))
    got = _parse_python(bytes(buf), None)
    assert (got == _expect(p)).all()


def test_native_mt_matches_single_thread(tmp_path):
    import numpy as np
    from genome_tpu.io.native.cio import native_available
    from genome_tpu.io.native import parse_fastx_codes
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    p = tmp_path / "mt.fastq"
    with open(p, "w") as f:
        for i in range(997):
            n = int(rng.integers(5, 151))
            seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, n))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * n}\n")
    a = parse_fastx_codes(str(p), threads=1)
    b = parse_fastx_codes(str(p), threads=8)
    assert a.shape == b.shape and (a == b).all()


def test_native_pack_codes_matches_numpy():
    import numpy as np
    from genome_tpu.io.native.cio import native_available, pack_codes_native
    from genome_tpu.kernels.extract import _pack_codes_numpy
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    for B, L in [(1, 1), (3, 7), (64, 100), (257, 104), (5, 8)]:
        codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
        got = pack_codes_native(codes)
        assert got is not None
        ep, ei = _pack_codes_numpy(codes)
        gp, gi, has_inv = got
        assert gp.shape == ep.shape and (gp == ep).all()
        assert gi.shape == ei.shape and (gi == ei).all()
        assert has_inv == bool((codes >= 4).any())


def test_native_pack_codes_padded_matches_numpy():
    import numpy as np
    from genome_tpu.io.native.cio import native_available, pack_codes_native
    from genome_tpu.kernels.extract import _pack_codes_numpy
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(12)
    for B, L, Bo, Lo in [(5, 10, 8, 16), (64, 100, 64, 104), (3, 7, 7, 8)]:
        codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
        got = pack_codes_native(codes, L_out=Lo, rows_out=Bo)
        assert got is not None
        buf = np.full((Bo, Lo), 4, dtype=np.uint8)
        buf[:B, :L] = codes
        ep, ei = _pack_codes_numpy(buf)
        gp, gi, _ = got
        assert gp.shape == ep.shape and (gp == ep).all()
        assert gi.shape == ei.shape and (gi == ei).all()


def test_extract_packed_nomask_matches_masked():
    import numpy as np
    import jax.numpy as jnp
    from genome_tpu.io.native.cio import native_available, pack_codes_native
    from genome_tpu.kernels.extract import (
        extract_canonical_kmers_packed, extract_canonical_kmers_packed_nomask,
        _pack_codes_numpy)
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(13)
    k = 11
    for B, L, Bo, Lo in [(17, 30, 32, 32), (5, 21, 5, 24), (9, 100, 16, 104)]:
        codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)  # no Ns
        packed, invalid, has_inv = pack_codes_native(codes, L_out=Lo,
                                                     rows_out=Bo)
        assert not has_inv
        mh, ml = extract_canonical_kmers_packed(
            jnp.asarray(packed), jnp.asarray(invalid), k, Lo)
        nh, nl = extract_canonical_kmers_packed_nomask(
            jnp.asarray(packed), k, Lo, L, jnp.int32(B))
        assert (np.asarray(mh) == np.asarray(nh)).all()
        assert (np.asarray(ml) == np.asarray(nl)).all()
    # with Ns the flag must trip (pipeline then uses the masked path)
    codes = rng.integers(0, 5, size=(8, 40), dtype=np.uint8)
    codes[3, 7] = 4
    _, _, has_inv = pack_codes_native(codes, L_out=40, rows_out=8)
    assert has_inv

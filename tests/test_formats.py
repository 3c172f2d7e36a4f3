"""Round-trip and unit tests for format codecs."""

import os

import numpy as np

from genomealignmenttools_tpu.formats.chain import (
    Chain, read_chains, write_chains)
from genomealignmenttools_tpu.formats.scorematrix import (
    read_score_scheme, score_scheme_default)
from genomealignmenttools_tpu.formats.twobit import (
    TwoBitFile, pack_sequence, write_twobit)
from genomealignmenttools_tpu.utils.kenthash import (
    KentHash, kent_hash_string)


def test_chain_roundtrip(fixtures_dir, tmp_path):
    src = os.path.join(fixtures_dir, "synthetic.chain")
    chains = read_chains(src)
    out = tmp_path / "rt.chain"
    write_chains(chains, str(out))
    assert out.read_bytes() == open(src, "rb").read()


def test_chain_subset_on_t():
    blocks = np.array([[100, 200, 0, 100], [300, 400, 150, 250],
                       [500, 600, 300, 400]], dtype=np.int64)
    c = Chain(score=1000.0, t_name="t", t_size=1000, t_start=100, t_end=600,
              q_name="q", q_size=500, q_strand="+", q_start=0, q_end=400,
              id=7, blocks=blocks)
    sub = c.subset_on_t(250, 550)
    assert sub.n_blocks == 2
    assert list(sub.blocks[0]) == [300, 400, 150, 250]
    assert list(sub.blocks[1]) == [500, 550, 300, 350]
    # fake score = tSpan ratio
    assert sub.score == (550 - 300) / (600 - 100) * 1000.0
    # covering subset returns the same object
    assert c.subset_on_t(0, 1000) is c
    # clipping into the middle of a block
    sub2 = c.subset_on_t(150, 350)
    assert list(sub2.blocks[0]) == [150, 200, 50, 100]
    assert list(sub2.blocks[1]) == [300, 350, 150, 200]


def test_chain_swap_minus_strand():
    blocks = np.array([[100, 150, 10, 60], [200, 260, 80, 140]], dtype=np.int64)
    c = Chain(score=5.0, t_name="t", t_size=1000, t_start=100, t_end=260,
              q_name="q", q_size=500, q_strand="-", q_start=10, q_end=140,
              id=1, blocks=blocks)
    s = c.swapped()
    assert s.t_name == "q" and s.q_name == "t"
    # double swap is identity
    s2 = s.swapped()
    assert np.array_equal(s2.blocks, c.blocks)
    assert (s2.t_start, s2.t_end, s2.q_start, s2.q_end) == (
        c.t_start, c.t_end, c.q_start, c.q_end)


def test_twobit_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGTacgt", dtype=np.uint8)
    seq = bases[rng.integers(0, 8, 10_001)].copy()
    seq[100:200] = ord("N")
    seq[5000:5100] = ord("n")
    raw = seq.tobytes()
    path = str(tmp_path / "t.2bit")
    write_twobit(path, [("chrX", raw)])
    tbf = TwoBitFile(path)
    s = tbf.read_seq("chrX")
    assert s.size == 10_001
    # chars with do_mask reproduces case + N overlay
    got = s.chars(do_mask=True)
    want = np.frombuffer(raw, np.uint8).copy()
    # n blocks come back as 'N' then masked to case: writer records 'n'/'N'
    # as N blocks; reader renders them per mask state.  Both the lowercase
    # 'n' run and the uppercase run were not lowercase-alpha a-z?  'n' IS
    # lowercase so it is also a mask block -> renders 'n'; 'N' renders 'N'.
    assert got == want.tobytes()
    # sub-range decode
    assert s.chars(95, 205) == raw[95:205]


def test_twobit_reads_reference_fixture():
    # hermetic 2bit from the reference tree (axtChain test input)
    p = "/root/reference/kent/src/hg/mouseStuff/axtChain/tests/input/hg19.chrM.2bit"
    if not os.path.exists(p):
        return
    tbf = TwoBitFile(p)
    names = tbf.seq_names()
    assert names == ["hg19_chrM"]
    s = tbf.read_seq("hg19_chrM")
    assert s.size == 16571  # hg19 chrM length
    chars = s.chars()
    assert len(chars) == s.size
    assert set(chars) <= set(b"ACGTNacgtn")


def test_score_scheme_default_matrix():
    ss = score_scheme_default()
    m = ss.char_matrix()
    assert m[ord("a"), ord("a")] == 91
    assert m[ord("A"), ord("a")] == 91
    assert m[ord("c"), ord("G")] == -125
    assert m[ord("n"), ord("a")] == 0
    assert m[ord("N"), ord("T")] == 0
    assert ss.gap_open == 400 and ss.gap_extend == 30


def test_score_scheme_read_hoxd55(fixtures_dir):
    ss = read_score_scheme(os.path.join(fixtures_dir, "HoxD55.q"))
    m = ss.char_matrix()
    assert m[ord("a"), ord("a")] == 91
    assert m[ord("a"), ord("c")] == -90
    assert m[ord("t"), ord("g")] == -90
    assert ss.gap_open == 400 and ss.gap_extend == 30  # defaults (no O/E line)


def test_kent_hash_string():
    # result = result*9 + c
    assert kent_hash_string("") == 0
    assert kent_hash_string("a") == ord("a")
    assert kent_hash_string("ab") == (ord("a") * 9 + ord("b"))


def test_kent_hash_orders():
    h = KentHash()
    for name in ["3", "17", "4097", "99", "17"]:
        h.add(name, name)
    trav = [n for n, _ in h.traverse_order()]
    ell = [n for n, _ in h.el_list_order()]
    assert ell == list(reversed(trav))
    # LIFO within bucket: duplicate "17" appears, most recent first
    i1 = trav.index("17")
    assert trav[i1] == "17"


def test_pack_sequence_runs():
    packed, nb, mb = pack_sequence(b"ACGTnnNNacgt")
    assert nb.tolist() == [[4, 8]]
    assert mb.tolist() == [[4, 6], [8, 12]]


def test_twobit_native_decode_matches_python(fixtures_dir):
    """native/twobitdec.cpp vs the pure-python LUT decode, random spans."""
    import numpy as np
    from genomealignmenttools_tpu.formats.twobit import TwoBitFile
    from genomealignmenttools_tpu.native import get_lib
    if get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    tbf = TwoBitFile(os.path.join(fixtures_dir, "target.2bit"))
    rng = np.random.default_rng(3)
    for name in tbf.seq_names():
        seq = tbf.read_seq(name)
        import genomealignmenttools_tpu.formats.twobit as tb
        byte_lo_lut = tb._DECODE_LUT
        for _ in range(8):
            a, b = sorted(rng.integers(0, seq.size, 2).tolist())
            if a == b:
                b = min(a + 1, seq.size)
            native = seq.codes(a, b)
            chunk = seq.packed[a // 4:(b + 3) // 4]
            py = byte_lo_lut[chunk].reshape(-1)[a - (a // 4) * 4:][:b - a].copy()
            for s, e in seq.n_blocks:
                s2, e2 = max(int(s), a), min(int(e), b)
                if s2 < e2:
                    py[s2 - a:e2 - a] = 4
            assert np.array_equal(native, py), (name, a, b)

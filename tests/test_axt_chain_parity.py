"""axtChain byte-parity against kent's own hermetic golden-file tests
(hg19 chrM vs susScr3 chrM mitochondrial alignments, psl input mode)."""

import io
import os

import pytest

REF_TESTS = ("/root/repo/.ref_build/kent/src/hg/mouseStuff/axtChain/tests")
REF_SRC = "/root/reference/kent/src/hg/mouseStuff/axtChain/tests"


def _ref_dir():
    for d in (REF_TESTS, REF_SRC):
        if os.path.exists(os.path.join(d, "expected", "newStyleLastz.chain")):
            return d
    pytest.skip("reference axtChain test fixtures unavailable")


@pytest.mark.parametrize("case", ["newStyleLastz", "oldStyleBlastz"])
def test_axt_chain_psl_mode(case, tmp_path):
    from genomealignmenttools_tpu.engines.axt_chain import axt_chain

    ref = _ref_dir()
    out = io.StringIO()
    axt_chain(
        os.path.join(ref, "input", f"{case}.psl"),
        os.path.join(ref, "input", "hg19.chrM.2bit"),
        os.path.join(ref, "input", "susScr3.chrM.2bit"),
        out, linear_gap="loose", min_score=3000,
        score_scheme=os.path.join(ref, "input", f"{case}.Q.txt"),
        is_psl=True)
    expected = open(os.path.join(ref, "expected", f"{case}.chain")).read()
    assert out.getvalue() == expected


def test_chain_blocks_native_matches_python():
    """native/chainblocks.cpp vs the python kd-tree DP: identical chains,
    scores, and block partitions on randomized workloads (incl. overlap
    crossovers and negative block scores)."""
    import numpy as np
    from genomealignmenttools_tpu.engines.chain_connect import (connect_cost,
                                                                gap_cost)
    from genomealignmenttools_tpu.engines.kd_chainer import (
        chain_blocks, chain_blocks_arrays)
    from genomealignmenttools_tpu.formats.gapcalc import gap_calc_from_file
    from genomealignmenttools_tpu.formats.scorematrix import (
        score_scheme_default)
    from genomealignmenttools_tpu.native import get_lib
    if get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    gcal = gap_calc_from_file("loose")
    lut = np.asarray(score_scheme_default().lut)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(3, 400))
        q_codes = rng.integers(0, 5, 100000).astype(np.uint8)
        t_codes = rng.integers(0, 5, 100000).astype(np.uint8)
        ts = np.sort(rng.integers(0, 90000, n))
        rows = []
        for i in range(n):
            length = int(rng.integers(0, 40))  # includes zero-length drops
            qs = max(0, int(ts[i] + rng.integers(-200, 200)))
            sc = int(rng.integers(-500, 4000))  # negative scores too
            rows.append([int(ts[i]), int(ts[i]) + length, qs, qs + length,
                         sc])
        py = chain_blocks(
            "q", 100000, "+", "t", 100000, [list(r) for r in rows],
            lambda a, b: connect_cost(a, b, q_codes, t_codes, lut, gcal),
            lambda dq, dt: gap_cost(dq, dt, gcal))
        nat = chain_blocks_arrays("q", 100000, "+", "t", 100000,
                                  [list(r) for r in rows],
                                  q_codes, t_codes, lut, gcal)
        assert len(py) == len(nat), seed
        for a, b in zip(py, nat):
            assert a.score == b.score, seed
            assert [r[:4] for r in a._rows] == [list(r)[:4] for r in b._rows], seed


def _derive_fa_nib(ref, tmp_path):
    """Derive fasta + nib fixtures from the kent 2bits, the way the
    reference test makefile does with twoBitToFa + faToNib -softMask
    (axtChain/tests/makefile mkdirs target)."""
    from genomealignmenttools_tpu.formats.nib import write_nib
    from genomealignmenttools_tpu.formats.twobit import TwoBitFile

    paths = {}
    for role, fname in (("t", "hg19.chrM.2bit"), ("q", "susScr3.chrM.2bit")):
        tbf = TwoBitFile(os.path.join(ref, "input", fname))
        fa_path = tmp_path / f"{role}.fa"
        nib_dir = tmp_path / f"nib_{role}"
        nib_dir.mkdir()
        with open(fa_path, "w") as fa:
            for name in tbf.seq_names():
                chars = tbf.read_seq(name).chars()
                fa.write(f">{name}\n")
                for i in range(0, len(chars), 50):
                    fa.write(chars[i:i + 50].decode() + "\n")
                write_nib(str(nib_dir / f"{name}.nib"), chars)
        paths[role + "_fa"] = str(fa_path)
        paths[role + "_nib"] = str(nib_dir)
    return paths


@pytest.mark.parametrize("case", ["newStyleLastz", "oldStyleBlastz"])
def test_axt_chain_psl_fasta_mode(case, tmp_path):
    """kent makefile mode: axtChain -psl -faQ -faT in.psl t.fa q.fa"""
    from genomealignmenttools_tpu.engines.axt_chain import axt_chain

    ref = _ref_dir()
    p = _derive_fa_nib(ref, tmp_path)
    out = io.StringIO()
    axt_chain(
        os.path.join(ref, "input", f"{case}.psl"), p["t_fa"], p["q_fa"],
        out, linear_gap="loose", min_score=3000,
        score_scheme=os.path.join(ref, "input", f"{case}.Q.txt"),
        is_psl=True, fa_t=True, fa_q=True)
    expected = open(os.path.join(ref, "expected", f"{case}.chain")).read()
    assert out.getvalue() == expected


@pytest.mark.parametrize("case", ["newStyleLastz", "oldStyleBlastz"])
def test_axt_chain_psl_nibdir_mode(case, tmp_path):
    """kent makefile mode: axtChain -psl in.psl nibTargetDir nibQueryDir"""
    from genomealignmenttools_tpu.engines.axt_chain import axt_chain

    ref = _ref_dir()
    p = _derive_fa_nib(ref, tmp_path)
    out = io.StringIO()
    axt_chain(
        os.path.join(ref, "input", f"{case}.psl"), p["t_nib"], p["q_nib"],
        out, linear_gap="loose", min_score=3000,
        score_scheme=os.path.join(ref, "input", f"{case}.Q.txt"),
        is_psl=True)
    expected = open(os.path.join(ref, "expected", f"{case}.chain")).read()
    assert out.getvalue() == expected


def test_axt_chain_details_mode(tmp_path):
    """-details debug dump (chainBlock.c peelChains trace): byte-identical
    to the reference binary's output (committed golden)."""
    from genomealignmenttools_tpu.engines.axt_chain import axt_chain

    ref = _ref_dir()
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "axtChain.details.txt")
    if not os.path.exists(golden):
        pytest.skip("details golden unavailable")
    out = io.StringIO()
    det = str(tmp_path / "details.txt")
    axt_chain(
        os.path.join(ref, "input", "newStyleLastz.psl"),
        os.path.join(ref, "input", "hg19.chrM.2bit"),
        os.path.join(ref, "input", "susScr3.chrM.2bit"),
        out, linear_gap="loose", min_score=3000,
        score_scheme=os.path.join(ref, "input", "newStyleLastz.Q.txt"),
        is_psl=True, details_path=det)
    assert open(det).read() == open(golden).read()

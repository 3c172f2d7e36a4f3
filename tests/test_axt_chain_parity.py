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

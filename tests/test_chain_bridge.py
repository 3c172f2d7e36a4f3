"""chainBridge + bandExt parity tests."""

import io
import os

from genomealignmenttools_tpu.engines.chain_bridge import chain_bridge
from genomealignmenttools_tpu.formats.scorematrix import score_scheme_default
from genomealignmenttools_tpu.ops.band_ext import band_ext


def test_chain_bridge_parity(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_bridge(
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"), out)
    assert out.getvalue() == open(
        os.path.join(golden_dir, "chainBridge.chain")).read()


def test_band_ext_basic():
    ss = score_scheme_default()
    cm = ss.char_matrix()
    # single insertion in b
    ok, sa, sb, abest, bbest = band_ext(
        False, cm, ss.gap_open, ss.gap_extend, 3,
        b"acgtacgtacgt", b"acgtaacgtacgt", 1)
    assert ok
    assert sa == b"acgt-acgtacgt"
    assert sb == b"acgtaacgtacgt"
    assert (abest, bbest) == (11, 12)
    # no extension possible on immediate garbage (local mode)
    ok, sa, sb, _, _ = band_ext(
        False, cm, ss.gap_open, ss.gap_extend, 3, b"aaaa", b"tttt", 1)
    assert not ok and sa == b"" and sb == b""
    # reverse direction
    ok, sa, sb, _, _ = band_ext(
        False, cm, ss.gap_open, ss.gap_extend, 3,
        b"acgtacgt", b"acgtacgt", -1)
    assert ok and sa == b"acgtacgt" and sb == b"acgtacgt"

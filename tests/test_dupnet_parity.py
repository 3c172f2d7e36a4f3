"""qDup/qOver-heavy net parity: netSyntenic annotations + the syn-aware
NetFilterNonNested modes against live-C goldens (tests/make_dupnet_fixture.py:
duplicated query segments, an inverted child, a qFar child, overlapping
q intervals)."""

import io
import os

from genomealignmenttools_tpu.engines.chain_net import chain_net
from genomealignmenttools_tpu.engines.net_filter_nonnested import (
    net_filter_non_nested)

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures", "dupnet")
GOLD = os.path.join(HERE, "golden", "dupnet")


def test_chain_net_dup_heavy_parity():
    t_out, q_out = io.StringIO(), io.StringIO()
    chain_net(os.path.join(FIX, "dupnet.scored.sorted.chain"),
              os.path.join(FIX, "target.chrom.sizes"),
              os.path.join(FIX, "query.chrom.sizes"), t_out, q_out)
    assert t_out.getvalue() == open(os.path.join(GOLD,
                                                 "chainNet.tnet")).read()
    assert q_out.getvalue() == open(os.path.join(GOLD,
                                                 "chainNet.qnet")).read()


def test_net_syntenic_dup_heavy_parity(tmp_path):
    from genomealignmenttools_tpu.cli.main import main as cli_main
    out = str(tmp_path / "syn.net")
    rc = cli_main(["netSyntenic", os.path.join(GOLD, "chainNet.tnet"),
                   out])
    assert rc in (0, None)
    got = open(out).read()
    want = open(os.path.join(GOLD, "netSyntenic.net")).read()
    assert got == want
    # the fixture actually stresses the annotation surface
    for tag in ("qDup", "qOver", "qFar", "inv"):
        assert tag in want, tag


def test_netfilter_ucsc_syn_mode_parity():
    out = io.StringIO()
    net_filter_non_nested(
        open(os.path.join(GOLD, "netSyntenic.net")).read().splitlines(),
        out, do_ucsc_syn_filter=True)
    want = open(os.path.join(GOLD, "NetFilterNonNested.ucsc.net")).read()
    assert out.getvalue() == want


def test_netfilter_score_keepsyn_mode_parity():
    out = io.StringIO()
    net_filter_non_nested(
        open(os.path.join(GOLD, "netSyntenic.net")).read().splitlines(),
        out, do_score_filter=True, min_score1=60000,
        keep_syn_nets_with_score=8000, keep_inv_nets_with_score=8000)
    want = open(os.path.join(GOLD, "NetFilterNonNested.score.net")).read()
    assert out.getvalue() == want

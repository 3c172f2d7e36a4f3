"""Byte-parity of the chainNet engine against reference C goldens."""

import io
import os

from genomealignmenttools_tpu.engines.chain_net import chain_net


def _run(fixtures_dir, **kw):
    t_out, q_out = io.StringIO(), io.StringIO()
    chain_net(
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"),
        t_out, q_out, **kw)
    return t_out.getvalue(), q_out.getvalue()


def test_chain_net_plain(fixtures_dir, golden_dir):
    t, q = _run(fixtures_dir)
    assert t == open(os.path.join(golden_dir, "chainNet.target.net")).read()
    assert q == open(os.path.join(golden_dir, "chainNet.query.net")).read()


def test_chain_net_rescore(fixtures_dir, golden_dir):
    t, q = _run(
        fixtures_dir, rescore=True,
        t_2bit=os.path.join(fixtures_dir, "target.2bit"),
        q_2bit=os.path.join(fixtures_dir, "query.2bit"),
        linear_gap="loose")
    assert t == open(os.path.join(golden_dir, "chainNetRescore.target.net")).read()
    assert q == open(os.path.join(golden_dir, "chainNetRescore.query.net")).read()


def test_net_read_write_roundtrip(golden_dir, tmp_path):
    from genomealignmenttools_tpu.formats.net import read_nets, write_nets
    src = os.path.join(golden_dir, "chainNet.target.net")
    nets = read_nets(src)
    out = io.StringIO()
    write_nets(nets, out)
    assert out.getvalue() == open(src).read()


def test_chain_net_rescore_batched_device(fixtures_dir, golden_dir):
    """-rescore through the batched device scorer (one round trip for all
    sub-chains): byte-identical to the sequential host path."""
    from genomealignmenttools_tpu.ops.rescore import DeviceChainScorer
    t, q = _run(
        fixtures_dir, rescore=True,
        t_2bit=os.path.join(fixtures_dir, "target.2bit"),
        q_2bit=os.path.join(fixtures_dir, "query.2bit"),
        linear_gap="loose", scorer_factory=DeviceChainScorer)
    assert t == open(os.path.join(golden_dir, "chainNetRescore.target.net")).read()
    assert q == open(os.path.join(golden_dir, "chainNetRescore.query.net")).read()


import pytest as _pytest


@_pytest.mark.parametrize("tag,kw", [
    ("minspace400", {"min_space": 400}),
    ("minfill600", {"min_fill": 600}),
    ("minscore90k", {"min_score": 90000}),
], ids=["minSpace=400", "minFill=600", "minScore=90000"])
def test_chain_net_flag_variants_byte_parity(fixtures_dir, golden_dir, tag,
                                             kw):
    """-minSpace/-minFill/-minScore each provably reshape the net (85/261/
    250 t-side lines vs the default 273); live-C goldens byte-matched."""
    import io as _io

    from genomealignmenttools_tpu.engines.chain_net import chain_net
    t_out, q_out = _io.StringIO(), _io.StringIO()
    chain_net(os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
              os.path.join(fixtures_dir, "target.chrom.sizes"),
              os.path.join(fixtures_dir, "query.chrom.sizes"),
              t_out, q_out, **kw)
    gold = os.path.join(golden_dir, "thresholds")
    assert t_out.getvalue() == open(
        os.path.join(gold, f"net.{tag}.tnet")).read()
    assert q_out.getvalue() == open(
        os.path.join(gold, f"net.{tag}.qnet")).read()

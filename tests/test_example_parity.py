"""Byte-parity on the reference's own bundled example data
(/root/reference/example/hg38.danRer10.chain): every sequence-free tool.

The example 2bit genomes are not bundled (the reference README tells users
to download them from UCSC), so sequence-dependent tools are covered by the
synthetic-genome fixtures; this file proves the toolchain on real data.
"""

import io
import os

import pytest

EX = "/root/reference/example"
CHAIN = os.path.join(EX, "hg38.danRer10.chain")
TSZ = os.path.join(EX, "hg38.chrom.sizes")
QSZ = os.path.join(EX, "danRer10.chrom.sizes")

pytestmark = pytest.mark.skipif(not os.path.isdir(EX),
                                reason="reference example data not mounted")


def _golden(golden_dir, name):
    return open(os.path.join(golden_dir, "example", name)).read()


@pytest.fixture()
def exdir(golden_dir):
    return os.path.join(golden_dir, "example")


def test_chain_sort(golden_dir, tmp_path):
    from genomealignmenttools_tpu.formats.chain import (read_chains,
                                                        sort_chains_by_score,
                                                        write_chains)
    out = io.StringIO()
    write_chains(sort_chains_by_score(read_chains(CHAIN)), out)
    assert out.getvalue() == _golden(golden_dir, "chainSort.chain")


def test_chain_pre_net(golden_dir, exdir, tmp_path):
    from genomealignmenttools_tpu.engines.chain_tools import chain_pre_net
    out = io.StringIO()
    chain_pre_net(os.path.join(exdir, "chainSort.chain"), TSZ, QSZ, out)
    assert out.getvalue() == _golden(golden_dir, "chainPreNet.chain")


def test_chain_net(golden_dir, exdir, tmp_path):
    from genomealignmenttools_tpu.engines.chain_net import chain_net
    tnet = io.StringIO()
    qnet = io.StringIO()
    chain_net(os.path.join(exdir, "chainSort.chain"), TSZ, QSZ,
              tnet, qnet, min_space=1)
    assert tnet.getvalue() == _golden(golden_dir, "chainNet.tnet")
    assert qnet.getvalue() == _golden(golden_dir, "chainNet.qnet")


def test_net_syntenic(golden_dir, exdir, tmp_path):
    from genomealignmenttools_tpu.engines.net_tools import net_syntenic
    out = str(tmp_path / "syn.net")
    net_syntenic(os.path.join(exdir, "chainNet.tnet"), out)
    assert open(out).read() == _golden(golden_dir, "netSyntenic.net")


def test_net_to_bed(golden_dir, exdir, tmp_path):
    from genomealignmenttools_tpu.engines.net_tools import net_to_bed
    out = str(tmp_path / "n.bed")
    net_to_bed(os.path.join(exdir, "chainNet.tnet"), out)
    assert open(out).read() == _golden(golden_dir, "netToBed.bed")


def test_net_filter(golden_dir, exdir):
    from genomealignmenttools_tpu.engines.net_tools import net_filter
    out = io.StringIO()
    net_filter([os.path.join(exdir, "chainNet.tnet")], out, min_score=5000)
    assert out.getvalue() == _golden(golden_dir, "netFilter.minScore.net")


def test_chain_filter(golden_dir, exdir):
    from genomealignmenttools_tpu.engines.chain_tools import chain_filter
    out = io.StringIO()
    chain_filter([os.path.join(exdir, "chainSort.chain")], out,
                 min_score=10000)
    assert out.getvalue() == _golden(golden_dir, "chainFilter.minScore.chain")


def test_chain_stitch_id(golden_dir, exdir):
    from genomealignmenttools_tpu.engines.chain_tools import chain_stitch_id
    out = io.StringIO()
    chain_stitch_id(os.path.join(exdir, "chainSort.chain"), out)
    assert out.getvalue() == _golden(golden_dir, "chainStitchId.chain")


def test_chain_swap(golden_dir, exdir):
    from genomealignmenttools_tpu.engines.chain_tools import chain_swap
    out = io.StringIO()
    chain_swap(os.path.join(exdir, "chainSort.chain"), out)
    assert out.getvalue() == _golden(golden_dir, "chainSwap.chain")


def test_chain_to_psl_basic(golden_dir, exdir):
    from genomealignmenttools_tpu.engines.chain_tools import chain_to_psl_basic
    out = io.StringIO()
    chain_to_psl_basic(os.path.join(exdir, "chainSort.chain"), out)
    assert out.getvalue() == _golden(golden_dir, "chainToPslBasic.psl")


def test_chain_overlap(golden_dir, exdir):
    from genomealignmenttools_tpu.engines.chain_tools import chain_overlap
    out = io.StringIO()
    chain_overlap(os.path.join(exdir, "chainSort.chain"), out)
    assert out.getvalue() == _golden(golden_dir, "chainOverlap.chain")


def test_net_filter_non_nested(golden_dir, exdir):
    from genomealignmenttools_tpu.engines.net_filter_nonnested import (
        net_filter_non_nested)
    out = io.StringIO()
    net_filter_non_nested(os.path.join(exdir, "netSyntenic.net"), out,
                          do_score_filter=True, min_score1=5000,
                          keep_syn_nets_with_score=5000,
                          keep_inv_nets_with_score=5000)
    assert out.getvalue() == _golden(golden_dir, "NetFilterNonNested.net")

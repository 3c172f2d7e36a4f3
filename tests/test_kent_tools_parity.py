"""Byte-parity of the stock kent tool-suite engines against C goldens."""

import io
import os

import pytest

from genomealignmenttools_tpu.engines import chain_tools, net_tools

SORTED = "synthetic.scored.sorted.chain"


def _golden(golden_dir, name):
    return open(os.path.join(golden_dir, name)).read()


def test_chain_pre_net(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_pre_net(
        os.path.join(fixtures_dir, SORTED),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), out)
    assert out.getvalue() == _golden(golden_dir, "chainPreNet.chain")


def test_chain_swap(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_swap(os.path.join(fixtures_dir, SORTED), out)
    assert out.getvalue() == _golden(golden_dir, "chainSwap.chain")


def test_chain_to_axt(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_to_axt(
        os.path.join(fixtures_dir, SORTED),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"), out)
    assert out.getvalue() == _golden(golden_dir, "chainToAxt.axt")


def test_chain_to_axt_min_id_min_score(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_to_axt(
        os.path.join(fixtures_dir, SORTED),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"), out,
        min_id=60, min_score=1000)
    assert out.getvalue() == _golden(golden_dir, "chainToAxt.minid.axt")


def test_chain_to_axt_bed(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_to_axt(
        os.path.join(fixtures_dir, SORTED),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"), out, bed_out=True)
    assert out.getvalue() == _golden(golden_dir, "chainToAxt.bed")


def test_chain_pre_net_dots(fixtures_dir, golden_dir, capsys):
    out = io.StringIO()
    chain_tools.chain_pre_net(
        os.path.join(fixtures_dir, SORTED),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), out, dots=3)
    assert out.getvalue() == _golden(golden_dir, "chainPreNet.chain")
    assert capsys.readouterr().out == _golden(golden_dir, "chainPreNet.dots.txt")


def test_chain_anti_repeat(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_anti_repeat(
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        os.path.join(fixtures_dir, SORTED), out)
    assert out.getvalue() == _golden(golden_dir, "chainAntiRepeat.chain")


@pytest.mark.parametrize("golden_name,kwargs", [
    ("chainFilter.minScore.chain", dict(min_score=100000)),
    ("chainFilter.tStrand.chain", dict(t="chrA", strand="-")),
    ("chainFilter.zeroGap.chain", dict(zero_gap=True, do_long=True)),
])
def test_chain_filter(fixtures_dir, golden_dir, golden_name, kwargs):
    out = io.StringIO()
    chain_tools.chain_filter([os.path.join(fixtures_dir, SORTED)], out,
                             **kwargs)
    assert out.getvalue() == _golden(golden_dir, golden_name)


def test_chain_stitch_id(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_stitch_id(
        os.path.join(fixtures_dir, "fragments.chain"), out)
    assert out.getvalue() == _golden(golden_dir, "chainStitchId.chain")


def test_chain_merge_sort(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_merge_sort(
        [os.path.join(fixtures_dir, f"mergepart{i}.chain") for i in range(3)],
        out)
    assert out.getvalue() == _golden(golden_dir, "chainMergeSort.chain")


def test_chain_split(fixtures_dir, golden_dir, tmp_path):
    out_dir = str(tmp_path / "split")
    chain_tools.chain_split(out_dir, [os.path.join(fixtures_dir, SORTED)])
    golden_split = os.path.join(golden_dir, "chainSplit")
    golden_names = os.listdir(golden_split)
    assert sorted(os.listdir(out_dir)) == sorted(golden_names)
    for name in golden_names:
        assert (open(os.path.join(out_dir, name)).read()
                == open(os.path.join(golden_split, name)).read()), name


def test_net_syntenic(golden_dir):
    out = io.StringIO()
    net_tools.net_syntenic(os.path.join(golden_dir, "chainNet.target.net"), out)
    assert out.getvalue() == _golden(golden_dir, "netSyntenic.net")


def test_net_filter_syn(golden_dir):
    out = io.StringIO()
    net_tools.net_filter([os.path.join(golden_dir, "netSyntenic.net")], out,
                         syn=True)
    assert out.getvalue() == _golden(golden_dir, "netFilter.syn.net")


def test_net_filter_min_score(golden_dir):
    out = io.StringIO()
    net_tools.net_filter([os.path.join(golden_dir, "chainNet.target.net")],
                         out, min_score=20000)
    assert out.getvalue() == _golden(golden_dir, "netFilter.minScore.net")


def test_net_to_bed(golden_dir):
    out = io.StringIO()
    net_tools.net_to_bed(os.path.join(golden_dir, "chainNet.target.net"), out)
    assert out.getvalue() == _golden(golden_dir, "netToBed.simple.bed")
    out = io.StringIO()
    net_tools.net_to_bed(os.path.join(golden_dir, "chainNet.target.net"), out,
                         max_gap=1000, min_fill=100)
    assert out.getvalue() == _golden(golden_dir, "netToBed.detailed.bed")


def test_net_split(golden_dir, tmp_path):
    out_dir = str(tmp_path / "netsplit")
    net_tools.net_split(os.path.join(golden_dir, "chainNet.target.net"),
                        out_dir)
    golden_split = os.path.join(golden_dir, "netSplit")
    golden_names = [n for n in os.listdir(golden_split) if n != "meta.tmp"]
    assert sorted(os.listdir(out_dir)) == sorted(golden_names)
    for name in golden_names:
        assert (open(os.path.join(out_dir, name)).read()
                == open(os.path.join(golden_split, name)).read()), name


def test_net_to_axt(fixtures_dir, golden_dir):
    out = io.StringIO()
    net_tools.net_to_axt(
        os.path.join(golden_dir, "chainNet.target.net"),
        os.path.join(fixtures_dir, SORTED),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"), out)
    assert out.getvalue() == _golden(golden_dir, "netToAxt.axt")


def test_chain_sort_tie_order_and_index(fixtures_dir, golden_dir, tmp_path):
    """kent chainSort reads with slAddHead (reversing file order) before a
    stable slSort, so equal-score chains emit in REVERSE input order
    (chainSort.c:62-76); -index writes hex-offset/key pairs on key change
    (chainSort.c:78-110).  Goldens from the rebuilt C binary."""
    from genomealignmenttools_tpu.cli.main import main as cli_main
    out = str(tmp_path / "sorted.chain")
    rc = cli_main(["chainSort", os.path.join(fixtures_dir, "ties.chain"),
                   out])
    assert rc == 0
    assert open(out).read() == open(
        os.path.join(golden_dir, "chainSort.ties.chain")).read()
    idx = str(tmp_path / "score.idx")
    rc = cli_main(["chainSort", os.path.join(fixtures_dir,
                                             "synthetic.chain"),
                   str(tmp_path / "s.chain"), f"-index={idx}"])
    assert rc == 0
    assert open(idx).read() == open(
        os.path.join(golden_dir, "chainSort.score.idx")).read()


def test_net_filter_line_and_coord_modes(golden_dir, tmp_path, capsys):
    """netFilter -line (per-line, no recursion; netFilter.c:320-345) and
    the coordinate-window flags (qStartMin/tEndMax/qOverlap*/...,
    netFilter.c:258-269).  Goldens from the rebuilt C binary over the
    chainNet target net."""
    from genomealignmenttools_tpu.cli.main import main as cli_main
    src = os.path.join(golden_dir, "chainNet.target.net")
    for args, golden in [
            (["-line", "-minScore=50000"], "netFilter.line.net"),
            (["-line", "-gap", "-minGap=100"], "netFilter.gapline.net"),
            (["-tStartMin=100000", "-tEndMax=900000"],
             "netFilter.coord.net"),
            (["-qOverlapStart=200000", "-qOverlapEnd=700000"],
             "netFilter.overlap.net")]:
        rc = cli_main(["netFilter", src] + args)
        assert rc == 0
        got = capsys.readouterr().out
        assert got == open(os.path.join(golden_dir, golden)).read(), args


def test_net_to_axt_gap_out(fixtures_dir, golden_dir, tmp_path):
    """netToAxt -gapOut: two-column dt/dq gap sizes per written subchain
    (writeGaps, netToAxt.c:49-58); golden from the rebuilt C binary."""
    from genomealignmenttools_tpu.cli.main import main as cli_main
    gap = str(tmp_path / "gap.tab")
    rc = cli_main(["netToAxt", os.path.join(golden_dir, "chainNet.target.net"),
                   os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
                   os.path.join(fixtures_dir, "target.2bit"),
                   os.path.join(fixtures_dir, "query.2bit"),
                   str(tmp_path / "out.axt"), f"-gapOut={gap}"])
    assert rc == 0
    assert open(gap).read() == open(
        os.path.join(golden_dir, "netToAxt.gap.tab")).read()


def test_chain_merge_sort_input_list(fixtures_dir, golden_dir, tmp_path,
                                     capsys):
    """chainMergeSort -inputList reads the file set from a list file
    (chainMergeSort.c usage)."""
    from genomealignmenttools_tpu.cli.main import main as cli_main
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(
        os.path.join(fixtures_dir, f"mergepart{i}.chain")
        for i in range(3)) + "\n")
    rc = cli_main(["chainMergeSort", f"-inputList={lst}"])
    assert rc == 0
    got = capsys.readouterr().out
    assert got == open(os.path.join(golden_dir,
                                    "chainMergeSort.chain")).read()

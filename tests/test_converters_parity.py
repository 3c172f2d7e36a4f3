"""Byte-parity of format converters against C goldens."""

import io
import os

from genomealignmenttools_tpu.engines import chain_tools, converters, maf_tools

SORTED = "synthetic.scored.sorted.chain"


def _golden(golden_dir, name):
    return open(os.path.join(golden_dir, name)).read()


def test_chain_to_psl_basic(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_to_psl_basic(os.path.join(fixtures_dir, SORTED), out)
    assert out.getvalue() == _golden(golden_dir, "chainToPslBasic.psl")


def test_chain_to_psl(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_to_psl(
        os.path.join(fixtures_dir, SORTED),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"), out)
    assert out.getvalue() == _golden(golden_dir, "chainToPsl.psl")


def test_chain_overlap(fixtures_dir, golden_dir):
    out = io.StringIO()
    chain_tools.chain_overlap(os.path.join(fixtures_dir, SORTED), out)
    assert out.getvalue() == _golden(golden_dir, "chainOverlap.chain")


def test_axt_to_psl(fixtures_dir, golden_dir):
    out = io.StringIO()
    converters.axt_to_psl(
        os.path.join(golden_dir, "chainToAxt.axt"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), out)
    assert out.getvalue() == _golden(golden_dir, "axtToPsl.psl")


def test_axt_sort(golden_dir):
    out = io.StringIO()
    converters.axt_sort(os.path.join(golden_dir, "chainToAxt.axt"), out)
    assert out.getvalue() == _golden(golden_dir, "axtSort.axt")


def test_axt_swap(fixtures_dir, golden_dir):
    out = io.StringIO()
    converters.axt_swap(
        os.path.join(golden_dir, "chainToAxt.axt"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), out)
    assert out.getvalue() == _golden(golden_dir, "axtSwap.axt")


def test_axt_to_maf(fixtures_dir, golden_dir):
    out = io.StringIO()
    maf_tools.axt_to_maf(
        os.path.join(golden_dir, "chainToAxt.axt"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), out)
    assert out.getvalue() == _golden(golden_dir, "axtToMaf.maf")
    out = io.StringIO()
    maf_tools.axt_to_maf(
        os.path.join(golden_dir, "chainToAxt.axt"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), out,
        t_prefix="hg.", q_prefix="mm.")
    assert out.getvalue() == _golden(golden_dir, "axtToMaf.prefixed.maf")


def test_maf_to_axt(golden_dir):
    out = io.StringIO()
    maf_tools.maf_to_axt(os.path.join(golden_dir, "axtToMaf.maf"),
                         "first", "chrQ", out)
    assert out.getvalue() == _golden(golden_dir, "mafToAxt.axt")


def test_maf_to_psl(golden_dir):
    out = io.StringIO()
    maf_tools.maf_to_psl("mm", "hg",
                         os.path.join(golden_dir, "axtToMaf.prefixed.maf"),
                         out)
    assert out.getvalue() == _golden(golden_dir, "mafToPsl.psl")


def test_maf_to_fa(golden_dir):
    out = io.StringIO()
    maf_tools.maf_to_fa(os.path.join(golden_dir, "axtToMaf.maf"), out)
    assert out.getvalue() == _golden(golden_dir, "mafToFa.fa")


def test_maf_ranges(golden_dir):
    out = io.StringIO()
    maf_tools.maf_ranges(os.path.join(golden_dir, "axtToMaf.prefixed.maf"),
                         "hg", out)
    assert out.getvalue() == _golden(golden_dir, "mafRanges.bed")
    out = io.StringIO()
    maf_tools.maf_ranges(os.path.join(golden_dir, "axtToMaf.prefixed.maf"),
                         "hg", out, other_db="mm", not_all_o_gap=True)
    assert out.getvalue() == _golden(golden_dir, "mafRanges.mindgaps.bed")


def test_maf_no_align(golden_dir):
    out = io.StringIO()
    maf_tools.maf_no_align(os.path.join(golden_dir, "axtToMaf.prefixed.maf"),
                           out)
    assert out.getvalue() == _golden(golden_dir, "mafNoAlign.bed")

def test_psl_mrna_cover(fixtures_dir, golden_dir, tmp_path):
    zero = str(tmp_path / "zero.tab")
    out = io.StringIO()
    converters.psl_mrna_cover(os.path.join(fixtures_dir, "mrna.psl"),
                              os.path.join(fixtures_dir, "mrna.fa"),
                              out, list_zero=zero)
    assert out.getvalue() == _golden(golden_dir, "pslMrnaCover.txt")
    assert open(zero).read() == _golden(golden_dir, "pslMrnaCover.zero.tab")
    out = io.StringIO()
    converters.psl_mrna_cover(os.path.join(fixtures_dir, "mrna.psl"),
                              os.path.join(fixtures_dir, "mrna.fa"),
                              out, min_size=500)
    assert out.getvalue() == _golden(golden_dir, "pslMrnaCover.minSize500.txt")


def test_axt_to_maf_tsplit(fixtures_dir, golden_dir, tmp_path):
    """-tSplit: one maf per target sequence (axtToMaf.c:85-88, 124-139)."""
    from genomealignmenttools_tpu.engines import maf_tools
    out_dir = str(tmp_path / "split")
    maf_tools.axt_to_maf(
        os.path.join(fixtures_dir, "sorted.axt"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), out_dir,
        q_prefix="q.", t_split=True)
    gold = os.path.join(golden_dir, "axtToMaf.tsplit")
    assert sorted(os.listdir(out_dir)) == sorted(os.listdir(gold))
    for name in os.listdir(gold):
        assert (open(os.path.join(out_dir, name)).read()
                == open(os.path.join(gold, name)).read()), name


def test_chain_merge_sort_hierarchical(fixtures_dir, tmp_path, monkeypatch):
    """>MAXFILES inputs trigger the temp-hierarchy merge
    (chainMergeSort.c:130-197); output matches the flat merge."""
    import io as _io

    from genomealignmenttools_tpu.engines import chain_tools
    from genomealignmenttools_tpu.formats.chain import read_chains
    chains = read_chains(
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"))
    files = []
    for i, c in enumerate(chains):
        p = str(tmp_path / f"c{i:04d}.chain")
        open(p, "w").write(c.to_text())
        files.append(p)
    flat = _io.StringIO()
    chain_tools.chain_merge_sort(files, flat)
    monkeypatch.setattr(chain_tools, "MERGE_MAX_FILES", 5)
    hier = _io.StringIO()
    chain_tools.chain_merge_sort(files, hier, temp_dir=str(tmp_path))
    assert hier.getvalue() == flat.getvalue()

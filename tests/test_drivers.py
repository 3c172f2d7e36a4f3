"""Tests for the hillerlab pipeline drivers."""

import io
import os

from genomealignmenttools_tpu.engines.drivers import (
    _check_axt_entry, extract_syn_inv_chains, filter_axt_identity_entropy,
    filter_chains_net_filter_nets, patch_chain)
from genomealignmenttools_tpu.formats.axt import Axt
from genomealignmenttools_tpu.formats.psl import read_psls


def test_extract_syn_inv_parity(fixtures_dir, golden_dir):
    out = io.StringIO()
    extract_syn_inv_chains(
        os.path.join(fixtures_dir, "netSyntenic.classed.net"),
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        out, 5000, 5000)
    assert out.getvalue() == open(
        os.path.join(golden_dir, "extractSynInv.chain")).read()


def test_extract_syn_inv_type_at_eol_quirk(golden_dir):
    """The perl only matches 'type X ' with a trailing space; a net without
    netClass tags after type keeps nothing (replicated quirk)."""
    out = io.StringIO()
    extract_syn_inv_chains(
        os.path.join(golden_dir, "netSyntenic.net"),
        os.path.join(golden_dir, "chainNet.target.net").replace(
            "chainNet.target.net", "..") + "/fixtures/synthetic.chain",
        out, 5000, 5000)
    assert out.getvalue() == ""


def test_filter_chains_pipeline_parity(fixtures_dir, golden_dir, tmp_path):
    net_out = io.StringIO()
    chain_path = str(tmp_path / "filtered.chain")
    filter_chains_net_filter_nets(
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        os.path.join(fixtures_dir, "cleaner_input.net"),
        chain_path, net_out,
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"),
        [50000, 200000], [1000, 0], [1000, 0])
    assert open(chain_path).read() == open(
        os.path.join(golden_dir, "filterChains.filtered.chain")).read()
    assert net_out.getvalue() == open(
        os.path.join(golden_dir, "filterChains.filtered.net")).read()


def test_check_axt_entry_identity():
    # perfect identity, high entropy window of 10 -> pass at 100%
    t = "ACGTACGTACGT"
    q = "ACGTACGTACGT"
    assert _check_axt_entry(t, q, 100, 0.0, 10)
    # all mismatches -> fail any identity > 0
    q2 = "TGCATGCATGCA"
    assert not _check_axt_entry(t, q2, 50, 0.0, 10)
    # low entropy homopolymer fails entropy threshold
    t3 = "AAAAAAAAAAAA"
    assert not _check_axt_entry(t3, t3, 90, 1.0, 10)
    assert _check_axt_entry(t3, t3, 90, 0.0, 10)
    # half identity: window identity 50%
    q4 = "ACGTACGTTGCA"
    assert _check_axt_entry(t, q4, 60, 0.0, 10)  # first window 8/10
    assert not _check_axt_entry(t, q4, 90, 0.0, 10)


def test_filter_axt_identity_entropy_roundtrip(tmp_path):
    axts = [
        Axt(q_name="q", q_start=0, q_end=12, q_strand="+", t_name="t",
            t_start=0, t_end=12, score=100,
            q_sym="ACGTACGTACGT", t_sym="ACGTACGTACGT"),
        Axt(q_name="q", q_start=20, q_end=32, q_strand="+", t_name="t",
            t_start=20, t_end=32, score=50,
            q_sym="TGCATGCATGCA", t_sym="ACGTACGTACGT"),
    ]
    out = io.StringIO()
    filter_axt_identity_entropy(axts, 90, 1.0, 10, out)
    text = out.getvalue()
    assert "ACGTACGTACGT" in text
    assert "TGCATGCATGCA" not in text


def test_patch_chain_finds_planted_homolog(fixtures_dir, tmp_path):
    out = io.StringIO()
    patch_chain(
        os.path.join(fixtures_dir, "repeatfiller_input.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"),
        out)
    psls = read_psls(io.StringIO(out.getvalue()))
    # both gap scenarios have an 800bp planted homolog
    assert len(psls) >= 2
    for p in psls:
        assert p.matches + p.rep_matches + p.mis_matches >= 700
        assert p.t_name == "chrB" and p.q_name == "chrQ2"


def test_patch_chain_sharding_is_partition(fixtures_dir):
    full = io.StringIO()
    patch_chain(
        os.path.join(fixtures_dir, "repeatfiller_input.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), full)
    parts = []
    for shard in range(2):
        o = io.StringIO()
        patch_chain(
            os.path.join(fixtures_dir, "repeatfiller_input.chain"),
            os.path.join(fixtures_dir, "target.2bit"),
            os.path.join(fixtures_dir, "query.2bit"),
            os.path.join(fixtures_dir, "target.chrom.sizes"),
            os.path.join(fixtures_dir, "query.chrom.sizes"), o,
            num_shards=2, shard_index=shard)
        parts.append(o.getvalue())
    assert sorted((parts[0] + parts[1]).splitlines()) == \
        sorted(full.getvalue().splitlines())


def test_filter_chains_pipeline_checkpointed(fixtures_dir, golden_dir,
                                             tmp_path):
    """work_dir mode: identical bytes, and a second run resumes (skips
    every stage); touching an input re-runs downstream stages only."""
    from genomealignmenttools_tpu.utils.pipeline import Pipeline
    args = (
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        os.path.join(fixtures_dir, "cleaner_input.net"),
        str(tmp_path / "filtered.chain"),
        str(tmp_path / "filtered.net"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"),
        [50000, 200000], [1000, 0], [1000, 0])
    work = str(tmp_path / "work")
    filter_chains_net_filter_nets(*args, work_dir=work)
    assert open(tmp_path / "filtered.chain").read() == open(
        os.path.join(golden_dir, "filterChains.filtered.chain")).read()
    assert open(tmp_path / "filtered.net").read() == open(
        os.path.join(golden_dir, "filterChains.filtered.net")).read()
    # resume: all 5 stages skip (outputs untouched)
    mt_before = os.stat(tmp_path / "filtered.net").st_mtime_ns
    filter_chains_net_filter_nets(*args, work_dir=work)
    assert os.stat(tmp_path / "filtered.net").st_mtime_ns == mt_before
    pl = Pipeline(work)
    assert os.path.exists(os.path.join(work, "MANIFEST.json"))
    # interrupted-run simulation: delete the syntenic checkpoint; the
    # stages before it still skip, it and the final stage re-run
    os.unlink(os.path.join(work, "syntenic.net"))
    filter_chains_net_filter_nets(*args, work_dir=work)
    assert open(tmp_path / "filtered.net").read() == open(
        os.path.join(golden_dir, "filterChains.filtered.net")).read()

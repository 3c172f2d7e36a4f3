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
        out, unmask=True)  # the planted homologs are soft-masked repeats
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


def test_patch_chain_masked_seeding(tmp_path):
    """Default (no -unmask) seeding skips soft-masked bases like lastz;
    unmask=True seeds through them (patchChain.perl:24 `[unmask]`)."""
    import numpy as np

    from genomealignmenttools_tpu.formats.twobit import write_twobit

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    flank = bases[rng.integers(0, 4, 500)].tobytes()
    flank2 = bases[rng.integers(0, 4, 500)].tobytes()
    homolog = bases[rng.integers(0, 4, 400)].tobytes()
    pad = bases[rng.integers(0, 4, 300)].tobytes()
    pad2 = bases[rng.integers(0, 4, 300)].tobytes()
    # the planted homolog is soft-masked (lowercase) on both sides
    t_seq = flank + pad + homolog.lower() + pad2 + flank2
    q_seq = flank + homolog.lower() + flank2
    t2 = str(tmp_path / "t.2bit")
    q2 = str(tmp_path / "q.2bit")
    write_twobit(t2, [("chrT", t_seq)])
    write_twobit(q2, [("chrQ", q_seq)])
    for p, n, ln in ((tmp_path / "t.sizes", "chrT", len(t_seq)),
                     (tmp_path / "q.sizes", "chrQ", len(q_seq))):
        p.write_text(f"{n}\t{ln}\n")
    # one chain whose gap spans the masked homolog: blocks = the flanks
    t_len, q_len = len(t_seq), len(q_seq)
    chain = (f"chain 1000 chrT {t_len} + 0 {t_len} chrQ {q_len} + 0 "
             f"{q_len} 1\n500\t{t_len - 1000}\t{q_len - 1000}\n500\n\n")
    chain_file = str(tmp_path / "in.chain")
    open(chain_file, "w").write(chain)

    def run(unmask):
        out = io.StringIO()
        patch_chain(chain_file, t2, q2, str(tmp_path / "t.sizes"),
                    str(tmp_path / "q.sizes"), out, unmask=unmask)
        return read_psls(io.StringIO(out.getvalue()))

    masked = run(False)
    unmasked = run(True)
    assert len(unmasked) >= 1       # homolog found when seeding is free
    assert len(masked) == 0         # masked bases cannot seed


def test_patch_chain_make_jobs(fixtures_dir, tmp_path):
    """Reference 5-arg mode: job scripts + jobList
    (patchChain.perl:181-267), each running a shard of this CLI."""
    import subprocess
    import sys as _sys

    from genomealignmenttools_tpu.engines.drivers import patch_chain_make_jobs
    job_dir = str(tmp_path / "jobs")
    out_dir = str(tmp_path / "out")
    job_list = str(tmp_path / "jobList")
    n = patch_chain_make_jobs(
        os.path.join(fixtures_dir, "repeatfiller_input.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"),
        num_jobs=2, job_dir=job_dir, output_dir=out_dir, job_list=job_list)
    assert n == 2
    scripts = open(job_list).read().splitlines()
    assert len(scripts) == 2
    from conftest import hermetic_cpu_env
    for s in scripts:
        subprocess.run(["sh", s], check=True, env=hermetic_cpu_env(),
                       timeout=300)
    # union of shard outputs == the unsharded run
    full = io.StringIO()
    patch_chain(
        os.path.join(fixtures_dir, "repeatfiller_input.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"), full)
    shard_lines = []
    for i in range(2):
        shard_lines += open(os.path.join(out_dir, f"patch{i}.psl")).read() \
            .splitlines()
    assert sorted(shard_lines) == sorted(full.getvalue().splitlines())

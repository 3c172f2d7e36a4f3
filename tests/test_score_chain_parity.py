"""Byte-parity of the scoreChain engine against reference C goldens."""

import os

import pytest

from genomealignmenttools_tpu.engines.score_chain import score_chain_file


def _compare(out_path, golden_path):
    with open(out_path, "rb") as f:
        ours = f.read()
    with open(golden_path, "rb") as f:
        golden = f.read()
    if ours != golden:
        ours_l = ours.decode().splitlines()
        gold_l = golden.decode().splitlines()
        for i, (a, b) in enumerate(zip(ours_l, gold_l)):
            assert a == b, f"line {i + 1}: ours={a!r} golden={b!r}"
        assert len(ours_l) == len(gold_l)
    assert ours == golden


CASES = [
    ("scoreChain.loose.chain", dict(linear_gap="loose")),
    ("scoreChain.medium.chain", dict(linear_gap="medium")),
    ("scoreChain.hoxd55.chain", dict(linear_gap="loose", score_scheme="HoxD55.q")),
    ("scoreChain.scores.tsv", dict(linear_gap="loose", return_only_score=True)),
    ("scoreChain.coords.tsv",
     dict(linear_gap="loose", return_only_score_and_coords=True)),
    ("scoreChain.local.chain", dict(linear_gap="loose", force_local_score=True)),
]


@pytest.mark.parametrize("golden_name,kwargs", CASES)
def test_score_chain_matches_reference(golden_name, kwargs, fixtures_dir,
                                       golden_dir, tmp_path):
    kwargs = dict(kwargs)
    if "score_scheme" in kwargs:
        kwargs["score_scheme"] = os.path.join(fixtures_dir, kwargs["score_scheme"])
    out = str(tmp_path / golden_name)
    score_chain_file(
        os.path.join(fixtures_dir, "synthetic.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        out, **kwargs)
    _compare(out, os.path.join(golden_dir, golden_name))


def test_score_chain_nib_dir_inputs(fixtures_dir, golden_dir, tmp_path):
    """Genome sources may be .nib directories (nibLoadAllMasked
    NIB_MASK_MIXED, chainCleaner.c:440-457); output must be identical to
    the 2bit run."""
    from genomealignmenttools_tpu.engines.score_chain import score_chain_file

    out = tmp_path / "nib_scored.chain"
    score_chain_file(
        os.path.join(fixtures_dir, "synthetic.chain"),
        os.path.join(fixtures_dir, "nib", "target"),
        os.path.join(fixtures_dir, "nib", "query"),
        str(out), linear_gap="loose")
    golden = open(os.path.join(golden_dir, "scoreChain.loose.chain")).read()
    assert out.read_text() == golden


def test_chain_cleaner_nib_dir_inputs(fixtures_dir, golden_dir, tmp_path):
    from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains

    out_chain = tmp_path / "nib_clean.chain"
    out_bed = tmp_path / "nib_clean.bed"
    clean_chains(
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        os.path.join(fixtures_dir, "nib", "target"),
        os.path.join(fixtures_dir, "nib", "query"),
        str(out_chain), str(out_bed),
        t_sizes=os.path.join(fixtures_dir, "target.chrom.sizes"),
        q_sizes=os.path.join(fixtures_dir, "query.chrom.sizes"),
        linear_gap="loose")
    assert out_chain.read_text() == open(
        os.path.join(golden_dir, "chainCleaner.out.chain")).read()
    assert out_bed.read_text() == open(
        os.path.join(golden_dir, "chainCleaner.removedSuspects.bed")).read()

"""chainCleaner threshold-flag byte-parity against live-C goldens.

Each variant flips a different branch of the removal predicate
(testAndRemoveSuspect, chainCleaner.c:1214-1310) and provably changes
the outcome vs the 6-removal default run: LRfoldThreshold=60 /
foldThreshold=80 / maxSuspectScore=8000 each leave exactly 1 removal,
minBrokenChainScore=1500000 / minLRGapSize=21000 / maxSuspectBases=200
each suppress all removals.  Goldens produced by the reference binary
on the synthetic fixture (same inputs as the default-parity tests)."""

import os

import pytest

from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden", "thresholds")

CASES = [
    ("lrfold60", {"lr_fold_threshold": 60.0}, 1),
    ("fold80", {"fold_threshold": 80.0}, 1),
    ("maxsus8000", {"max_suspect_score": 8000.0}, 1),
    ("minbroken1500k", {"min_broken_chain_score": 1500000.0}, 0),
    ("minlrgap21k", {"min_lr_gap_size": 21000}, 0),
    ("maxbases200", {"max_suspect_bases": 200.0}, 0),
]


@pytest.mark.parametrize("tag,kw,n_removals", CASES,
                         ids=[c[0] for c in CASES])
def test_threshold_variant_byte_parity(tmp_path, tag, kw, n_removals):
    out_chain = str(tmp_path / "out.chain")
    out_bed = str(tmp_path / "out.bed")
    clean_chains(
        os.path.join(FIX, "synthetic.scored.sorted.chain"),
        os.path.join(FIX, "target.2bit"),
        os.path.join(FIX, "query.2bit"),
        out_chain, out_bed,
        net_file=os.path.join(FIX, "cleaner_input.net"),
        linear_gap="loose", **kw)
    bed = open(out_bed).read()
    assert bed == open(os.path.join(GOLD, f"cc.{tag}.bed")).read()
    assert bed.count("\n") == n_removals
    assert open(out_chain).read() == open(
        os.path.join(GOLD, f"cc.{tag}.chain")).read()

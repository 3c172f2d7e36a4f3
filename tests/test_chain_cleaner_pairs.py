"""chainCleaner -doPairs adversarial byte-parity (chainCleaner.c:1529-1628).

The fixture (tests/make_pairs_fixture.py, goldens from the live reference
binaries) plants two weak suspects around a deliberately small middle
fill: each SINGLE suspect fails the LR-fold test on its middle side, but
the PAIR passes the stricter LRfoldThresholdPairs test - so the pair loop
is the only thing standing between this input and zero removals."""

import os

import pytest

from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures", "pairs")
GOLD = os.path.join(HERE, "golden", "pairs")


def _run(tmp_path, sub, **kw):
    (tmp_path / sub).mkdir()
    out_chain = str(tmp_path / sub / "out.chain")
    out_bed = str(tmp_path / sub / "out.bed")
    clean_chains(
        os.path.join(FIX, "pairs.scored.sorted.chain"),
        os.path.join(FIX, "target.2bit"),
        os.path.join(FIX, "query.2bit"),
        out_chain, out_bed,
        net_file=os.path.join(FIX, "pairs.input.net"),
        linear_gap="loose", **kw)
    return open(out_chain).read(), open(out_bed).read()


@pytest.mark.parametrize("mode", ["nopairs", "pairs"])
def test_pairs_adversarial_byte_parity(tmp_path, mode):
    chain, bed = _run(tmp_path, mode, do_pairs=(mode == "pairs"))
    want_chain = open(os.path.join(
        GOLD, f"chainCleaner.{mode}.out.chain")).read()
    want_bed = open(os.path.join(GOLD, f"chainCleaner.{mode}.bed")).read()
    assert bed == want_bed
    assert chain == want_chain
    if mode == "nopairs":
        assert bed == ""            # singles alone remove NOTHING
    else:
        assert bed.count("\n") == 1  # exactly the one pair removal
        assert "0,100,255" in bed    # ...in the pair color


def test_pairs_python_oracle_matches_native(tmp_path, monkeypatch):
    """The python break loop (the oracle) and the native C++ loop must
    agree on the pair decision too."""
    native = _run(tmp_path, "native", do_pairs=True)
    monkeypatch.setenv("GAT_BREAK_LOOP", "0")
    oracle = _run(tmp_path, "oracle", do_pairs=True)
    assert native == oracle

"""RepeatFiller engine tests: byte-parity (quirks mode) against the
reference RepeatFiller.py output (generated with tests/fake_lastz.py as the
lastz stand-in + real kent axtChain/chainSort binaries), and structural
validity of the default clean output."""

import io
import os

import numpy as np

from genomealignmenttools_tpu.engines.repeat_filler import repeat_filler
from genomealignmenttools_tpu.formats.chain import read_chains


def _run(fixtures_dir, **kw):
    out = io.StringIO()
    repeat_filler(
        os.path.join(fixtures_dir, "repeatfiller_input.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        out, **kw)
    return out.getvalue()


def test_quirks_mode_matches_reference(fixtures_dir, golden_dir):
    got = _run(fixtures_dir, ref_quirks=True)
    expected = open(os.path.join(golden_dir,
                                 "repeatfiller_reference_output.chain")).read()
    assert got == expected


def test_clean_mode_fills_gaps_and_parses(fixtures_dir):
    got = _run(fixtures_dir)
    chains = read_chains(io.StringIO(got))
    orig = read_chains(os.path.join(fixtures_dir, "repeatfiller_input.chain"))
    assert len(chains) == len(orig) == 2
    for c, o in zip(chains, orig):
        b = c.blocks
        assert (b[1:, 0] >= b[:-1, 1]).all()
        assert (b[1:, 2] >= b[:-1, 3]).all()
        assert (c.t_start, c.t_end) == (o.t_start, o.t_end)
        # the planted in-gap homolog must have been found and spliced
        assert c.n_blocks == o.n_blocks + 1


def test_repeat_filler_id_list(fixtures_dir, golden_dir, tmp_path):
    """chain_ids mode outputs only the selected chains, patched - the
    reference's --idList semantics (chainExtractID first,
    RepeatFiller.py:244-302)."""
    import io
    from genomealignmenttools_tpu.engines.repeat_filler import repeat_filler
    from genomealignmenttools_tpu.formats.chain import read_chains
    src = os.path.join(fixtures_dir, "repeatfiller_input.chain")
    all_ids = [c.id for c in read_chains(src)]
    pick = set(all_ids[:1])
    full = io.StringIO()
    repeat_filler(src, os.path.join(fixtures_dir, "target.2bit"),
                  os.path.join(fixtures_dir, "query.2bit"), full)
    sel = io.StringIO()
    repeat_filler(src, os.path.join(fixtures_dir, "target.2bit"),
                  os.path.join(fixtures_dir, "query.2bit"), sel,
                  chain_ids=pick)
    full_chains = {c.id: c.to_text()
                   for c in read_chains(io.StringIO(full.getvalue()))}
    sel_chains = read_chains(io.StringIO(sel.getvalue()))
    assert {c.id for c in sel_chains} == pick
    for c in sel_chains:
        assert c.to_text() == full_chains[c.id]

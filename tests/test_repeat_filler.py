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


def _write_indel_workload(tmp_path):
    """Plant an indel-rich homology inside a chain gap: one strong 80bp
    anchor (the only piece above the HSP threshold K=1500) followed by
    many short diverged pieces separated by 1-3bp indels.  Ground truth is
    the construction itself - recovering the short pieces REQUIRES the
    gapped extension stage (lastz's L-threshold role)."""
    from genomealignmenttools_tpu.formats.chain import Chain, write_chains
    from genomealignmenttools_tpu.formats.twobit import write_twobit

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    t_size = q_size = 40_000
    t = bases[rng.integers(0, 4, t_size)].copy()
    q = bases[rng.integers(0, 4, q_size)].copy()

    def plant(tpos, qpos, length, identity):
        frag = t[tpos:tpos + length].copy()
        mut = rng.random(length) > identity
        frag[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
        q[qpos:qpos + length] = frag

    blocks = []
    tp, qp = 1_000, 1_200
    for _ in range(4):  # left anchor blocks
        plant(tp, qp, 500, 0.95)
        blocks.append((tp, tp + 500, qp, qp + 500))
        tp += 520
        qp += 520
    gap_t0, gap_q0 = tp, qp
    # homology inside the gap: 80bp anchor + 20 x 15bp pieces w/ indels
    ht, hq = gap_t0 + 900, gap_q0 + 900
    planted = 0
    plant(ht, hq, 80, 0.97)
    planted += 80
    ht += 80
    hq += 80
    for i in range(20):
        # a 1-3bp target-side insertion before every piece: each piece
        # lands on a fresh diagonal, so no ungapped segment can bridge
        ht += 1 + i % 3
        plant(ht, hq, 15, 0.92)
        planted += 15
        ht += 15
        hq += 15
    tp, qp = gap_t0 + 3_000, gap_q0 + 3_100  # gap ends
    for _ in range(4):  # right anchor blocks
        plant(tp, qp, 500, 0.95)
        blocks.append((tp, tp + 500, qp, qp + 500))
        tp += 520
        qp += 520

    b = np.array(blocks, np.int64)
    chain = Chain(score=500_000, t_name="chrT", t_size=t_size,
                  t_start=int(b[0, 0]), t_end=int(b[-1, 1]),
                  q_name="chrQ", q_size=q_size, q_strand="+",
                  q_start=int(b[0, 2]), q_end=int(b[-1, 3]),
                  id=1, blocks=b)
    t2 = str(tmp_path / "t.2bit")
    q2 = str(tmp_path / "q.2bit")
    cf = str(tmp_path / "in.chain")
    write_twobit(t2, [("chrT", t.tobytes())])
    write_twobit(q2, [("chrQ", q.tobytes())])
    with open(cf, "w") as f:
        write_chains([chain], f)
    return cf, t2, q2, (gap_t0, gap_t0 + 3_000), planted


def test_gapped_stage_recovers_indel_homology(tmp_path):
    """The banded gapped-extension stage must recover the planted
    indel-containing mini-chain; the ungapped-HSP-only aligner (round-1
    behavior, gapped_threshold=None surrogate: pieces below K are
    invisible) must not."""
    cf, t2, q2, (g0, g1), planted = _write_indel_workload(tmp_path)

    def gap_aligned(out_text):
        chains = read_chains(io.StringIO(out_text))
        b = chains[0].blocks
        inside = (b[:, 0] >= g0) & (b[:, 1] <= g1)
        return int((b[inside, 1] - b[inside, 0]).sum())

    out = io.StringIO()
    repeat_filler(cf, t2, q2, out)  # gapped stage on by default (L=2000)
    got = gap_aligned(out.getvalue())
    # the whole planted homology (anchor + indel pieces) is spliced in
    assert got >= 0.85 * planted, (got, planted)

    out._value = None
    out2 = io.StringIO()
    repeat_filler(cf, t2, q2, out2, gapped_threshold=None)
    got_ungapped = gap_aligned(out2.getvalue())
    # without gapped extension most of the indel pieces are invisible
    assert got_ungapped <= 0.45 * planted, (got_ungapped, planted)
    assert got > 2 * got_ungapped


def test_gapped_left_extension_coordinates(tmp_path):
    """Regression: band_ext returns direction=-1 syms genomic-ascending
    (anchor-adjacent LAST); the block mapper must not mirror left-extension
    coordinates.  Anchor at (2000,2000), true left homology
    t[1972:1997] ~ q[1975:2000] across a 3bp t-insertion."""
    from genomealignmenttools_tpu.device.genome import Genome
    from genomealignmenttools_tpu.formats.scorematrix import (
        score_scheme_default)
    from genomealignmenttools_tpu.formats.twobit import write_twobit
    from genomealignmenttools_tpu.ops.seed_extend import GapAligner

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    t = bases[rng.integers(0, 4, 4000)].copy()
    q = bases[rng.integers(0, 4, 4000)].copy()
    # anchor: exact 60bp at t[2000:2060] == q[2000:2060]
    q[2000:2060] = t[2000:2060]
    # left homology with a 3bp t-side insertion: q[1975:2000] == t[1972:1997]
    q[1975:2000] = t[1972:1997]
    sch = score_scheme_default()
    t2 = str(tmp_path / "t.2bit")
    q2 = str(tmp_path / "q.2bit")
    write_twobit(t2, [("c", t.tobytes())])
    write_twobit(q2, [("c", q.tobytes())])
    tg, qg = Genome(t2), Genome(q2)
    aligner = GapAligner(sch.lut, seed_len=10, hsp_threshold=1500,
                         gapped_threshold=2000, gap_open=sch.gap_open,
                         gap_extend=sch.gap_extend,
                         char_matrix=sch.char_matrix())
    blocks = aligner.align(tg.codes("c"), qg.codes("c"), 1500, 2500,
                           1500, 2500)
    # the left extension must land on the true homology, not its mirror
    found = [b for b in blocks if b[0] < 2000 and b[4] > 0]
    assert found, blocks
    lut = np.asarray(sch.lut, np.int64)
    tc, qc = tg.codes("c"), qg.codes("c")
    for ts, te, qs, qe, _sc in found:
        ident = float((tc[ts:te] == qc[qs:qe]).mean())
        assert ident > 0.9, (ts, te, qs, qe, ident)


def test_batched_band_path_matches_sequential(fixtures_dir, monkeypatch):
    """The cross-gap batched band-DP path (one BandExtBatch.run per chunk
    of gaps) must be byte-identical to the sequential per-gap path, with
    a chunk small enough to force multiple batches."""
    import functools

    from genomealignmenttools_tpu.engines import repeat_filler as rf
    orig = rf._run_gap_jobs
    batched = _run(fixtures_dir)
    monkeypatch.setattr(rf, "_run_gap_jobs",
                        functools.partial(orig, chunk=1))
    chunked = _run(fixtures_dir)
    monkeypatch.undo()
    monkeypatch.setenv("GAT_RF_BATCH", "0")
    sequential = _run(fixtures_dir)
    assert batched == sequential
    assert chunked == sequential


def test_native_hsp_scan_matches_numpy(fixtures_dir, monkeypatch):
    """The threaded C++ HSP scan (native/hspscan.cpp) must reproduce the
    numpy _scan_windows + _max_segments blocks exactly, including block
    emission order (it feeds a stable sort downstream)."""
    native = _run(fixtures_dir)
    monkeypatch.setenv("GAT_HSP_NATIVE", "0")
    numpy_out = _run(fixtures_dir)
    assert native == numpy_out

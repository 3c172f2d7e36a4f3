"""Planted-alignment fidelity suite for the GapAligner (the in-process
lastz replacement used by RepeatFiller / patchChain).

The golden (tests/golden/planted_cases.json, built by tests/make_planted.py)
is NOT produced by our aligner: every case's truth blocks come from pure
coordinate arithmetic over the construction spec.  Long exact anchors
around each breakpoint make the planted decomposition the unique optimum
under the reference scoring (blastz default matrix, gapOpen 400 /
gapExtend 30 - axt.c:423-458), so exact recovery is required, not just
coverage.  Mirrors what lastz finds inside RepeatFiller gaps
(RepeatFiller.py:445-468, lastz K=1500 L=2000 W=6 [unmask]).
"""

import json
import os

import numpy as np
import pytest

from genomealignmenttools_tpu.formats.scorematrix import score_scheme_default
from genomealignmenttools_tpu.ops.seed_extend import GapAligner

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "planted_cases.json")


def _cases():
    with open(GOLDEN) as f:
        return json.load(f)


def _digest(arr: np.ndarray) -> int:
    return int(np.int64(arr.astype(np.int64)
                        @ (np.arange(arr.shape[0]) % 251 + 1)))


def _aligner(**kw):
    sch = score_scheme_default()
    args = dict(lut=sch.lut, seed_len=10, hsp_threshold=1500,
                gapped_threshold=2000, gap_open=sch.gap_open,
                gap_extend=sch.gap_extend, char_matrix=sch.char_matrix())
    args.update(kw)
    return GapAligner(**args)


def _merge_abutting(blocks):
    """Collapse zero-gap neighbours so trivially-equivalent decompositions
    compare equal."""
    out = []
    for b in blocks:
        if out and out[-1][1] == b[0] and out[-1][3] == b[2]:
            out[-1][1], out[-1][3] = b[1], b[3]
        else:
            out.append([int(b[0]), int(b[1]), int(b[2]), int(b[3])])
    return out


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c["spec"]["name"])
def test_planted_recovery(case):
    from tests.make_planted import build_case
    spec = case["spec"]
    t, q, built_blocks = build_case(spec)
    # prove we rebuilt the exact sequences the golden was derived from
    assert _digest(t) == case["t_digest"]
    assert _digest(q) == case["q_digest"]
    planted = _merge_abutting(case["planted_blocks"])
    assert built_blocks.tolist() == case["planted_blocks"]

    got = _aligner().align(t, q, 0, t.shape[0], 0, q.shape[0])
    got4 = _merge_abutting(sorted([b[:4] for b in got]))

    # the planted decomposition must be recovered EXACTLY (every
    # breakpoint, every block): the result blocks that touch any planted
    # block must be precisely the planted ones - a shifted breakpoint or
    # merged/split block still overlaps and fails the equality
    on_target = [b for b in got4
                 if any(b[0] < pb[1] and b[1] > pb[0] for pb in planted)]
    assert on_target == planted, (on_target, planted)

    if spec["name"] == "paralog_decoy":
        return  # the mutated decoy copy may legitimately also align
    # off-target material is allowed only as the small positive-scoring
    # random excursions any correct local aligner (incl. lastz) reports
    planted_bases = sum(b[1] - b[0] for b in planted)
    extra = sum(b[1] - b[0] for b in got4 if b not in on_target)
    assert extra <= 0.15 * planted_bases, (extra, planted_bases, got4)


def test_planted_scores_match_construction():
    """The aligner's reported HSP/gapped scores equal the score of the
    planted alignment computed independently (LUT sum over planted blocks
    minus affine gap costs) - no aligner code in the expected value."""
    from tests.make_planted import build_case
    case = [c for c in _cases()
            if c["spec"]["name"] == "small_indels_high_identity"][0]
    t, q, _ = build_case(case["spec"])
    planted = case["planted_blocks"]
    sch = score_scheme_default()
    lut = np.asarray(sch.lut, np.int64)
    expected = 0
    for i, (ts, te, qs, qe) in enumerate(planted):
        expected += int(lut[q[qs:qe], t[ts:te]].sum())
        if i + 1 < len(planted):
            nts, _, nqs, _ = planted[i + 1]
            gap = max(nts - te, nqs - qe)  # one side is 0 by construction
            expected -= sch.gap_open + sch.gap_extend * gap
    got = _aligner().align(t, q, 0, t.shape[0], 0, q.shape[0])
    total_got = 0
    for i, b in enumerate(sorted(got, key=lambda b: b[0])):
        ts, te, qs, qe = b[:4]
        total_got += int(lut[q[qs:qe], t[ts:te]].sum())
        if i + 1 < len(got):
            nb = sorted(got, key=lambda b: b[0])[i + 1]
            gap = max(nb[0] - te, nb[2] - qe)
            total_got -= sch.gap_open + sch.gap_extend * gap
    assert total_got == expected, (total_got, expected)


def test_planted_end_to_end_repeatfiller(tmp_path):
    """Full RepeatFiller pass over a chain whose gap contains the planted
    small_indels homology: the spliced mini-chain must contain exactly the
    planted blocks (construction truth, not aligner output)."""
    import io

    from genomealignmenttools_tpu.engines.repeat_filler import repeat_filler
    from genomealignmenttools_tpu.formats.chain import (Chain, read_chains,
                                                        write_chains)
    from genomealignmenttools_tpu.formats.twobit import write_twobit
    from tests.make_planted import build_case

    case = [c for c in _cases()
            if c["spec"]["name"] == "small_indels_high_identity"][0]
    spec = case["spec"]
    t, q, _ = build_case(spec)
    planted = _merge_abutting(case["planted_blocks"])
    tn, qn = t.shape[0], q.shape[0]
    # anchor blocks on both sides of a gap spanning the planted region
    a0t, a0q = 500, 500
    a1t, a1q = tn - 700, qn - 700
    q[a0q:a0q + 120] = t[a0t:a0t + 120]
    q[a1q:a1q + 120] = t[a1t:a1t + 120]
    blocks = np.array([[a0t, a0t + 120, a0q, a0q + 120],
                       [a1t, a1t + 120, a1q, a1q + 120]], np.int64)
    chain = Chain(score=100000, t_name="chrT", t_size=tn, t_start=a0t,
                  t_end=a1t + 120, q_name="chrQ", q_size=qn, q_strand="+",
                  q_start=a0q, q_end=a1q + 120, id=1, blocks=blocks)
    bases = np.frombuffer(b"TCAGN", dtype=np.uint8)  # code order T,C,A,G,N
    t2 = str(tmp_path / "t.2bit")
    q2 = str(tmp_path / "q.2bit")
    write_twobit(t2, [("chrT", bases[t].tobytes())])
    write_twobit(q2, [("chrQ", bases[q].tobytes())])
    cf = str(tmp_path / "in.chain")
    with open(cf, "w") as f:
        write_chains([chain], f)

    out = io.StringIO()
    repeat_filler(cf, t2, q2, out)
    got = read_chains(io.StringIO(out.getvalue()))[0]
    b = got.blocks
    inside = b[(b[:, 0] >= planted[0][0] - 50)
               & (b[:, 1] <= planted[-1][1] + 50)]
    assert _merge_abutting(inside.tolist()) == planted, \
        (inside.tolist(), planted)


def _seed_codes_with_mask(t, spec):
    """Seed-only code array: soft-masked intervals set to N (code 4) -
    lastz's default masked seeding, where repeats cannot seed but
    extensions still score through them (RepeatFiller.py:413-416 lifts
    this with '[unmask]')."""
    t_seed = t.copy()
    for a, b in spec.get("t_softmask", []):
        t_seed[a:b] = 4
    return t_seed


def test_softmask_boundary_masked_seeding_recovers():
    """Half-masked copy: masked seeding can only seed in the unmasked
    half, but gapped extension must still recover the FULL planted block
    through the masked half - exact equality, both seed modes."""
    from tests.make_planted import build_case
    case = [c for c in _cases()
            if c["spec"]["name"] == "softmask_seed_boundary"][0]
    spec = case["spec"]
    t, q, _ = build_case(spec)
    planted = _merge_abutting(case["planted_blocks"])
    al = _aligner()
    for t_seed in (None, _seed_codes_with_mask(t, spec)):
        got = al.align(t, q, 0, t.shape[0], 0, q.shape[0],
                       t_seed_codes=t_seed)
        got4 = _merge_abutting(sorted([b[:4] for b in got]))
        on_target = [b for b in got4
                     if any(b[0] < pb[1] and b[1] > pb[0] for pb in planted)]
        assert on_target == planted, (t_seed is None, on_target, planted)


def test_softmask_full_copy_requires_unmask():
    """Fully-masked copy: masked seeding (lastz default) must find
    nothing on target; '[unmask]' seeding (the RepeatFiller regime)
    recovers the planted block exactly."""
    from tests.make_planted import build_case
    case = [c for c in _cases()
            if c["spec"]["name"] == "softmask_full_copy"][0]
    spec = case["spec"]
    t, q, _ = build_case(spec)
    planted = _merge_abutting(case["planted_blocks"])
    al = _aligner()
    masked = al.align(t, q, 0, t.shape[0], 0, q.shape[0],
                      t_seed_codes=_seed_codes_with_mask(t, spec))
    on_target = [b for b in masked
                 if any(b[0] < pb[1] and b[1] > pb[0] for pb in planted)]
    assert on_target == [], on_target
    unmasked = al.align(t, q, 0, t.shape[0], 0, q.shape[0])
    got4 = _merge_abutting(sorted([b[:4] for b in unmasked]))
    on_target = [b for b in got4
                 if any(b[0] < pb[1] and b[1] > pb[0] for pb in planted)]
    assert on_target == planted, (on_target, planted)


def test_transposed_gap_end_to_end_keeps_colinear_best(tmp_path):
    """Full RepeatFiller pass over a gap holding the TRANSPOSED pieces:
    the aligner reports both, but the chainSort-best mini chain is one
    colinear piece - the splice must contain exactly the higher-scoring
    planted piece and nothing from the other (construction truth: the
    reference chains lastz output with axtChain and splices only the
    best mini, RepeatFiller.py:594-607)."""
    import io

    from genomealignmenttools_tpu.engines.repeat_filler import repeat_filler
    from genomealignmenttools_tpu.formats.chain import (Chain, read_chains,
                                                        write_chains)
    from genomealignmenttools_tpu.formats.twobit import write_twobit
    from tests.make_planted import build_case

    case = [c for c in _cases()
            if c["spec"]["name"] == "transposed_pieces"][0]
    t, q, planted = (lambda a, b, c: (a, b, c))(*build_case(case["spec"]))
    planted = planted.tolist()
    tn, qn = t.shape[0], q.shape[0]
    a0t, a0q = 500, 500
    a1t, a1q = tn - 700, qn - 700
    q[a0q:a0q + 120] = t[a0t:a0t + 120]
    q[a1q:a1q + 120] = t[a1t:a1t + 120]
    blocks = np.array([[a0t, a0t + 120, a0q, a0q + 120],
                       [a1t, a1t + 120, a1q, a1q + 120]], np.int64)
    chain = Chain(score=100000, t_name="chrT", t_size=tn, t_start=a0t,
                  t_end=a1t + 120, q_name="chrQ", q_size=qn, q_strand="+",
                  q_start=a0q, q_end=a1q + 120, id=1, blocks=blocks)
    bases = np.frombuffer(b"TCAGN", dtype=np.uint8)
    t2 = str(tmp_path / "t.2bit")
    q2 = str(tmp_path / "q.2bit")
    write_twobit(t2, [("chrT", bases[t].tobytes())])
    write_twobit(q2, [("chrQ", bases[q].tobytes())])
    cf = str(tmp_path / "in.chain")
    with open(cf, "w") as f:
        write_chains([chain], f)

    out = io.StringIO()
    repeat_filler(cf, t2, q2, out)
    got = read_chains(io.StringIO(out.getvalue()))[0]
    b = got.blocks
    # the longer piece (A, planted[0] by t order = 260bp) wins chainSort
    best = max(planted, key=lambda p: p[1] - p[0])
    other = min(planted, key=lambda p: p[1] - p[0])
    inside = b[(b[:, 0] >= best[0] - 50) & (b[:, 1] <= best[1] + 50)]
    assert _merge_abutting(inside.tolist()) == [best], \
        (inside.tolist(), best)
    # nothing from the transposed other piece may be spliced (it would
    # break colinearity)
    overlap_other = b[(b[:, 0] < other[1]) & (b[:, 1] > other[0])]
    assert overlap_other.shape[0] == 0, overlap_other.tolist()


def test_inverted_gap_end_to_end_leaves_gap_unfilled(tmp_path):
    """Full RepeatFiller pass over a gap holding only an INVERTED copy:
    the output chain must be byte-identical to the input (no splice) -
    the reference pins lastz to the chain strand (RepeatFiller.py:353-364),
    so inversions are invisible to gap filling."""
    import io

    from genomealignmenttools_tpu.engines.repeat_filler import repeat_filler
    from genomealignmenttools_tpu.formats.chain import Chain, write_chains
    from genomealignmenttools_tpu.formats.twobit import write_twobit
    from tests.make_planted import build_case

    case = [c for c in _cases()
            if c["spec"]["name"] == "inverted_copy_invisible"][0]
    t, q, _ = build_case(case["spec"])
    tn, qn = t.shape[0], q.shape[0]
    a0t, a0q = 500, 500
    a1t, a1q = tn - 700, qn - 700
    q[a0q:a0q + 120] = t[a0t:a0t + 120]
    q[a1q:a1q + 120] = t[a1t:a1t + 120]
    blocks = np.array([[a0t, a0t + 120, a0q, a0q + 120],
                       [a1t, a1t + 120, a1q, a1q + 120]], np.int64)
    chain = Chain(score=100000, t_name="chrT", t_size=tn, t_start=a0t,
                  t_end=a1t + 120, q_name="chrQ", q_size=qn, q_strand="+",
                  q_start=a0q, q_end=a1q + 120, id=1, blocks=blocks)
    bases = np.frombuffer(b"TCAGN", dtype=np.uint8)
    t2 = str(tmp_path / "t.2bit")
    q2 = str(tmp_path / "q.2bit")
    write_twobit(t2, [("chrT", bases[t].tobytes())])
    write_twobit(q2, [("chrQ", bases[q].tobytes())])
    cf = str(tmp_path / "in.chain")
    with open(cf, "w") as f:
        write_chains([chain], f)

    out = io.StringIO()
    repeat_filler(cf, t2, q2, out)
    # unchanged up to the engine's line-reconstruction trailing newline
    assert out.getvalue().rstrip("\n") == open(cf).read().rstrip("\n")

"""Generate the planted-alignment golden (tests/golden/planted_cases.json).

RepeatFiller/patchChain fidelity evidence that does NOT come from our own
aligner: each case plants a homology with known block decomposition into
synthetic sequences; the planted truth (computed here by pure coordinate
arithmetic from the spec) is the golden the GapAligner must recover.  This
substitutes for real-lastz goldens in this offline environment (lastz is
not in the reference mirror and cannot be fetched): the planted optimum is
known BY CONSTRUCTION - long exact anchors around every breakpoint make
the planted decomposition the unique optimal alignment for the reference
lastz scoring (default blastz matrix, gapOpen 400 / gapExtend 30,
axt.c:423-458), so any correct seed-and-extend aligner must reproduce it
exactly.

Run: python tests/make_planted.py   (regenerates the golden json)
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "golden", "planted_cases.json")

BASES = "ACGT"
# default blastz matrix diagonal/off-diagonal magnitudes (axt.c:423-458):
# match 91..100, worst mismatch -123; used only to pick guard sizes here.

CASES = [
    # name, seed, region sizes, pieces [(len, dt_after, dq_after)],
    # substitution positions (piece_idx, offset_in_piece) - placed away
    # from breakpoints so the planted decomposition stays optimal
    {
        "name": "exact_copy",
        "seed": 101,
        "t_len": 14000, "q_len": 14000, "t0": 5600, "q0": 5900,
        "pieces": [[260, 0, 0]],
        "subs": [],
    },
    {
        "name": "small_indels_high_identity",
        "seed": 202,
        "t_len": 16000, "q_len": 16000, "t0": 6000, "q0": 6400,
        # three pieces across a 4bp t-insertion and a 7bp q-insertion
        "pieces": [[180, 4, 0], [150, 0, 7], [200, 0, 0]],
        "subs": [[0, 60], [0, 112], [1, 75], [2, 40], [2, 133]],
    },
    {
        "name": "long_homology_two_indels",
        "seed": 303,
        "t_len": 20000, "q_len": 20000, "t0": 7000, "q0": 7600,
        "pieces": [[420, 18, 0], [380, 0, 25], [450, 0, 0]],
        "subs": [[0, 50], [0, 200], [0, 333], [1, 90], [1, 260],
                 [2, 77], [2, 310], [2, 404]],
    },
    {
        "name": "paralog_decoy",
        "seed": 404,
        "t_len": 26000, "q_len": 16000, "t0": 6000, "q0": 6500,
        "pieces": [[300, 0, 0]],
        "subs": [[0, 80], [0, 210]],
        # a decoy copy of the SAME q segment at t=6500 with heavy
        # mutation (every 7th base): the aligner must anchor the fill on
        # the high-identity copy at t0, not the decoy
        "decoy_t": 16000, "decoy_every": 7,
    },
    {
        "name": "tandem_repeat_context",
        "seed": 505,
        "t_len": 16000, "q_len": 16000, "t0": 6500, "q0": 6800,
        "pieces": [[240, 0, 0]],
        "subs": [[0, 100]],
        # the planted copy sits inside a 17-mer tandem repeat sea on both
        # sides: seeding must work unmasked (the RepeatFiller use case,
        # lastz '[unmask]' RepeatFiller.py:413-416)
        "repeat_period": 17, "repeat_span": 900,
    },
    {
        "name": "n_run_gap",
        "seed": 606,
        "t_len": 18000, "q_len": 18000, "t0": 6800, "q0": 7100,
        # the 12 inserted t bases are N (code 4, scores 0): the gapped
        # stage must place the q-side gap exactly across the N run -
        # sliding by k trades k matches (+91..100) for k N-pairings (0),
        # strictly worse; seeds containing N are excluded, same as lastz
        "pieces": [[250, 12, 0], [220, 0, 0]],
        "subs": [[0, 70], [1, 90]],
        "n_fill_t": True,
    },
    {
        "name": "softmask_seed_boundary",
        "seed": 707,
        "t_len": 15000, "q_len": 15000, "t0": 6200, "q0": 6500,
        "pieces": [[300, 0, 0]],
        "subs": [[0, 150]],
        # left 200 bases of the copy are soft-masked: under lastz's
        # default masked seeding no word can seed there, but gapped
        # extension must still recover the full planted block by
        # extending back through the masked half
        "t_softmask": [[6200, 6400]],
    },
    {
        "name": "inverted_copy_invisible",
        "seed": 909,
        "t_len": 15000, "q_len": 15000, "t0": 6200, "q0": 6500,
        # the q side holds the REVERSE COMPLEMENT of the t segment: a
        # same-strand aligner must find NOTHING (planted truth = no
        # blocks).  This matches the reference exactly: RepeatFiller pins
        # lastz to one strand per gap (--strand=plus/minus with
        # coordinate flips, RepeatFiller.py:353-364), so an inversion
        # inside a gap is invisible to the gap filler by design.
        "layout": "inverted", "inv_len": 300,
    },
    {
        "name": "transposed_pieces",
        "seed": 1010,
        "t_len": 18000, "q_len": 18000, "t0": 6000, "q0": 6300,
        # two homologous pieces whose q order is SWAPPED (a small
        # translocation inside the gap): the aligner must report BOTH
        # pieces exactly (each is a real local alignment); the downstream
        # chainer then keeps only one colinear chain - covered by the
        # engine-level test.  Diagonals differ by far more than the band
        # width, so no extension can bridge them.
        "layout": "transposed", "piece_lens": [260, 220],
        "subs": [[0, 90], [1, 70]],
    },
    {
        "name": "softmask_full_copy",
        "seed": 808,
        "t_len": 15000, "q_len": 15000, "t0": 6300, "q0": 6600,
        "pieces": [[280, 0, 0]],
        "subs": [[0, 140]],
        # the WHOLE copy is soft-masked: masked seeding must find
        # nothing; only '[unmask]' seeding (the RepeatFiller regime,
        # RepeatFiller.py:413-416) recovers it
        "t_softmask": [[6300, 6580]],
    },
]


# N pad (code 4, scores 0 in every matrix row/col) sealing the planted
# hull; longer than the gapped stage's max extension (GapAligner
# max_ext=2000) so no extension can tunnel through the pad into lucky
# random-land excursions - the same yDrop physics applies to real lastz
PAD = 3000


def build_case(spec):
    """Construct (t, q, planted_blocks) from the spec by pure coordinate
    arithmetic.  The planted decomposition is made the UNIQUE optimum:

    - the hull is sealed with N pads (code 4; every matrix row/col for N
      is 0, axt.c:431 AllocVar zero-init), so no extension past the outer
      boundaries can raise the score;
    - every inserted (indel) base is chosen to mismatch both junction
      bases of the other sequence, so sliding a gap by k replaces k edge
      matches with k mismatches - strictly worse under any positive-match
      matrix;
    - substitutions sit mid-piece, far from every breakpoint.
    """
    rng = np.random.default_rng(spec["seed"])
    t = rng.integers(0, 4, spec["t_len"]).astype(np.uint8)
    q = rng.integers(0, 4, spec["q_len"]).astype(np.uint8)
    if spec.get("layout") == "inverted":
        # q = revcomp(t segment): zero plus-strand homology by
        # construction (complement code = 3 - code for TCAG... codes here
        # are 0..3 over "ACGT": comp(A)=T etc. = 3 - c)
        t0, q0, ln = spec["t0"], spec["q0"], spec["inv_len"]
        q[q0:q0 + ln] = (3 - t[t0:t0 + ln])[::-1]
        for arr, p0, p1 in ((t, t0, t0 + ln), (q, q0, q0 + ln)):
            arr[max(0, p0 - PAD):p0] = 4
            arr[p1:p1 + PAD] = 4
        return t, q, np.zeros((0, 4), np.int64)
    if spec.get("layout") == "transposed":
        t0, q0 = spec["t0"], spec["q0"]
        lens = spec["piece_lens"]
        gap_t, gap_q = 600, 600
        # t order: A then B; q order: B then A (swapped)
        tA, tB = t0, t0 + lens[0] + gap_t
        qB, qA = q0, q0 + lens[1] + gap_q
        q[qA:qA + lens[0]] = t[tA:tA + lens[0]]
        q[qB:qB + lens[1]] = t[tB:tB + lens[1]]
        blocks = [[tA, tA + lens[0], qA, qA + lens[0]],
                  [tB, tB + lens[1], qB, qB + lens[1]]]
        for pi, off in spec.get("subs", ()):
            b = blocks[pi]
            pos = b[2] + off
            q[pos] = (q[pos] + 1 + rng.integers(0, 3)) % 4
        t_end = tB + lens[1]
        q_end = qA + lens[0]
        t[max(0, t0 - PAD):t0] = 4
        t[t_end:t_end + PAD] = 4
        q[max(0, q0 - PAD):q0] = 4
        q[q_end:q_end + PAD] = 4
        return t, q, np.array(blocks, np.int64)
    if "repeat_period" in spec:
        # t-side tandem-repeat sea around the hull: floods the seed stage
        # with spurious k-mer hits (the '[unmask]' regime); q side stays
        # random so the repeats themselves align nowhere
        per = spec["repeat_period"]
        unit = rng.integers(0, 4, per).astype(np.uint8)
        span = spec["repeat_span"]
        # sea sits just OUTSIDE the N pad (the copy content itself stays
        # unique, so the truth decomposition is unambiguous; the sea still
        # floods the shared seed-scan window with spurious k-mer hits)
        hi = max(0, spec["t0"] - PAD)
        lo = max(0, hi - span)
        t[lo:hi] = np.tile(unit, (hi - lo) // per + 1)[: hi - lo]
    tp, qp = spec["t0"], spec["q0"]
    blocks = []
    for ln, dt, dq in spec["pieces"]:
        q[qp:qp + ln] = t[tp:tp + ln]
        blocks.append([tp, tp + ln, qp, qp + ln])
        qe, te = qp + ln, tp + ln
        if dt:
            # t-insertion fill, per position i: mismatch q[qe+i] (gap
            # slide left / next piece's diagonal) AND q[qe-dt+i] (gap
            # slide right / cross-junction HSP extension on the next
            # piece's diagonal) - any alternative placement scores
            # strictly worse.  n_fill_t: fill with N instead (code 4,
            # scores 0 vs everything) - a slide still trades matches for
            # N-pairings, strictly worse under any positive-match matrix
            for i in range(dt):
                if spec.get("n_fill_t"):
                    t[te + i] = 4
                    continue
                avoid = {int(q[qe + i]) if qe + i < q.shape[0] else -1,
                         int(q[qe - dt + i])}
                t[te + i] = next(c for c in range(4) if c not in avoid)
        if dq:
            # q-insertion fill: mismatch t[te+dt+i] and t[te+dt-dq+i]
            nt0 = te + dt  # t-start of the next piece
            for i in range(dq):
                avoid = {int(t[nt0 + i]) if nt0 + i < t.shape[0] else -1,
                         int(t[nt0 - dq + i])}
                q[qe + i] = next(c for c in range(4) if c not in avoid)
        tp += ln + dt
        qp += ln + dq
    # seal the hull with N pads in both sequences
    t0, q0 = spec["t0"], spec["q0"]
    t[max(0, t0 - PAD):t0] = 4
    q[max(0, q0 - PAD):q0] = 4
    t[tp:tp + PAD] = 4
    q[qp:qp + PAD] = 4
    for pi, off in spec["subs"]:
        b = blocks[pi]
        pos = b[2] + off
        q[pos] = (q[pos] + 1 + rng.integers(0, 3)) % 4
    if "decoy_t" in spec:
        d0 = spec["decoy_t"]
        ln = spec["pieces"][0][0]
        t[d0:d0 + ln] = q[spec["q0"]:spec["q0"] + ln]
        idx = np.arange(0, ln, spec["decoy_every"])
        t[d0 + idx] = (t[d0 + idx] + 2) % 4
        t[max(0, d0 - PAD):d0] = 4
        t[d0 + ln:d0 + ln + PAD] = 4
    return t, q, np.array(blocks, np.int64)


def main():
    out = []
    for spec in CASES:
        t, q, blocks = build_case(spec)
        out.append({
            "spec": spec,
            "planted_blocks": blocks.tolist(),
            # digests pin the constructed sequences so the test can prove
            # it rebuilt the identical inputs the golden refers to
            "t_digest": int(np.int64(t.astype(np.int64) @
                                     (np.arange(t.shape[0]) % 251 + 1))),
            "q_digest": int(np.int64(q.astype(np.int64) @
                                     (np.arange(q.shape[0]) % 251 + 1))),
        })
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT} ({len(out)} cases)")


if __name__ == "__main__":
    main()

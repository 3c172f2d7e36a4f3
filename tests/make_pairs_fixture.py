"""Generate the chainCleaner -doPairs adversarial fixture + C goldens.

Scenario (chainCleaner.c:1529-1628, the pair removal loop): a breaking
chain P carries TWO weak suspects separated by a short middle gap whose
broken-chain fill is deliberately small.  Each SINGLE suspect then fails
the LR-fold test on its middle side (midfill / suspect_local <
LRfoldThreshold 2.5), but the PAIR - treated as one suspect spanning
both, with the big outer fills as L/R - passes the (stricter)
LRfoldThresholdPairs 10 test.  So:

    chainCleaner            -> removes NOTHING
    chainCleaner -doPairs   -> removes the two suspects as a pair

Goldens are produced by the live reference binaries (.ref_build);
tests/test_chain_cleaner_pairs.py byte-compares our engine against them.

Run: python tests/make_pairs_fixture.py
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.make_fixtures import (QueryPainter, chain_from_blocks,  # noqa: E402
                                 rand_seq, run, KENT_BIN, REF_BIN)
from genomealignmenttools_tpu.formats.chain import write_chains  # noqa: E402
from genomealignmenttools_tpu.formats.chromsizes import (  # noqa: E402
    write_chrom_sizes)
from genomealignmenttools_tpu.formats.twobit import write_twobit  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures", "pairs")
GOLD = os.path.join(HERE, "golden", "pairs")

T_CHROMS = {"chrP": 300_000}
Q_CHROMS = {"chrQP": 600_000}


def main():
    os.makedirs(FIX, exist_ok=True)
    os.makedirs(GOLD, exist_ok=True)
    rng = np.random.default_rng(20260821)

    t_seq = {n: rand_seq(rng, s) for n, s in T_CHROMS.items()}
    painter = QueryPainter(rng, Q_CHROMS)
    chains = []

    t_size, q_size = T_CHROMS["chrP"], Q_CHROMS["chrQP"]

    # --- breaking chain P: anchors .. sus1 .. sus2 .. anchors ----------
    p_blocks, idents = [], []
    tp, qq = 10_000, 10_000
    for _ in range(10):  # left anchors
        p_blocks.append((tp, tp + 1500, qq, qq + 1500))
        idents.append(0.93)
        tp += 1500 + int(rng.integers(10, 120))
        qq += 1500 + int(rng.integers(10, 120))
    gap1_start = tp
    tp += 18_000                       # gap1 (left fill lives here)
    sus1 = (tp, tp + 250)
    p_blocks.append((tp, tp + 250, qq, qq + 250))
    idents.append(0.78)
    tp += 250
    qq += 250
    mid_start = tp
    tp += 2_500                        # middle gap (small fill)
    sus2 = (tp, tp + 250)
    p_blocks.append((tp, tp + 250, qq, qq + 250))
    idents.append(0.78)
    tp += 250
    qq += 250
    gap2_start = tp
    tp += 18_000                       # gap2 (right fill)
    for _ in range(10):  # right anchors
        p_blocks.append((tp, tp + 1500, qq, qq + 1500))
        idents.append(0.93)
        tp += 1500 + int(rng.integers(10, 120))
        qq += 1500 + int(rng.integers(10, 120))
    painter.reserve("chrQP", 10_000, qq + 1000)
    pchain = chain_from_blocks(p_blocks, 1, "chrP", t_size, "chrQP",
                               q_size, "+")
    painter.plant(t_seq["chrP"], pchain, idents)
    chains.append(pchain)

    # --- broken chain C: big left fill, SMALL middle fill, big right ---
    c_blocks, c_idents = [], []
    cqq = 200_000
    painter.reserve("chrQP", cqq, cqq + 80_000)
    ctp = gap1_start + 500
    for _ in range(8):                 # left fill, >> 10x suspect score
        c_blocks.append((ctp, ctp + 900, cqq, cqq + 900))
        c_idents.append(0.94)
        ctp += 900 + int(rng.integers(5, 80))
        cqq += 900 + int(rng.integers(5, 80))
    ctp = mid_start + 1_000            # middle fill: ONE small block
    cqq += 300
    c_blocks.append((ctp, ctp + 350, cqq, cqq + 350))
    c_idents.append(0.94)
    cqq += 350 + 200
    ctp = gap2_start + 500
    for _ in range(8):                 # right fill
        c_blocks.append((ctp, ctp + 900, cqq, cqq + 900))
        c_idents.append(0.94)
        ctp += 900 + int(rng.integers(5, 80))
        cqq += 900 + int(rng.integers(5, 80))
    cchain = chain_from_blocks(c_blocks, 2, "chrP", t_size, "chrQP",
                               q_size, "+")
    painter.plant(t_seq["chrP"], cchain, c_idents)
    chains.append(cchain)

    # --- write fixture files ------------------------------------------
    t2bit = os.path.join(FIX, "target.2bit")
    q2bit = os.path.join(FIX, "query.2bit")
    write_twobit(t2bit, [(n, t_seq[n].tobytes()) for n in T_CHROMS])
    write_twobit(q2bit, [(n, painter.seq[n].tobytes()) for n in Q_CHROMS])
    write_chrom_sizes(T_CHROMS, os.path.join(FIX, "target.chrom.sizes"))
    write_chrom_sizes(Q_CHROMS, os.path.join(FIX, "query.chrom.sizes"))
    raw_chain = os.path.join(FIX, "pairs.raw.chain")
    with open(raw_chain, "w") as f:
        write_chains(chains, f)

    # score + sort with the reference binaries
    scored = os.path.join(FIX, "pairs.scored.chain")
    run([os.path.join(REF_BIN, "scoreChain"), raw_chain, t2bit, q2bit,
         scored, "-linearGap=loose"])
    sorted_chain = os.path.join(FIX, "pairs.scored.sorted.chain")
    run([os.path.join(KENT_BIN, "chainSort"), scored, sorted_chain])

    # the cleaner's internal netting shells `set -o pipefail` (needs bash
    # as /bin/sh); pre-net explicitly and hand the cleaner -net=
    env = dict(os.environ)
    env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]
    prenet = os.path.join(FIX, "pairs.input.net")
    subprocess.run(
        ["bash", "-c",
         f"set -o pipefail; chainNet -minScore=0 {sorted_chain} "
         f"{os.path.join(FIX, 'target.chrom.sizes')} "
         f"{os.path.join(FIX, 'query.chrom.sizes')} stdout /dev/null | "
         f"NetFilterNonNested.perl /dev/stdin -minScore1 3000 > {prenet}"],
        check=True, env=env)

    # C goldens: with and without -doPairs
    cc = os.path.join(REF_BIN, "chainCleaner")
    for tag, extra in (("nopairs", []), ("pairs", ["-doPairs"])):
        subprocess.run(
            [cc, sorted_chain, t2bit, q2bit,
             os.path.join(GOLD, f"chainCleaner.{tag}.out.chain"),
             os.path.join(GOLD, f"chainCleaner.{tag}.bed"),
             f"-net={prenet}",
             "-linearGap=loose"] + extra,
            check=True, env=env, capture_output=True)

    nopairs_bed = open(os.path.join(GOLD,
                                    "chainCleaner.nopairs.bed")).read()
    pairs_bed = open(os.path.join(GOLD, "chainCleaner.pairs.bed")).read()
    print("single-mode removals:", nopairs_bed.count("\n"))
    print("pairs-mode removals:", pairs_bed.count("\n"))
    print("pair color present:", "0,100,255" in pairs_bed)
    print("suspects:", sus1, sus2)
    if nopairs_bed.count("\n") != 0 or "0,100,255" not in pairs_bed:
        print("WARNING: scenario did not produce the intended "
              "single-fails/pair-succeeds outcome")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

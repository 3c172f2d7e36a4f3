"""Generate the qDup/qOver-heavy net fixture + C goldens.

Exercises the netSyntenic annotation surface (type/qDup/qOver/qFar) and
its interplay with NetFilterNonNested's syn-aware modes - including the
-doUCSCSynFilter branch (UCSC constants + qFar cutoff) that plain
minScore fixtures never reach.  Planted structure:

- a big syntenic parent (type top / syn material)
- an INVERTED child inside one of its gaps (minus strand, q near the
  parent's q span -> type inv)
- a FAR child (q ~180kb away from the parent's q -> qFar > UCSC_MAX_FAR)
- one query segment duplicated at THREE target locations (heavy qDup on
  the lower-score copies)
- two chains with half-overlapping q intervals (qOver)

Goldens come from the live reference binaries (.ref_build):
chainNet -> netSyntenic -> NetFilterNonNested{-doUCSCSynFilter,
-doScoreFilter + keepSyn/keepInv}.

Run: python tests/make_dupnet_fixture.py
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.make_fixtures import (KENT_BIN, REF_BIN, chain_from_blocks,  # noqa: E402
                                 mutate, rand_seq, revcomp, run)
from genomealignmenttools_tpu.formats.chain import write_chains  # noqa: E402
from genomealignmenttools_tpu.formats.chromsizes import (  # noqa: E402
    write_chrom_sizes)
from genomealignmenttools_tpu.formats.twobit import write_twobit  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures", "dupnet")
GOLD = os.path.join(HERE, "golden", "dupnet")

T_CHROMS = {"chrD": 500_000}
Q_CHROMS = {"chrQD": 250_000}


def main():
    os.makedirs(FIX, exist_ok=True)
    os.makedirs(GOLD, exist_ok=True)
    rng = np.random.default_rng(20260822)
    t = rand_seq(rng, T_CHROMS["chrD"])
    q = rand_seq(rng, Q_CHROMS["chrQD"])
    t_size, q_size = T_CHROMS["chrD"], Q_CHROMS["chrQD"]
    chains = []
    cid = 1

    def colinear(tp, qp, n, bs, ident, strand="+", gap_t=(10, 2500),
                 gap_q=(10, 120)):
        """Plant n colinear blocks t->q (plus-strand q content; minus
        chains get revcomp content at the flipped interval)."""
        blocks = []
        for _ in range(n):
            blocks.append((tp, tp + bs, qp, qp + bs))
            frag = mutate(rng, t[tp:tp + bs], ident)
            if strand == "+":
                q[qp:qp + bs] = frag
            else:
                q[q_size - (qp + bs):q_size - qp] = revcomp(frag)
            tp += bs + int(rng.integers(*gap_t))
            qp += bs + int(rng.integers(*gap_q))
        return blocks

    # --- syntenic parent: 20 x 1.5kb with roomy t gaps ------------------
    parent_blocks = colinear(20_000, 20_000, 20, 1500, 0.93)
    chains.append(chain_from_blocks(parent_blocks, cid, "chrD", t_size,
                                    "chrQD", q_size, "+"))
    cid += 1

    # --- inverted child inside a parent t gap, q near the parent span ---
    # (q on minus strand: chain q coords live on revcomp space)
    pg = parent_blocks[7]  # gap after the 8th block
    inv_t = pg[1] + 300
    inv_q_plus = 60_000    # inside the parent's q neighbourhood
    inv_blocks = colinear(inv_t, q_size - (inv_q_plus + 4_000), 2, 900,
                          0.9, strand="-", gap_t=(10, 60), gap_q=(10, 60))
    chains.append(chain_from_blocks(inv_blocks, cid, "chrD", t_size,
                                    "chrQD", q_size, "-"))
    cid += 1

    # --- far child inside another parent gap (qFar >> UCSC_MAX_FAR) -----
    pg2 = parent_blocks[12]
    far_blocks = colinear(pg2[1] + 300, 230_000, 2, 900, 0.9,
                          gap_t=(10, 60))
    chains.append(chain_from_blocks(far_blocks, cid, "chrD", t_size,
                                    "chrQD", q_size, "+"))
    cid += 1

    # --- one q segment duplicated at three t locations (qDup) -----------
    dup_q = 120_000
    for k, (dt0, ident) in enumerate(((250_000, 0.95), (300_000, 0.88),
                                      (350_000, 0.82))):
        blocks = []
        tp, qp = dt0, dup_q
        for _ in range(8):
            bs = 1200
            blocks.append((tp, tp + bs, qp, qp + bs))
            frag = mutate(rng, q[qp:qp + bs], ident) if k else \
                t[tp:tp + bs]
            if k == 0:
                # first copy defines the q content from t
                q[qp:qp + bs] = mutate(rng, t[tp:tp + bs], ident)
            else:
                # later copies: t gets (mutated) copies of the SAME q
                t[tp:tp + bs] = mutate(rng, q[qp:qp + bs], ident)
                _ = frag
            tp += bs + int(rng.integers(10, 120))
            qp += bs + int(rng.integers(10, 120))
        chains.append(chain_from_blocks(blocks, cid, "chrD", t_size,
                                        "chrQD", q_size, "+"))
        cid += 1

    # --- two chains with half-overlapping q intervals (qOver) -----------
    ov_blocks1 = colinear(420_000, 170_000, 6, 1200, 0.93,
                          gap_t=(10, 120))
    chains.append(chain_from_blocks(ov_blocks1, cid, "chrD", t_size,
                                    "chrQD", q_size, "+"))
    cid += 1
    ov_blocks2 = []
    tp = 460_000
    qp = 173_000   # overlaps the q span of ov_blocks1
    for _ in range(6):
        bs = 1200
        ov_blocks2.append((tp, tp + bs, qp, qp + bs))
        t[tp:tp + bs] = mutate(rng, q[qp:qp + bs], 0.9)
        tp += bs + int(rng.integers(10, 120))
        qp += bs + int(rng.integers(10, 120))
    chains.append(chain_from_blocks(ov_blocks2, cid, "chrD", t_size,
                                    "chrQD", q_size, "+"))
    cid += 1

    # --- write + reference pipeline -------------------------------------
    t2bit = os.path.join(FIX, "target.2bit")
    q2bit = os.path.join(FIX, "query.2bit")
    write_twobit(t2bit, [("chrD", t.tobytes())])
    write_twobit(q2bit, [("chrQD", q.tobytes())])
    write_chrom_sizes(T_CHROMS, os.path.join(FIX, "target.chrom.sizes"))
    write_chrom_sizes(Q_CHROMS, os.path.join(FIX, "query.chrom.sizes"))
    raw = os.path.join(FIX, "dupnet.raw.chain")
    with open(raw, "w") as f:
        write_chains(chains, f)
    scored = os.path.join(FIX, "dupnet.scored.chain")
    run([os.path.join(REF_BIN, "scoreChain"), raw, t2bit, q2bit, scored,
         "-linearGap=loose"])
    sorted_chain = os.path.join(FIX, "dupnet.scored.sorted.chain")
    run([os.path.join(KENT_BIN, "chainSort"), scored, sorted_chain])

    env = dict(os.environ)
    env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]
    tnet = os.path.join(GOLD, "chainNet.tnet")
    run([os.path.join(KENT_BIN, "chainNet"), sorted_chain,
         os.path.join(FIX, "target.chrom.sizes"),
         os.path.join(FIX, "query.chrom.sizes"), tnet,
         os.path.join(GOLD, "chainNet.qnet")])
    syn = os.path.join(GOLD, "netSyntenic.net")
    run([os.path.join(KENT_BIN, "netSyntenic"), tnet, syn])
    for tag, flags in (
            ("ucsc", ["-doUCSCSynFilter"]),
            ("score", ["-doScoreFilter", "-minScore1", "60000",
                       "-keepSynNetsWithScore", "8000",
                       "-keepInvNetsWithScore", "8000"])):
        with open(os.path.join(GOLD, f"NetFilterNonNested.{tag}.net"),
                  "w") as fh:
            subprocess.run(
                [os.path.join(REF_BIN, "NetFilterNonNested.perl")]
                + flags + [syn], check=True, stdout=fh, env=env)

    syn_text = open(syn).read()
    for tag in ("qDup", "qOver", "qFar", "inv", "nonSyn", "syn"):
        print(tag, syn_text.count(tag))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Generate hermetic test fixtures + golden outputs from the reference C tools.

Run manually (requires the locally-built reference binaries in
/root/repo/.ref_build - compiled from /root/reference with stubbed openssl):

    python tests/make_fixtures.py

Strategy: build a synthetic target genome, then *plant* homologous copies of
target blocks into a synthetic query genome (with controlled mutation rates)
so that chains score realistically positive.  Includes deliberate
breaking/broken chain scenarios (a high-scoring chain whose small middle
block splits a nested chain) so chainCleaner has real suspects to remove.

Outputs are committed to tests/fixtures/ (inputs) and tests/golden/
(expected outputs); tests compare our engines byte-for-byte against the
goldens without needing the reference binaries.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from genomealignmenttools_tpu.formats.twobit import write_twobit  # noqa: E402
from genomealignmenttools_tpu.formats.chain import Chain, write_chains  # noqa: E402
from genomealignmenttools_tpu.formats.chromsizes import write_chrom_sizes  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "fixtures")
GOLD = os.path.join(HERE, "golden")
REF_BIN = "/root/repo/.ref_build/bin"
KENT_BIN = "/root/repo/.ref_build/kent/bin"

T_CHROMS = {"chrA": 1_000_000, "chrB": 200_000}
Q_CHROMS = {"chrQ1": 2_000_000, "chrQ2": 150_000}

HOXD55 = """\
     A    C    G    T
    91  -90  -25 -100
   -90  100 -100  -25
   -25 -100  100  -90
  -100  -25  -90   91
"""

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65}
_COMP_LUT = np.arange(256, dtype=np.uint8)
for k, v in COMP.items():
    _COMP_LUT[k] = v
    _COMP_LUT[k + 32] = v + 32


def revcomp(seq: np.ndarray) -> np.ndarray:
    return _COMP_LUT[seq[::-1]]


def rand_seq(rng, size):
    return BASES[rng.integers(0, 4, size)].copy()


def mutate(rng, seq: np.ndarray, identity: float) -> np.ndarray:
    out = seq.copy()
    mut = rng.random(seq.size) > identity
    out[mut] = BASES[rng.integers(0, 4, int(mut.sum()))]
    return out


class QueryPainter:
    """Tracks query chrom arrays + used intervals; plants homology."""

    def __init__(self, rng, chroms):
        self.rng = rng
        self.seq = {n: rand_seq(rng, s) for n, s in chroms.items()}
        self.used = {n: [] for n in chroms}

    def reserve(self, qname, start, end) -> bool:
        for s, e in self.used[qname]:
            if start < e and s < end:
                return False
        self.used[qname].append((start, end))
        return True

    def plant(self, tseq, chain: Chain, identities):
        """Copy (mutated) target block sequence into query plus-strand."""
        q = self.seq[chain.q_name]
        qsize = chain.q_size
        for (ts, te, qs, qe), ident in zip(chain.blocks, identities):
            frag = mutate(self.rng, tseq[ts:te], ident)
            if chain.q_strand == "+":
                q[qs:qe] = frag
            else:
                # chain q coords are on revcomp(q): plus-strand interval is
                # [qsize-qe, qsize-qs) and holds revcomp of the fragment
                q[qsize - qe:qsize - qs] = revcomp(frag)


def chain_from_blocks(blocks, cid, t_name, t_size, q_name, q_size, strand,
                      score=1.0) -> Chain:
    b = np.array(blocks, dtype=np.int64)
    return Chain(
        score=float(score), t_name=t_name, t_size=t_size,
        t_start=int(b[0, 0]), t_end=int(b[-1, 1]),
        q_name=q_name, q_size=q_size, q_strand=strand,
        q_start=int(b[0, 2]), q_end=int(b[-1, 3]), id=cid, blocks=b,
    )


def gen_colinear_blocks(rng, t_pos, q_pos, n_blocks, t_size, q_size,
                        block_lo=30, block_hi=600, gap_cap=4000):
    blocks = []
    for _ in range(n_blocks):
        bs = int(rng.integers(block_lo, block_hi))
        if t_pos + bs > t_size or q_pos + bs > q_size:
            break
        blocks.append((t_pos, t_pos + bs, q_pos, q_pos + bs))
        t_pos += bs
        q_pos += bs
        g = rng.integers(0, 3)
        dt = int(rng.integers(0, gap_cap)) if g != 1 else 0
        dq = int(rng.integers(0, gap_cap)) if g != 0 else 0
        t_pos += dt
        q_pos += dq
    return blocks


def run(cmd, **kw):
    print("+", " ".join(cmd))
    env = dict(os.environ)
    env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]
    subprocess.run(cmd, check=True, env=env, **kw)


def main():
    os.makedirs(FIX, exist_ok=True)
    os.makedirs(GOLD, exist_ok=True)
    rng = np.random.default_rng(20260817)

    # target genome with soft-mask + N features
    t_seq = {}
    for name, size in T_CHROMS.items():
        s = rand_seq(rng, size)
        for _ in range(size // 8000 + 2):  # soft-mask runs
            st = int(rng.integers(0, size - 1))
            e = min(size, st + int(rng.integers(50, 4000)))
            s[st:e] += 32
        for _ in range(size // 120000 + 1):  # N runs
            st = int(rng.integers(0, size - 1))
            e = min(size, st + int(rng.integers(20, 300)))
            s[st:e] = ord("N")
        t_seq[name] = s

    painter = QueryPainter(rng, Q_CHROMS)
    chains: list[Chain] = []
    cid = 1

    # --- planted suspect scenarios on chrA ---------------------------------
    # Breaking chain P: [bigA]...gap...[suspect]...gap...[bigB]; broken chain
    # C fills both gaps (same chain, two net fills) -> valid break.
    t_size = T_CHROMS["chrA"]
    q_size = Q_CHROMS["chrQ1"]
    t_cursor = 10_000
    for scenario in range(6):
        qp = 10_000 + scenario * 320_000
        if not painter.reserve("chrQ1", qp, qp + 150_000):
            continue
        strand = "+" if scenario % 2 == 0 else "-"
        # P: left anchor blocks
        p_blocks = []
        idents = []
        tp, qq = t_cursor, qp
        for _ in range(10):  # bigA ~ 10 x 1.5kb strong blocks
            bs = 1500
            p_blocks.append((tp, tp + bs, qq, qq + bs))
            idents.append(0.93)
            tp += bs + int(rng.integers(10, 200))
            qq += bs + int(rng.integers(10, 200))
        gap1_start = tp
        tp += 20_000  # big t-gap where broken chain lives
        sus_start = tp
        sus_len = 250
        p_blocks.append((tp, tp + sus_len, qq, qq + sus_len))  # weak suspect
        idents.append(0.78)
        tp += sus_len
        qq += sus_len
        sus_end = tp
        tp += 22_000  # second big t-gap
        for _ in range(10):  # bigB
            bs = 1500
            p_blocks.append((tp, tp + bs, qq, qq + bs))
            idents.append(0.93)
            tp += bs + int(rng.integers(10, 200))
            qq += bs + int(rng.integers(10, 200))
        pchain = chain_from_blocks(p_blocks, cid, "chrA", t_size, "chrQ1",
                                   q_size, strand)
        cid += 1
        painter.plant(t_seq["chrA"], pchain, idents)
        chains.append(pchain)

        # C: broken chain filling both gaps of P, query elsewhere
        qp2 = qp + 160_000
        if painter.reserve("chrQ1", qp2, qp2 + 100_000):
            c_blocks = []
            c_idents = []
            cqq = qp2
            # left part: inside gap1 (between gap1_start and sus_start)
            ctp = gap1_start + 500
            for _ in range(8):
                bs = 900
                if ctp + bs > sus_start - 500:
                    break
                c_blocks.append((ctp, ctp + bs, cqq, cqq + bs))
                c_idents.append(0.94)
                ctp += bs + int(rng.integers(5, 120))
                cqq += bs + int(rng.integers(5, 120))
            # right part: inside gap2 (between sus_end and B)
            ctp = sus_end + 500
            cqq += 400
            for _ in range(8):
                bs = 900
                if ctp + bs > sus_end + 21_000:
                    break
                c_blocks.append((ctp, ctp + bs, cqq, cqq + bs))
                c_idents.append(0.94)
                ctp += bs + int(rng.integers(5, 120))
                cqq += bs + int(rng.integers(5, 120))
            cchain = chain_from_blocks(c_blocks, cid, "chrA", t_size, "chrQ1",
                                       q_size, "+")
            cid += 1
            painter.plant(t_seq["chrA"], cchain, c_idents)
            chains.append(cchain)
        t_cursor = tp + int(rng.integers(5_000, 20_000))

    # --- RepeatFiller scenarios on chrB: a chain whose gap interior holds a
    # planted (repeat-like) homolog on both sides, eligible for gap filling
    t_size_b = T_CHROMS["chrB"]
    q_size_2 = Q_CHROMS["chrQ2"]
    for rf_i, strand in enumerate(["+", "-"]):
        tp = 10_000 + rf_i * 60_000
        qp = 5_000 + rf_i * 60_000
        rf_blocks = []
        rf_idents = []
        qq = qp
        for _ in range(6):  # left anchor
            bs = 800
            rf_blocks.append((tp, tp + bs, qq, qq + bs))
            rf_idents.append(0.94)
            tp += bs + int(rng.integers(5, 40))
            qq += bs + int(rng.integers(5, 40))
        gap_t_start, gap_q_start = tp, qq
        tp += 2_000   # t gap
        qq += 2_400   # q gap
        for _ in range(6):  # right anchor
            bs = 800
            rf_blocks.append((tp, tp + bs, qq, qq + bs))
            rf_idents.append(0.94)
            tp += bs + int(rng.integers(5, 40))
            qq += bs + int(rng.integers(5, 40))
        rfchain = chain_from_blocks(rf_blocks, cid, "chrB", t_size_b,
                                    "chrQ2", q_size_2, strand)
        cid += 1
        if painter.reserve("chrQ2", qp, qq + 1000):
            painter.plant(t_seq["chrB"], rfchain, rf_idents)
            chains.append(rfchain)
            # plant an 800bp homolog inside the gap (90% identity);
            # coordinates in chain space -> query plus-strand via painter
            frag_t0 = gap_t_start + 600
            frag = mutate(rng, t_seq["chrB"][frag_t0:frag_t0 + 800], 0.90)
            q_chain_pos = gap_q_start + 700
            qarr = painter.seq["chrQ2"]
            if strand == "+":
                qarr[q_chain_pos:q_chain_pos + 800] = frag
            else:
                # chain q coords are rc-space: plus-strand slot is
                # [qSize - (pos+800), qSize - pos)
                qarr[q_size_2 - (q_chain_pos + 800):q_size_2 - q_chain_pos] = \
                    revcomp(frag)

    # --- generic random homologous chains ----------------------------------
    t_items = list(T_CHROMS.items())
    q_items = list(Q_CHROMS.items())
    for _ in range(150):
        tn, ts_ = t_items[int(rng.integers(0, len(t_items)))]
        qn, qs_ = q_items[int(rng.integers(0, len(q_items)))]
        t_pos = int(rng.integers(0, ts_ * 3 // 4))
        q_pos = int(rng.integers(0, qs_ * 3 // 4))
        n_blocks = int(rng.integers(1, 40))
        blocks = gen_colinear_blocks(rng, t_pos, q_pos, n_blocks, ts_, qs_)
        if not blocks:
            continue
        qlo, qhi = blocks[0][2], blocks[-1][3]
        if not painter.reserve(qn, qlo, qhi):
            continue
        strand = "+" if rng.random() < 0.6 else "-"
        ident = float(rng.uniform(0.70, 0.97))
        c = chain_from_blocks(blocks, cid, tn, ts_, qn, qs_, strand)
        cid += 1
        painter.plant(t_seq[tn], c, [ident] * len(blocks))
        chains.append(c)

    # query soft-mask + N features (after planting; changes case / adds Ns)
    for name, size in Q_CHROMS.items():
        s = painter.seq[name]
        for _ in range(size // 10000 + 2):
            st = int(rng.integers(0, size - 1))
            e = min(size, st + int(rng.integers(50, 2500)))
            lo = (s[st:e] >= ord("a"))
            s[st:e][~lo] += 32
        for _ in range(size // 150000 + 1):
            st = int(rng.integers(0, size - 1))
            e = min(size, st + int(rng.integers(20, 200)))
            s[st:e] = ord("N")

    # write inputs
    t2bit = os.path.join(FIX, "target.2bit")
    q2bit = os.path.join(FIX, "query.2bit")
    write_twobit(t2bit, [(n, t_seq[n].tobytes()) for n in T_CHROMS])
    write_twobit(q2bit, [(n, painter.seq[n].tobytes()) for n in Q_CHROMS])
    write_chrom_sizes(T_CHROMS, os.path.join(FIX, "target.chrom.sizes"))
    write_chrom_sizes(Q_CHROMS, os.path.join(FIX, "query.chrom.sizes"))
    with open(os.path.join(FIX, "HoxD55.q"), "w") as f:
        f.write(HOXD55)

    in_chain = os.path.join(FIX, "synthetic.chain")
    write_chains(chains, in_chain)
    print(f"wrote {len(chains)} chains")

    # golden: scoreChain variants
    sc = os.path.join(REF_BIN, "scoreChain")
    run([sc, in_chain, t2bit, q2bit, os.path.join(GOLD, "scoreChain.loose.chain"),
         "-linearGap=loose"])
    run([sc, in_chain, t2bit, q2bit, os.path.join(GOLD, "scoreChain.medium.chain"),
         "-linearGap=medium"])
    run([sc, in_chain, t2bit, q2bit, os.path.join(GOLD, "scoreChain.hoxd55.chain"),
         "-linearGap=loose", f"-scoreScheme={os.path.join(FIX, 'HoxD55.q')}"])
    run([sc, in_chain, t2bit, q2bit, os.path.join(GOLD, "scoreChain.scores.tsv"),
         "-linearGap=loose", "-returnOnlyScore"])
    run([sc, in_chain, t2bit, q2bit, os.path.join(GOLD, "scoreChain.coords.tsv"),
         "-linearGap=loose", "-returnOnlyScoreAndCoords"])
    run([sc, in_chain, t2bit, q2bit, os.path.join(GOLD, "scoreChain.local.chain"),
         "-linearGap=loose", "-forceLocalScore"])

    # score-sorted rescored chains (input to netting etc.)
    sorted_chain = os.path.join(FIX, "synthetic.scored.sorted.chain")
    run([os.path.join(KENT_BIN, "chainSort"),
         os.path.join(GOLD, "scoreChain.loose.chain"), sorted_chain])

    # golden: chainNet without and with rescore
    cn = os.path.join(REF_BIN, "chainNet")
    run([cn, sorted_chain, os.path.join(FIX, "target.chrom.sizes"),
         os.path.join(FIX, "query.chrom.sizes"),
         os.path.join(GOLD, "chainNet.target.net"),
         os.path.join(GOLD, "chainNet.query.net")])
    run([cn, sorted_chain, os.path.join(FIX, "target.chrom.sizes"),
         os.path.join(FIX, "query.chrom.sizes"),
         os.path.join(GOLD, "chainNetRescore.target.net"),
         os.path.join(GOLD, "chainNetRescore.query.net"),
         "-rescore", f"-tNibDir={t2bit}", f"-qNibDir={q2bit}",
         "-linearGap=loose"])

    # the same netting pipeline chainCleaner runs internally
    # (chainCleaner.c:1660: chainNet -minScore=0 | NetFilterNonNested
    # -minScore1 3000); run it explicitly since system() needs bash.
    prenet = os.path.join(FIX, "cleaner_input.net")
    env = dict(os.environ)
    env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]
    subprocess.run(
        ["bash", "-c",
         f"set -o pipefail; chainNet -minScore=0 {sorted_chain} "
         f"{os.path.join(FIX, 'target.chrom.sizes')} "
         f"{os.path.join(FIX, 'query.chrom.sizes')} stdout /dev/null | "
         f"NetFilterNonNested.perl /dev/stdin -minScore1 3000 > {prenet}"],
        check=True, env=env)

    # golden: chainCleaner with the pre-made net
    cc = os.path.join(REF_BIN, "chainCleaner")
    run([cc, sorted_chain, t2bit, q2bit,
         os.path.join(GOLD, "chainCleaner.out.chain"),
         os.path.join(GOLD, "chainCleaner.removedSuspects.bed"),
         f"-net={prenet}",
         "-linearGap=loose"])

    # goldens for the debug/introspection surface (-debug writes fixed CWD
    # file names, chainCleaner.c:1818-1822; -suspectDataFile suppresses
    # removals, c:1282-1310; -onlyThis* restricts to one suspect region,
    # c:999-1003); the -onlyThis region is the 2nd removed suspect above
    dbgdir = os.path.join(GOLD, "chainCleaner.debug")
    os.makedirs(dbgdir, exist_ok=True)
    tmp_dbg = os.path.join(FIX, "_dbg_tmp")
    os.makedirs(tmp_dbg, exist_ok=True)
    subprocess.run(
        [cc, sorted_chain, t2bit, q2bit,
         os.path.join(tmp_dbg, "dbg.out.chain"),
         os.path.join(tmp_dbg, "dbg.bed"),
         f"-net={prenet}", "-linearGap=loose", "-debug"],
        check=True, env=env, cwd=tmp_dbg, capture_output=True)
    for name in ("chainsOfInterest.chain", "suspect.chain",
                 "brokenChainLfill.chain", "brokenChainRfill.chain",
                 "brokenChainfill.chain", "suspectsAndFills.bed"):
        os.replace(os.path.join(tmp_dbg, name), os.path.join(dbgdir, name))
    run([cc, sorted_chain, t2bit, q2bit,
         os.path.join(GOLD, "chainCleaner.suspectData.out.chain"),
         os.path.join(tmp_dbg, "sd.bed"),
         f"-net={prenet}", "-linearGap=loose",
         "-suspectDataFile=" + os.path.join(GOLD,
                                            "chainCleaner.suspectData.tsv")])
    run([cc, sorted_chain, t2bit, q2bit,
         os.path.join(GOLD, "chainCleaner.onlyThis.out.chain"),
         os.path.join(GOLD, "chainCleaner.onlyThis.bed"),
         f"-net={prenet}", "-linearGap=loose", "-onlyThisChr=chrA",
         "-onlyThisStart=382753", "-onlyThisEnd=383003"])
    import shutil as _shutil
    _shutil.rmtree(tmp_dbg)

    # ------------------------------------------------------------------
    # goldens for the stock kent tool suite
    # ------------------------------------------------------------------
    KB = KENT_BIN
    tsz = os.path.join(FIX, "target.chrom.sizes")
    qsz = os.path.join(FIX, "query.chrom.sizes")

    run([os.path.join(KB, "chainPreNet"), sorted_chain, tsz, qsz,
         os.path.join(GOLD, "chainPreNet.chain")])
    run([os.path.join(KB, "chainSwap"), sorted_chain,
         os.path.join(GOLD, "chainSwap.chain")])
    run([os.path.join(KB, "chainToAxt"), sorted_chain, t2bit, q2bit,
         os.path.join(GOLD, "chainToAxt.axt")])
    run([os.path.join(KB, "chainToAxt"), "-minId=60", "-minScore=1000",
         sorted_chain, t2bit, q2bit, os.path.join(GOLD, "chainToAxt.minid.axt")])
    run([os.path.join(KB, "chainToAxt"), "-bed", sorted_chain, t2bit, q2bit,
         os.path.join(GOLD, "chainToAxt.bed")])
    with open(os.path.join(GOLD, "chainPreNet.dots.txt"), "w") as dots_f:
        subprocess.run([os.path.join(KB, "chainPreNet"), "-dots=3",
                        sorted_chain, tsz, qsz, os.devnull],
                       stdout=dots_f, check=True)

    # axtToMaf -tSplit: sorted axt fixture + per-target maf golden dir
    sorted_axt = os.path.join(FIX, "sorted.axt")
    run([os.path.join(KB, "axtSort"),
         os.path.join(GOLD, "chainToAxt.axt"), sorted_axt])
    tsplit_dir = os.path.join(GOLD, "axtToMaf.tsplit")
    os.makedirs(tsplit_dir, exist_ok=True)
    run([os.path.join(KB, "axtToMaf"), "-tSplit", "-qPrefix=q.",
         sorted_axt, tsz, qsz, tsplit_dir])
    run([os.path.join(KB, "chainAntiRepeat"), t2bit, q2bit, sorted_chain,
         os.path.join(GOLD, "chainAntiRepeat.chain")])

    # chainFilter variants (stdout tools)
    env2 = dict(os.environ)
    env2["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env2["PATH"]
    for name, args in [
        ("chainFilter.minScore", ["-minScore=100000"]),
        ("chainFilter.tStrand", ["-t=chrA", "-strand=-"]),
        ("chainFilter.zeroGap", ["-zeroGap", "-long"]),
    ]:
        with open(os.path.join(GOLD, name + ".chain"), "w") as fh:
            subprocess.run([os.path.join(KB, "chainFilter")] + args
                           + [sorted_chain], check=True, stdout=fh, env=env2)

    # chainStitchId: fragment chains sharing ids
    frag_path = os.path.join(FIX, "fragments.chain")
    from genomealignmenttools_tpu.formats.chain import read_chains as rc2, \
        write_chains as wc2
    frag_out = []
    for c in rc2(sorted_chain):
        if c.n_blocks > 6:
            mid = c.n_blocks // 2
            c1 = Chain(score=c.score / 2, t_name=c.t_name, t_size=c.t_size,
                       t_start=int(c.blocks[0, 0]), t_end=int(c.blocks[mid - 1, 1]),
                       q_name=c.q_name, q_size=c.q_size, q_strand=c.q_strand,
                       q_start=int(c.blocks[0, 2]), q_end=int(c.blocks[mid - 1, 3]),
                       id=c.id, blocks=c.blocks[:mid].copy())
            c2 = Chain(score=c.score / 2, t_name=c.t_name, t_size=c.t_size,
                       t_start=int(c.blocks[mid, 0]), t_end=int(c.blocks[-1, 1]),
                       q_name=c.q_name, q_size=c.q_size, q_strand=c.q_strand,
                       q_start=int(c.blocks[mid, 2]), q_end=int(c.blocks[-1, 3]),
                       id=c.id, blocks=c.blocks[mid:].copy())
            frag_out.extend([c1, c2])
        else:
            frag_out.append(c)
    wc2(frag_out, frag_path)
    run([os.path.join(KB, "chainStitchId"), frag_path,
         os.path.join(GOLD, "chainStitchId.chain")])

    # chainMergeSort: 3 score-sorted slices
    parts = [[], [], []]
    for i, c in enumerate(rc2(sorted_chain)):
        parts[i % 3].append(c)
    part_paths = []
    for i, p in enumerate(parts):
        pp = os.path.join(FIX, f"mergepart{i}.chain")
        wc2(p, pp)
        part_paths.append(pp)
    with open(os.path.join(GOLD, "chainMergeSort.chain"), "w") as fh:
        subprocess.run([os.path.join(KB, "chainMergeSort")] + part_paths,
                       check=True, stdout=fh, env=env2)

    # chainSplit golden dir
    split_dir = os.path.join(GOLD, "chainSplit")
    if os.path.isdir(split_dir):
        import shutil
        shutil.rmtree(split_dir)
    run([os.path.join(KB, "chainSplit"), split_dir, sorted_chain])

    # net tool goldens on the chainNet target net
    tnet = os.path.join(GOLD, "chainNet.target.net")
    run([os.path.join(KB, "netSyntenic"), tnet,
         os.path.join(GOLD, "netSyntenic.net")])
    with open(os.path.join(GOLD, "netFilter.syn.net"), "w") as fh:
        subprocess.run([os.path.join(KB, "netFilter"), "-syn",
                        os.path.join(GOLD, "netSyntenic.net")],
                       check=True, stdout=fh, env=env2)
    with open(os.path.join(GOLD, "netFilter.minScore.net"), "w") as fh:
        subprocess.run([os.path.join(KB, "netFilter"), "-minScore=20000",
                        tnet], check=True, stdout=fh, env=env2)
    run([os.path.join(KB, "netToBed"), tnet,
         os.path.join(GOLD, "netToBed.simple.bed")])
    run([os.path.join(KB, "netToBed"), "-maxGap=1000", "-minFill=100", tnet,
         os.path.join(GOLD, "netToBed.detailed.bed")])
    split_net_dir = os.path.join(GOLD, "netSplit")
    if os.path.isdir(split_net_dir):
        import shutil
        shutil.rmtree(split_net_dir)
    run([os.path.join(KB, "netSplit"), tnet, split_net_dir])
    run([os.path.join(KB, "netToAxt"), tnet, sorted_chain, t2bit, q2bit,
         os.path.join(GOLD, "netToAxt.axt")])
    print("kent tool-suite goldens written")


    # --- converter tool goldens -----------------------------------------
    run([os.path.join(KB, "chainToPslBasic"), sorted_chain,
         os.path.join(GOLD, "chainToPslBasic.psl")])
    run([os.path.join(KB, "chainToPsl"), sorted_chain, tsz, qsz,
         t2bit, q2bit, os.path.join(GOLD, "chainToPsl.psl")])
    with open(os.path.join(GOLD, "chainOverlap.chain"), "w") as fh:
        subprocess.run([os.path.join(KB, "chainOverlap"), sorted_chain],
                       check=True, stdout=fh, env=env2)
    axt_golden = os.path.join(GOLD, "chainToAxt.axt")
    run([os.path.join(KB, "axtToPsl"), axt_golden, tsz, qsz,
         os.path.join(GOLD, "axtToPsl.psl")])
    run([os.path.join(KB, "axtSort"), axt_golden,
         os.path.join(GOLD, "axtSort.axt")])
    run([os.path.join(KB, "axtSwap"), axt_golden, tsz, qsz,
         os.path.join(GOLD, "axtSwap.axt")])
    run([os.path.join(KB, "axtToMaf"), axt_golden, tsz, qsz,
         os.path.join(GOLD, "axtToMaf.maf")])
    run([os.path.join(KB, "axtToMaf"), "-tPrefix=hg.", "-qPrefix=mm.",
         axt_golden, tsz, qsz, os.path.join(GOLD, "axtToMaf.prefixed.maf")])
    maf_plain = os.path.join(GOLD, "axtToMaf.maf")
    maf_pref = os.path.join(GOLD, "axtToMaf.prefixed.maf")
    run([os.path.join(KB, "mafToAxt"), maf_plain, "first", "chrQ",
         os.path.join(GOLD, "mafToAxt.axt")])
    run([os.path.join(KB, "mafToPsl"), "mm", "hg", maf_pref,
         os.path.join(GOLD, "mafToPsl.psl")])
    run([os.path.join(KB, "mafToFa"), maf_plain,
         os.path.join(GOLD, "mafToFa.fa")])
    run([os.path.join(KB, "mafRanges"), maf_pref, "hg",
         os.path.join(GOLD, "mafRanges.bed")])
    run([os.path.join(KB, "mafRanges"), "-otherDb=mm", "-notAllOGap",
         maf_pref, "hg", os.path.join(GOLD, "mafRanges.mindgaps.bed")])
    run([os.path.join(KB, "mafNoAlign"), maf_pref,
         os.path.join(GOLD, "mafNoAlign.bed")])
    print("converter goldens written")

    make_lav_fixtures(env2, KB, t2bit, q2bit)

    nbed = sum(1 for _ in open(os.path.join(GOLD, "chainCleaner.removedSuspects.bed")))
    print(f"chainCleaner removed {nbed} suspects")
    if nbed == 0:
        print("WARNING: no suspects removed - fixture lacks breaking scenarios")
    print("fixtures + goldens written")


_LAV_D_STANZA = """\
d {
  "lastz.v1.04.00 target query --gapped --format=lav
     A    C    G    T
    91 -114  -31 -123
  -114  100 -125  -31
   -31 -125  100 -114
  -123  -31 -114   91
   O = 400, E = 30, K = 3000, L = 3000, M = 50"
}
"""


def _lav_blocks_from_axt(axt) -> list[tuple[int, int, int, int, int]]:
    """Ungapped segments of an axt as 0-based (tS,tE,qS,qE,pctId)."""
    out = []
    q_pos, t_pos = axt.q_start, axt.t_start
    seg = None  # [tS, qS, len, matches]
    for qc, tc in zip(axt.q_sym + "-", axt.t_sym + "-"):
        if qc != "-" and tc != "-":
            if seg is None:
                seg = [t_pos, q_pos, 0, 0]
            seg[2] += 1
            if qc.upper() == tc.upper():
                seg[3] += 1
        else:
            if seg is not None and seg[2] > 0:
                pid = int(100.0 * seg[3] / seg[2] + 0.5)
                out.append((seg[0], seg[0] + seg[2], seg[1],
                            seg[1] + seg[2], max(pid, 1)))
            seg = None
        q_pos += 1 if qc != "-" else 0
        t_pos += 1 if tc != "-" else 0
    return out


def _write_nib(path: str, chars: bytes) -> None:
    from genomealignmenttools_tpu.formats.nib import write_nib
    write_nib(path, chars)


def make_lav_fixtures(env2, KB, t2bit, q2bit):
    """Build synthetic.lav (from the chainToAxt golden), self.lav (diagonal
    crossings for -dropSelf), nib/fasta sequence variants, and the
    lavToPsl/lavToAxt goldens."""
    from genomealignmenttools_tpu.formats.axt import read_axts
    from genomealignmenttools_tpu.formats.twobit import TwoBitFile

    t_tbf, q_tbf = TwoBitFile(t2bit), TwoBitFile(q2bit)

    def a_stanza(score, blocks, out):
        out.append("a {")
        out.append(f"  s {score}")
        out.append(f"  b {blocks[0][0] + 1} {blocks[0][2] + 1}")
        out.append(f"  e {blocks[-1][1]} {blocks[-1][3]}")
        for ts, te, qs, qe, pid in blocks:
            out.append(f"  l {ts + 1} {qs + 1} {te} {qe} {pid}")
        out.append("}")

    # --- synthetic.lav from the chainToAxt golden axts -------------------
    axts = read_axts(os.path.join(GOLD, "chainToAxt.axt"))
    lines = ["#:lav", _LAV_D_STANZA.rstrip("\n")]
    cur_key = None
    for axt in axts:
        key = (axt.t_name, axt.q_name, axt.q_strand)
        if key != cur_key:
            cur_key = key
            t_size = t_tbf.seq_size(axt.t_name)
            q_size = q_tbf.seq_size(axt.q_name)
            lines.append("s {")
            lines.append(f'  "target" 1 {t_size} 0 1')
            lines.append(f'  "query" 1 {q_size} 0 1')
            lines.append("}")
            lines.append("h {")
            lines.append(f'  ">{axt.t_name}"')
            rc = " (reverse complement)" if axt.q_strand == "-" else ""
            lines.append(f'  ">{axt.q_name}{rc}"')
            lines.append("}")
        blocks = _lav_blocks_from_axt(axt)
        if blocks:
            a_stanza(max(axt.score, 1), blocks, lines)
    lav_path = os.path.join(FIX, "synthetic.lav")
    with open(lav_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    # --- self.lav: chrA vs chrA with diagonal-crossing blocks ------------
    t_size = t_tbf.seq_size("chrA")
    lines = ["#:lav",
             "s {", f'  "target" 1 {t_size} 0 1', f'  "target" 1 {t_size} 0 1',
             "}",
             "h {", '  ">chrA"', '  ">chrA"', "}"]
    # forward: far-from-diagonal stanza, then one crossing the diagonal
    a_stanza(5000, [(1000, 1500, 501000, 501500, 93),
                    (1520, 1900, 501500, 501880, 90)], lines)
    a_stanza(4000, [(2000, 2300, 8000, 8300, 92),
                    (2320, 2500, 8300, 8480, 91),
                    (5000, 5200, 5100, 5300, 99),     # on diagonal
                    (6000, 6200, 9000, 9200, 88),
                    (6210, 6410, 9200, 9400, 87)], lines)
    # reverse-complement section with a diagonal crossing in forward space
    lines += ["h {", '  ">chrA"', '  ">chrA (reverse complement)"', "}"]
    a_stanza(3000, [(100000, 100150, 250000, 250150, 90),
                    (100160, 100310, 250150, 250300, 91),
                    (300000, 300200, t_size - 300200, t_size - 300000, 99),
                    (400000, 400150, 500000, 500150, 89),
                    (400150, 400300, 500160, 500310, 88)], lines)
    self_lav = os.path.join(FIX, "self.lav")
    with open(self_lav, "w") as f:
        f.write("\n".join(lines) + "\n")

    # --- nib + fasta sequence variants ----------------------------------
    for sub, tbf in (("target", t_tbf), ("query", q_tbf)):
        nib_dir = os.path.join(FIX, "nib", sub)
        os.makedirs(nib_dir, exist_ok=True)
        for name in tbf.seq_names():
            _write_nib(os.path.join(nib_dir, f"{name}.nib"),
                       tbf.read_seq(name).chars(do_mask=True))
    qfa = os.path.join(FIX, "query.fa")
    with open(qfa, "w") as f:
        for name in q_tbf.seq_names():
            chars = q_tbf.read_seq(name).chars(do_mask=True).decode()
            f.write(f">{name}\n")
            for i in range(0, len(chars), 50):
                f.write(chars[i:i + 50] + "\n")

    # --- goldens ---------------------------------------------------------
    run([os.path.join(KB, "lavToPsl"), lav_path,
         os.path.join(GOLD, "lavToPsl.psl")])
    run([os.path.join(KB, "lavToPsl"), "-bed", lav_path,
         os.path.join(GOLD, "lavToPsl.bed")])
    run([os.path.join(KB, "lavToPsl"), "-target-strand=+",
         f"-scoreFile={os.path.join(GOLD, 'lavToPsl.scores.txt')}",
         lav_path, os.path.join(GOLD, "lavToPsl.tstrand.psl")])
    run([os.path.join(KB, "lavToAxt"), lav_path, t2bit, q2bit,
         os.path.join(GOLD, "lavToAxt.axt")])
    run([os.path.join(KB, "lavToAxt"), lav_path,
         os.path.join(FIX, "nib", "target"), os.path.join(FIX, "nib", "query"),
         os.path.join(GOLD, "lavToAxt.nib.axt")])
    run([os.path.join(KB, "lavToAxt"), "-fa", lav_path, t2bit, qfa,
         os.path.join(GOLD, "lavToAxt.fa.axt")])
    run([os.path.join(KB, "lavToAxt"), "-dropSelf", self_lav, t2bit, t2bit,
         os.path.join(GOLD, "lavToAxt.dropSelf.axt")])
    run([os.path.join(KB, "lavToAxt"), "-dropSelf",
         f"-scoreScheme={os.path.join(FIX, 'HoxD55.q')}",
         self_lav, t2bit, t2bit,
         os.path.join(GOLD, "lavToAxt.dropSelf.hoxd55.axt")])
    print("lav goldens written")

    # --- pslMrnaCover fixture + goldens ----------------------------------
    rng = np.random.default_rng(4242)
    fa_lines = []
    psl_lines = []
    for i in range(24):
        name = f"mrna{i:02d}"
        size = int(rng.integers(60, 1400))
        seq = "".join("ACGT"[b] for b in rng.integers(0, 4, size))
        fa_lines.append(f">{name}")
        fa_lines += [seq[j:j + 50] for j in range(0, size, 50)]
        n_ali = int(rng.integers(0, 3))  # 0..2 alignments per mRNA
        for _ in range(n_ali):
            ali = int(rng.integers(1, size + 1))
            match = int(rng.integers(0, ali + 1))
            mis = ali - match
            t_start = int(rng.integers(0, 50000))
            psl_lines.append("\t".join(map(str, [
                match, mis, 0, 0, 0, 0, 0, 0, "+", name, size, 0, ali,
                "chrT", 100000, t_start, t_start + ali, 1,
                f"{ali},", "0,", f"{t_start},"])))
    mrna_fa = os.path.join(FIX, "mrna.fa")
    mrna_psl = os.path.join(FIX, "mrna.psl")
    with open(mrna_fa, "w") as f:
        f.write("\n".join(fa_lines) + "\n")
    with open(mrna_psl, "w") as f:
        f.write("\n".join(psl_lines) + "\n")
    with open(os.path.join(GOLD, "pslMrnaCover.txt"), "w") as fh:
        subprocess.run(
            [os.path.join(KB, "pslMrnaCover"),
             f"-listZero={os.path.join(GOLD, 'pslMrnaCover.zero.tab')}",
             mrna_psl, mrna_fa], check=True, stdout=fh, env=env2)
    with open(os.path.join(GOLD, "pslMrnaCover.minSize500.txt"), "w") as fh:
        subprocess.run(
            [os.path.join(KB, "pslMrnaCover"), "-minSize=500",
             mrna_psl, mrna_fa], check=True, stdout=fh, env=env2)
    print("pslMrnaCover goldens written")

    make_example_goldens(env2, KB)


def make_example_goldens(env2, KB):
    """Goldens from the reference's own bundled example data
    (/root/reference/example): every sequence-free tool, byte-for-byte.
    The example 2bit genomes are not bundled, so sequence-dependent tools
    (scoreChain etc.) are covered by the synthetic fixtures instead."""
    ex = "/root/reference/example"
    if not os.path.isdir(ex):
        print("reference example dir missing; skipping example goldens")
        return
    chain = os.path.join(ex, "hg38.danRer10.chain")
    tsz = os.path.join(ex, "hg38.chrom.sizes")
    qsz = os.path.join(ex, "danRer10.chrom.sizes")
    exdir = os.path.join(GOLD, "example")
    os.makedirs(exdir, exist_ok=True)

    def out(name):
        return os.path.join(exdir, name)

    run([os.path.join(KB, "chainSort"), chain, out("chainSort.chain")])
    srt = out("chainSort.chain")
    run([os.path.join(KB, "chainPreNet"), srt, tsz, qsz,
         out("chainPreNet.chain")])
    run([os.path.join(REF_BIN, "chainNet"), srt, tsz, qsz,
         out("chainNet.tnet"), out("chainNet.qnet"), "-minSpace=1"])
    run([os.path.join(KB, "netSyntenic"), out("chainNet.tnet"),
         out("netSyntenic.net")])
    run([os.path.join(KB, "netToBed"), out("chainNet.tnet"),
         out("netToBed.bed")])
    with open(out("netFilter.minScore.net"), "w") as fh:
        subprocess.run([os.path.join(KB, "netFilter"), "-minScore=5000",
                        out("chainNet.tnet")], check=True, stdout=fh,
                       env=env2)
    with open(out("chainFilter.minScore.chain"), "w") as fh:
        subprocess.run([os.path.join(KB, "chainFilter"), "-minScore=10000",
                        srt], check=True, stdout=fh, env=env2)
    run([os.path.join(KB, "chainStitchId"), srt, out("chainStitchId.chain")])
    run([os.path.join(KB, "chainSwap"), srt, out("chainSwap.chain")])
    run([os.path.join(KB, "chainToPslBasic"), srt,
         out("chainToPslBasic.psl")])
    with open(out("chainOverlap.chain"), "w") as fh:
        subprocess.run([os.path.join(KB, "chainOverlap"), srt],
                       check=True, stdout=fh, env=env2)
    # score filter + keepSyn/keepInv (the flags that trigger type parsing;
    # the un-netClassed `type X` line-end form is handled by the perl's
    # `type (\w+)$` fallback)
    with open(out("NetFilterNonNested.net"), "w") as fh:
        subprocess.run([os.path.join(REF_BIN, "NetFilterNonNested.perl"),
                        "-doScoreFilter", "-minScore1", "5000",
                        "-keepSynNetsWithScore", "5000",
                        "-keepInvNetsWithScore", "5000",
                        out("netSyntenic.net")],
                       check=True, stdout=fh, env=env2)
    print("reference-example goldens written")


def make_meta_goldens():
    """Goldens for '#' metadata-line passthrough (lineFileSetMetaDataOutput,
    linefile.c:93-101): chainSort/chainMergeSort/chainPreNet/chainAntiRepeat/
    chainSplit/netSyntenic/netToAxt/axtToMaf/chainCleaner each echo input
    meta lines to their output with tool-specific placement."""
    env2 = dict(os.environ)
    env2["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env2["PATH"]
    KB = KENT_BIN
    tsz = os.path.join(FIX, "target.chrom.sizes")
    qsz = os.path.join(FIX, "query.chrom.sizes")
    t2bit = os.path.join(FIX, "target.2bit")
    q2bit = os.path.join(FIX, "query.2bit")
    sorted_chain = os.path.join(FIX, "synthetic.scored.sorted.chain")

    def inject_chain_meta(src, dst, top, after_first_chain, in_blocks=None):
        """Insert meta lines: `top` before everything, `after_first_chain`
        after the first chain's final (1-field) block line, `in_blocks`
        right after the first 3-field block line of the first chain."""
        lines = open(src).read().splitlines()
        out = list(top)
        seen_block = False
        done_mid = False
        done_blocks = in_blocks is None
        for ln in lines:
            out.append(ln)
            w = ln.split()
            if (not done_blocks and len(w) == 3 and not ln.startswith("chain")
                    and not seen_block):
                out.extend(in_blocks)
                seen_block = True
                done_blocks = True
            if (not done_mid and len(w) == 1 and w[0].isdigit()
                    and not ln.startswith("chain")):
                out.extend(after_first_chain)
                done_mid = True
        open(dst, "w").write("\n".join(out) + "\n")

    meta_chain = os.path.join(FIX, "meta.chain")
    inject_chain_meta(sorted_chain, meta_chain,
                      top=["# meta top line 1", "## dup meta"],
                      after_first_chain=["## dup meta", "# meta between chains"],
                      in_blocks=["# meta inside block list"])

    run([os.path.join(KB, "chainSort"), meta_chain,
         os.path.join(GOLD, "meta.chainSort.chain")])
    run([os.path.join(KB, "chainPreNet"), meta_chain, tsz, qsz,
         os.path.join(GOLD, "meta.chainPreNet.chain")])
    run([os.path.join(KB, "chainAntiRepeat"), t2bit, q2bit, meta_chain,
         os.path.join(GOLD, "meta.chainAntiRepeat.chain")])

    split_dir = os.path.join(GOLD, "meta.chainSplit")
    if os.path.isdir(split_dir):
        import shutil
        shutil.rmtree(split_dir)
    run([os.path.join(KB, "chainSplit"), split_dir, meta_chain])

    # chainMergeSort over two meta-bearing sorted parts
    part_a = os.path.join(FIX, "meta.mergeA.chain")
    part_b = os.path.join(FIX, "meta.mergeB.chain")
    inject_chain_meta(os.path.join(FIX, "mergepart0.chain"), part_a,
                      top=["# part A meta", "## shared meta"],
                      after_first_chain=["# part A mid meta"])
    inject_chain_meta(os.path.join(FIX, "mergepart1.chain"), part_b,
                      top=["# part B meta", "## shared meta"],
                      after_first_chain=[])
    with open(os.path.join(GOLD, "meta.chainMergeSort.chain"), "w") as fh:
        subprocess.run([os.path.join(KB, "chainMergeSort"), part_a, part_b],
                       check=True, stdout=fh, env=env2)

    # chainCleaner passes chain-input meta through to the cleaned output
    prenet = os.path.join(FIX, "cleaner_input.net")
    run([os.path.join(REF_BIN, "chainCleaner"), meta_chain, t2bit, q2bit,
         os.path.join(GOLD, "meta.chainCleaner.chain"),
         os.path.join(GOLD, "meta.chainCleaner.bed"),
         f"-net={prenet}", "-linearGap=loose"])

    # net meta: netSyntenic + netToAxt echo net-file meta
    def inject_top_mid(src, dst, top, mid_after_line):
        lines = open(src).read().splitlines()
        out = list(top)
        for i, ln in enumerate(lines):
            out.append(ln)
            if i == mid_after_line:
                out.append("# net mid meta")
        open(dst, "w").write("\n".join(out) + "\n")

    meta_net = os.path.join(FIX, "meta.net")
    inject_top_mid(os.path.join(GOLD, "chainNet.target.net"), meta_net,
                   top=["# net top meta", "## net dup", "## net dup"],
                   mid_after_line=4)
    run([os.path.join(KB, "netSyntenic"), meta_net,
         os.path.join(GOLD, "meta.netSyntenic.net")])
    run([os.path.join(KB, "netToAxt"), meta_net, sorted_chain, t2bit, q2bit,
         os.path.join(GOLD, "meta.netToAxt.axt")])

    # axt meta: axtToMaf echoes axt-file meta after the maf header
    meta_axt = os.path.join(FIX, "meta.axt")
    lines = open(os.path.join(GOLD, "chainToAxt.axt")).read().splitlines()
    blank_seen = 0
    out = ["# axt top meta", "## axt meta 2"]
    for ln in lines:
        out.append(ln)
        if ln == "" and blank_seen == 0:
            out.append("# axt mid meta")
            blank_seen = 1
    open(meta_axt, "w").write("\n".join(out) + "\n")
    run([os.path.join(KB, "axtToMaf"), meta_axt, tsz, qsz,
         os.path.join(GOLD, "meta.axtToMaf.maf")])
    print("meta-passthrough goldens written")


def make_repeatfiller_golden():
    """Regenerate repeatfiller_reference_output.chain by running the
    *reference* RepeatFiller.py (src/RepeatFiller.py) with
    tests/fake_lastz.py standing in for lastz (it runs this repo's
    GapAligner with the K/L/W parameters parsed from the lastz command
    the reference builds) and the locally-built kent axtChain/chainSort
    binaries - so the golden exercises the reference's gap walk, shell
    protocol and splice arithmetic end to end."""
    here = os.path.dirname(os.path.abspath(__file__))
    fake = os.path.join(here, "fake_lastz.py")
    ref_rf = "/root/reference/src/RepeatFiller.py"
    out = os.path.join(GOLD, "repeatfiller_reference_output.chain")
    # NB: -o (not stdout) - the reference's stdout path print()s each
    # already-newline-terminated line, doubling every newline
    # (RepeatFiller.py:798-801); the -o path is the one tools consume
    run([sys.executable, ref_rf,
         "-c", os.path.join(FIX, "repeatfiller_input.chain"),
         "-T2", os.path.join(FIX, "target.2bit"),
         "-Q2", os.path.join(FIX, "query.2bit"),
         "--lastz", fake,
         "--axtChain", os.path.join(KENT_BIN, "axtChain"),
         "--chainSort", os.path.join(KENT_BIN, "chainSort"),
         "-o", out])


if __name__ == "__main__":
    main()
    make_meta_goldens()
    make_repeatfiller_golden()

"""Deterministic large synthetic workload for benchmarking chain rescoring.

Builds a target/query genome pair with planted homologous chains (same
construction idea as tests/make_fixtures.py but much larger) and writes
2bit + chain files so both this framework and the reference C scoreChain
can run the identical workload.
"""

from __future__ import annotations

import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

_COMP_LUT = np.arange(256, dtype=np.uint8)
for _a, _b in ((65, 84), (67, 71)):
    _COMP_LUT[_a], _COMP_LUT[_b] = _b, _a


def build_workload(out_dir: str, t_size: int = 64_000_000,
                   n_chains: int = 96, blocks_per_chain: int = 8000,
                   block_len: int = 120, seed: int = 7) -> dict:
    """Create genome + chain files; returns metadata (cached if present)."""
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "META.txt")
    chain_path = os.path.join(out_dir, "bench.chain")
    t2bit = os.path.join(out_dir, "t.2bit")
    q2bit = os.path.join(out_dir, "q.2bit")
    key = f"{t_size},{n_chains},{blocks_per_chain},{block_len},{seed},v3"
    if os.path.exists(meta_path) and open(meta_path).read().split("\n")[0] == key:
        ali = int(open(meta_path).read().split("\n")[1])
        return {"chain": chain_path, "t2bit": t2bit, "q2bit": q2bit,
                "aligned_bases": ali}

    from ..formats.chain import Chain, write_chains
    from ..formats.twobit import write_twobit

    rng = np.random.default_rng(seed)
    # 2 random bits per base via raw bytes (5-10x faster than rng.integers
    # at chr1 scale)
    t_seq = BASES[np.frombuffer(rng.bytes(t_size), np.uint8) & 3]
    q_size = t_size
    q_seq = BASES[np.frombuffer(rng.bytes(q_size), np.uint8) & 3].copy()

    # each chain: colinear run of blocks with small gaps; query side copied
    # from target with ~8% divergence
    chains = []
    aligned = 0
    span_per_chain = t_size // n_chains
    for ci in range(n_chains):
        t0 = ci * span_per_chain + 1000
        q0 = ci * span_per_chain + 500
        gap_t = rng.integers(0, 60, blocks_per_chain)
        gap_q = rng.integers(0, 60, blocks_per_chain)
        sizes = rng.integers(block_len // 2, block_len * 3 // 2,
                             blocks_per_chain)
        t_starts = t0 + np.concatenate(
            [[0], np.cumsum(sizes[:-1] + gap_t[:-1])])
        q_starts = q0 + np.concatenate(
            [[0], np.cumsum(sizes[:-1] + gap_q[:-1])])
        t_ends = t_starts + sizes
        q_ends = q_starts + sizes
        if t_ends[-1] >= t_size or q_ends[-1] >= q_size:
            keep = (t_ends < t_size) & (q_ends < q_size)
            t_starts, t_ends = t_starts[keep], t_ends[keep]
            q_starts, q_ends = q_starts[keep], q_ends[keep]
            sizes = sizes[keep]
        blocks = np.stack([t_starts, t_ends, q_starts, q_ends], 1).astype(np.int64)
        strand = "+" if ci % 3 else "-"
        aligned += int(sizes.sum())
        # plant homology: copy target block content into query (plus strand
        # coords), mutating ~8% - fully vectorized over the chain's blocks
        bsizes = (blocks[:, 1] - blocks[:, 0])
        total = int(bsizes.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(bsizes) - bsizes, bsizes)
        idx_t = np.repeat(blocks[:, 0], bsizes) + within
        frag = t_seq[idx_t]
        mut = np.frombuffer(rng.bytes(total), np.uint8) < 20  # ~8%
        nmut = int(mut.sum())
        if nmut:
            frag[mut] = BASES[np.frombuffer(rng.bytes(nmut), np.uint8) & 3]
        if strand == "+":
            q_seq[np.repeat(blocks[:, 2], bsizes) + within] = frag
        else:
            # query char at q_size-1-(qs+within) = complement(frag)
            idx_q = q_size - 1 - (np.repeat(blocks[:, 2], bsizes) + within)
            q_seq[idx_q] = _COMP_LUT[frag]
        chains.append(Chain(
            score=1.0, t_name="chrT", t_size=t_size,
            t_start=int(blocks[0, 0]), t_end=int(blocks[-1, 1]),
            q_name="chrQ", q_size=q_size, q_strand=strand,
            q_start=int(blocks[0, 2]), q_end=int(blocks[-1, 3]),
            id=ci + 1, blocks=blocks))

    write_twobit(t2bit, [("chrT", t_seq.tobytes())])
    write_twobit(q2bit, [("chrQ", q_seq.tobytes())])
    write_chains(chains, chain_path)
    with open(meta_path, "w") as f:
        f.write(f"{key}\n{aligned}\n")
    return {"chain": chain_path, "t2bit": t2bit, "q2bit": q2bit,
            "aligned_bases": aligned}

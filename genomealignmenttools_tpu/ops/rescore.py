"""Batched per-base block scoring on device - the toolkit's hot inner loop.

Replaces chainScoreBlock (kent chainConnect.c:14-22): for every aligned
block, sum matrix[q[i]][t[i]] over its bases.  This is >95% of the work in
scoreChain / chainNet -rescore / chainCleaner (per-base matrix lookups over
up to hundreds of Mb), so it runs on the TPU:

- genomes live in HBM as uint8 code arrays (T=0 C=1 A=2 G=3 N=4), one
  array per (chrom, strand)
- blocks are shipped as tiny SoA int32 arrays (start/size per side)
- the kernel expands blocks to per-base indices on device (cumsum +
  repeat), gathers both genome sides, maps through the 5x5 LUT and
  segment-sums per block
- everything is integer math; results are bit-identical to the host numpy
  path (tests enforce this), so byte-parity of downstream outputs is
  preserved no matter which path ran

Shapes are bucketed to powers of two so XLA compiles a handful of program
shapes regardless of input sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..device.genome import Genome


def _next_pow2(n: int, floor: int = 1024) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("total_bases",))
def _block_scores_kernel(t_codes, q_codes, lut, t_starts, q_starts, sizes,
                         total_bases: int):
    """Per-block int32 score sums.

    t_codes/q_codes: uint8[genome] (the relevant strand's code array)
    lut: int32[5,5] indexed [q_code, t_code]
    t_starts/q_starts/sizes: int32[n_blocks_padded] (size 0 padding)
    total_bases: static padded per-base total (>= sizes.sum())
    """
    n = sizes.shape[0]
    sizes = sizes.astype(jnp.int32)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(sizes)[:-1]])
    # pad tail bases onto a dummy segment (id n)
    base_ids = jnp.arange(total_bases, dtype=jnp.int32)
    seg = jnp.searchsorted(offsets + sizes, base_ids, side="right").astype(jnp.int32)
    seg = jnp.minimum(seg, n)  # tail -> dummy
    safe_seg = jnp.minimum(seg, n - 1)
    pos = base_ids - offsets[safe_seg]
    t_idx = t_starts[safe_seg].astype(jnp.int32) + pos
    q_idx = q_starts[safe_seg].astype(jnp.int32) + pos
    valid = seg < n
    t_idx = jnp.where(valid, t_idx, 0)
    q_idx = jnp.where(valid, q_idx, 0)
    tc = jnp.take(t_codes, t_idx).astype(jnp.int32)
    qc = jnp.take(q_codes, q_idx).astype(jnp.int32)
    per_base = jnp.take(lut.reshape(-1), qc * 5 + tc)
    per_base = jnp.where(valid, per_base, 0)
    return jax.ops.segment_sum(per_base, seg, num_segments=n + 1,
                               indices_are_sorted=True)[:n]


class DeviceGenomeCache:
    """Per-(chrom, strand) uint8 code arrays resident on device."""

    def __init__(self, genome: Genome):
        self.genome = genome
        self._dev: dict[tuple[str, str], jax.Array] = {}

    def codes(self, name: str, strand: str) -> jax.Array:
        key = (name, strand)
        if key not in self._dev:
            self._dev[key] = jnp.asarray(self.genome.codes(name, strand))
        return self._dev[key]

    def codes_padded(self, name: str, strand: str, pad: int) -> jax.Array:
        """Code array padded with `pad` trailing N codes (for fixed-size
        window DMA that may run past the chromosome end)."""
        key = (name, strand, pad)
        if key not in self._dev:
            codes = self.genome.codes(name, strand)
            padded = np.full(codes.shape[0] + pad, 4, dtype=np.uint8)
            padded[:codes.shape[0]] = codes
            self._dev[key] = jnp.asarray(padded)
        return self._dev[key]

    def codes_padded_i32(self, name: str, strand: str, pad: int) -> jax.Array:
        """(1, N+pad) int32 code array (Mosaic-friendly layout for the
        Pallas rescore kernel: int8 sublane packing makes i8 HBM slices
        1024-tiled, int32 has none of that)."""
        key = (name, strand, pad, "i32")
        if key not in self._dev:
            codes = self.genome.codes(name, strand)
            padded = np.full(codes.shape[0] + pad, 4, dtype=np.int32)
            padded[:codes.shape[0]] = codes
            self._dev[key] = jnp.asarray(padded.reshape(1, -1))
        return self._dev[key]


class DeviceBlockScorer:
    """Computes per-block scores on device for batches of blocks that share
    a (t_chrom, q_chrom, q_strand) binding."""

    def __init__(self, lut: np.ndarray, t_cache: DeviceGenomeCache,
                 q_cache: DeviceGenomeCache):
        self.lut = jnp.asarray(lut.astype(np.int32))
        self.t_cache = t_cache
        self.q_cache = q_cache

    def block_scores(self, t_name: str, q_name: str, q_strand: str,
                     blocks: np.ndarray) -> np.ndarray:
        """int64[n] per-block scores for (n,4) blocks [tS,tE,qS,qE]."""
        n = blocks.shape[0]
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        sizes = (blocks[:, 1] - blocks[:, 0]).astype(np.int32)
        total = int(sizes.sum())
        n_pad = _next_pow2(n, 256)
        total_pad = _next_pow2(total, 4096)
        t_starts = np.zeros(n_pad, np.int32)
        q_starts = np.zeros(n_pad, np.int32)
        sz = np.zeros(n_pad, np.int32)
        t_starts[:n] = blocks[:, 0]
        q_starts[:n] = blocks[:, 2]
        sz[:n] = sizes
        out = _block_scores_kernel(
            self.t_cache.codes(t_name, "+"),
            self.q_cache.codes(q_name, q_strand),
            self.lut,
            jnp.asarray(t_starts), jnp.asarray(q_starts), jnp.asarray(sz),
            total_pad)
        return np.asarray(out[:n]).astype(np.int64)


class DeviceChainScorer:
    """Drop-in ChainScorer whose per-base block sums run on device.

    Gap costs and the local-score scan stay on host (tiny, integer-exact);
    results are bit-identical to engines.scoring.ChainScorer.
    """

    def __init__(self, scheme, gap_calc, t_genome: Genome, q_genome: Genome,
                 use_pallas: bool | None = None):
        self.scheme = scheme
        self.gap_calc = gap_calc
        self.t_genome = t_genome
        self.q_genome = q_genome
        t_cache = DeviceGenomeCache(t_genome)
        q_cache = DeviceGenomeCache(q_genome)
        if use_pallas is None:
            use_pallas = jax.default_backend() != "cpu"
        if use_pallas:
            from .pallas_rescore import PallasBlockScorer
            self._dev = PallasBlockScorer(np.asarray(scheme.lut), t_cache,
                                          q_cache)
        else:
            self._dev = DeviceBlockScorer(np.asarray(scheme.lut), t_cache,
                                          q_cache)

    def score_arrays(self, chain):
        from ..engines.scoring import gap_costs
        bs = self._dev.block_scores(chain.t_name, chain.q_name,
                                    chain.q_strand, chain.blocks)
        gc = gap_costs(chain.blocks, self.gap_calc)
        return bs, gc

    def global_score(self, chain) -> float:
        from ..engines.scoring import chain_global_score
        bs, gc = self.score_arrays(chain)
        return float(chain_global_score(bs, gc))

    def global_and_local(self, chain):
        from ..engines.scoring import chain_global_score, chain_local_score
        bs, gc = self.score_arrays(chain)
        g = chain_global_score(bs, gc)
        loc = chain_local_score(bs, gc)
        ali = int((chain.blocks[:, 1] - chain.blocks[:, 0]).sum())
        return float(g), float(loc), ali

    # -- fully batched path --------------------------------------------------
    def score_chains(self, chains: list) -> list[tuple[float, float, int]]:
        """Batched (global, local, aliBases) for many chains.

        Groups chains by (t_chrom, q_chrom, strand), concatenates their
        blocks into one device call per group, then combines per chain on
        host.  Order of results matches input order.
        """
        from ..engines.scoring import (chain_global_score, chain_local_score,
                                       gap_costs)
        results: list = [None] * len(chains)
        groups: dict[tuple[str, str, str], list[int]] = {}
        for i, c in enumerate(chains):
            groups.setdefault((c.t_name, c.q_name, c.q_strand), []).append(i)
        for (tn, qn, strand), idxs in groups.items():
            all_blocks = np.concatenate([chains[i].blocks for i in idxs])
            bs_all = self._dev.block_scores(tn, qn, strand, all_blocks)
            off = 0
            for i in idxs:
                c = chains[i]
                nb = c.n_blocks
                bs = bs_all[off:off + nb]
                off += nb
                gc = gap_costs(c.blocks, self.gap_calc)
                g = chain_global_score(bs, gc)
                loc = chain_local_score(bs, gc)
                ali = int((c.blocks[:, 1] - c.blocks[:, 0]).sum())
                results[i] = (float(g), float(loc), ali)
        return results

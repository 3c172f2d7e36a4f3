"""Fused Pallas segmented-combine vs the staged XLA pipeline (oracle).

Random chain workloads: chunk sums, gap biases, block-start/-end flags
and chain segmentation are generated adversarially (chains crossing tile
boundaries, single-chunk chains, chains spanning multiple tiles) and the
kernel's (global, local) must equal the staged pipeline's bit-for-bit.
Runs in interpret mode on CPU; the same code path compiles for TPU.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from genomealignmenttools_tpu.ops.pallas_combine import (  # noqa: E402
    F_FIRST, F_SAMPLE, F_START, TILE, pair_combine_finish,
    pair_combine_scan)


def _random_workload(rng, n_chains, m_goal):
    """Chunk-level arrays in PairChainScorer._meta's layout."""
    # random block structure: chains of 1..40 blocks, blocks of 1..12
    # chunks
    s = []
    bias = []
    flags = []
    start_idx = []
    end_idx = []
    while len(start_idx) < n_chains:
        start_idx.append(len(s))
        nb = int(rng.integers(1, 41))
        for b in range(nb):
            nchunk = int(rng.integers(1, 13))
            for k in range(nchunk):
                fl = 0
                if not s or len(s) == start_idx[-1]:
                    fl |= F_START
                if k == 0:
                    fl |= F_FIRST
                if k == nchunk - 1:
                    fl |= F_SAMPLE
                s.append(int(rng.integers(-500, 16001)))
                bias.append(int(rng.integers(0, 40000)) if (fl & F_FIRST)
                            and b > 0 else 0)
                flags.append(fl)
        end_idx.append(len(s) - 1)
    m = len(s)
    m_pad = ((m + TILE - 1) // TILE) * TILE
    pad = m_pad - m
    s += [0] * pad
    bias += [0] * pad
    flags += [0] * pad
    return (np.array(s, np.int32), np.array(bias, np.int32),
            np.array(flags, np.int32), np.array(start_idx, np.int32),
            np.array(end_idx, np.int32), m)


def _staged_oracle(s, bias, flags, start_idx, end_idx, m):
    """The existing staged x64 pipeline (pair_rescore stages)."""
    from genomealignmenttools_tpu.ops.pair_rescore import (
        _combine_pad, _stage_base_scatter, _stage_cummax, _stage_cummin,
        _stage_cumsum, _stage_delta, _stage_finish, _stage_m,
        _stage_sampled, _stage_sub)
    first = ((flags & F_FIRST) > 0).astype(np.int32)
    sample = ((flags & F_SAMPLE) > 0).astype(np.int32)
    chain_of = np.zeros(s.shape[0], np.int32)
    chain_of[:m] = np.searchsorted(end_idx, np.arange(m))
    chain_of[m:] = len(end_idx) - 1
    n = s.shape[0]
    with jax.enable_x64(True):
        sj = jnp.asarray(s)
        g = _stage_cumsum(_stage_delta(sj, jnp.asarray(bias)), n)
        chain_of64 = jnp.asarray(chain_of).astype(jnp.int64)
        c = _stage_sub(g, _stage_cumsum(
            _stage_base_scatter(g, jnp.asarray(start_idx)), n))
        vp = _stage_m(c, sj.astype(jnp.int64), jnp.asarray(first),
                      jnp.asarray(sample), chain_of64)
        wmin = _stage_cummin(vp, n)
        sp = _stage_sampled(wmin, c, chain_of64, jnp.asarray(sample))
        wmax = _stage_cummax(sp, n)
        return np.asarray(_stage_finish(wmax, c, chain_of64,
                                        jnp.asarray(end_idx)))


@pytest.mark.parametrize("seed,n_chains", [(0, 7), (1, 64), (2, 200),
                                           (3, 800)])
def test_fused_combine_matches_staged(seed, n_chains):
    # (3, 800) spans ~3 tiles: chains cross tile boundaries and end
    # mid-tile, the case where a poisoned f_prefix skipped the cross-
    # tile carry (regression for the _seg_scan flag-fill bug)
    rng = np.random.default_rng(seed)
    s, bias, flags, start_idx, end_idx, m = _random_workload(
        rng, n_chains, None)
    oracle = _staged_oracle(s, bias, flags, start_idx, end_idx, m)
    c, w = pair_combine_scan(jnp.asarray(s), jnp.asarray(bias),
                             jnp.asarray(flags), interpret=True)
    out = np.asarray(pair_combine_finish(c, w, jnp.asarray(end_idx)))
    np.testing.assert_array_equal(out.astype(np.int64), oracle)


def test_fused_combine_integrated_scorer(fixtures_dir, monkeypatch):
    """End-to-end DeviceChainScorer(pair) with the fused combine forced
    (interpret mode on CPU) vs the sequential host scorer."""
    import os
    monkeypatch.setenv("GAT_PAIR_COMBINE", "fused")
    monkeypatch.setenv("GAT_PALLAS_INTERPRET", "1")
    from genomealignmenttools_tpu.device.genome import Genome
    from genomealignmenttools_tpu.engines.scoring import ChainScorer
    from genomealignmenttools_tpu.formats.chain import read_chains
    from genomealignmenttools_tpu.formats.gapcalc import gap_calc_default
    from genomealignmenttools_tpu.formats.scorematrix import (
        score_scheme_default)
    from genomealignmenttools_tpu.ops.rescore import DeviceChainScorer
    chains = read_chains(os.path.join(fixtures_dir, "synthetic.chain"))
    t = Genome(os.path.join(fixtures_dir, "target.2bit"))
    q = Genome(os.path.join(fixtures_dir, "query.2bit"))
    scheme, gc = score_scheme_default(), gap_calc_default()
    dev = DeviceChainScorer(scheme, gc, t, q, mode="pair")
    dev._repeat_workload = True   # engage the device combine
    host = ChainScorer(scheme, gc, t, q)
    got = dev.score_chains(chains)
    want = [host.global_and_local(c) for c in chains]
    assert [tuple(r) for r in got] == [tuple(w) for w in want]


def test_fused_combine_multi_tile_chain():
    """One chain spanning several tiles (carry torture test)."""
    rng = np.random.default_rng(3)
    n = 3 * TILE
    s = rng.integers(-500, 16001, n).astype(np.int32)
    bias = np.zeros(n, np.int32)
    flags = np.zeros(n, np.int32)
    # one chain: blocks of 7 chunks end-to-end
    flags[0] |= F_START
    for i in range(0, n, 7):
        flags[i] |= F_FIRST
        if i > 0:
            bias[i] = int(rng.integers(0, 30000))
        flags[min(i + 6, n - 1)] |= F_SAMPLE
    start_idx = np.array([0], np.int32)
    end_idx = np.array([n - 1], np.int32)
    oracle = _staged_oracle(s, bias, flags, start_idx, end_idx, n)
    c, w = pair_combine_scan(jnp.asarray(s), jnp.asarray(bias),
                             jnp.asarray(flags), interpret=True)
    out = np.asarray(pair_combine_finish(c, w, jnp.asarray(end_idx)))
    np.testing.assert_array_equal(out.astype(np.int64), oracle)

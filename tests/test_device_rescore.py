"""Device (JAX) block-rescore path must agree bit-for-bit with host numpy,
and plugging it into the engines must preserve byte-parity."""

import os

import numpy as np

from genomealignmenttools_tpu.device.genome import Genome
from genomealignmenttools_tpu.engines.score_chain import score_chain_file
from genomealignmenttools_tpu.engines.scoring import ChainScorer, block_scores
from genomealignmenttools_tpu.formats.chain import read_chains
from genomealignmenttools_tpu.formats.gapcalc import gap_calc_default
from genomealignmenttools_tpu.formats.scorematrix import score_scheme_default
from genomealignmenttools_tpu.ops.rescore import DeviceChainScorer


def test_device_block_scores_match_host(fixtures_dir):
    scheme = score_scheme_default()
    gc = gap_calc_default()
    t_genome = Genome(os.path.join(fixtures_dir, "target.2bit"))
    q_genome = Genome(os.path.join(fixtures_dir, "query.2bit"))
    chains = read_chains(os.path.join(fixtures_dir, "synthetic.chain"))

    host = ChainScorer(scheme, gc, t_genome, q_genome)
    dev = DeviceChainScorer(scheme, gc, t_genome, q_genome)

    for chain in chains[:40]:
        bs_h, gc_h = host.score_arrays(chain)
        bs_d, gc_d = dev.score_arrays(chain)
        assert np.array_equal(bs_h, bs_d), f"chain {chain.id} block scores differ"
        assert np.array_equal(gc_h, gc_d)


def test_device_batched_matches_per_chain(fixtures_dir):
    scheme = score_scheme_default()
    gc = gap_calc_default()
    t_genome = Genome(os.path.join(fixtures_dir, "target.2bit"))
    q_genome = Genome(os.path.join(fixtures_dir, "query.2bit"))
    chains = read_chains(os.path.join(fixtures_dir, "synthetic.chain"))
    host = ChainScorer(scheme, gc, t_genome, q_genome)
    dev = DeviceChainScorer(scheme, gc, t_genome, q_genome)
    batched = dev.score_chains(chains)
    for chain, got in zip(chains, batched):
        assert got == host.global_and_local(chain)


def test_score_chain_file_with_device_scorer(fixtures_dir, golden_dir, tmp_path):
    out = str(tmp_path / "dev.chain")
    score_chain_file(
        os.path.join(fixtures_dir, "synthetic.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        out, linear_gap="loose", scorer_factory=DeviceChainScorer)
    golden = open(os.path.join(golden_dir, "scoreChain.loose.chain"), "rb").read()
    assert open(out, "rb").read() == golden

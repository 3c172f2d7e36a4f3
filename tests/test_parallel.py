"""Sharded rescoring over a virtual 8-device CPU mesh: results must be
identical to the single-device host path regardless of shard count."""

import os

import numpy as np

from genomealignmenttools_tpu.device.genome import Genome
from genomealignmenttools_tpu.engines.scoring import ChainScorer
from genomealignmenttools_tpu.formats.chain import read_chains
from genomealignmenttools_tpu.formats.gapcalc import gap_calc_default
from genomealignmenttools_tpu.formats.scorematrix import score_scheme_default
from genomealignmenttools_tpu.parallel.mesh import ShardedBlockScorer, make_mesh


def test_sharded_scores_match_host(fixtures_dir):
    import jax
    assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"
    scheme = score_scheme_default()
    gc = gap_calc_default()
    t_genome = Genome(os.path.join(fixtures_dir, "target.2bit"))
    q_genome = Genome(os.path.join(fixtures_dir, "query.2bit"))
    chains = [c for c in read_chains(os.path.join(fixtures_dir,
                                                  "synthetic.chain"))
              if c.t_name == "chrA" and c.q_name == "chrQ1"
              and c.q_strand == "+"]
    host = ChainScorer(scheme, gc, t_genome, q_genome)

    blocks = np.concatenate([c.blocks for c in chains])
    expected = np.concatenate([host.score_arrays(c)[0] for c in chains])

    for n_dev in (1, 2, 8):
        mesh = make_mesh(n_dev)
        scorer = ShardedBlockScorer(np.asarray(scheme.lut), mesh)
        got = scorer.block_scores(t_genome.codes("chrA"),
                                  q_genome.codes("chrQ1"), blocks)
        assert np.array_equal(got, expected), f"mismatch at n_dev={n_dev}"


def test_sharded_pair_scores_match_host(fixtures_dir):
    from genomealignmenttools_tpu.ops.pair_rescore import pack_pairs
    from genomealignmenttools_tpu.parallel.mesh import ShardedPairScorer
    scheme = score_scheme_default()
    t_genome = Genome(os.path.join(fixtures_dir, "target.2bit"))
    q_genome = Genome(os.path.join(fixtures_dir, "query.2bit"))
    chains = [c for c in read_chains(os.path.join(fixtures_dir,
                                                  "synthetic.chain"))
              if c.t_name == "chrA" and c.q_name == "chrQ1"
              and c.q_strand == "-"]
    host = ChainScorer(scheme, gap_calc_default(), t_genome, q_genome)
    blocks = np.concatenate([c.blocks for c in chains])
    expected = np.concatenate([host.score_arrays(c)[0] for c in chains])
    c8, c_block, m = pack_pairs(t_genome.codes("chrA", "+"),
                                 q_genome.codes("chrQ1", "-"), blocks)
    for n_dev in (1, 2, 8):
        scorer = ShardedPairScorer(np.asarray(scheme.lut), make_mesh(n_dev))
        cs = scorer.chunk_scores(c8)[:m]
        got = np.zeros(blocks.shape[0], np.int64)
        np.add.at(got, c_block, cs.astype(np.int64))
        assert np.array_equal(got, expected), f"mismatch at n_dev={n_dev}"


def test_sharded_chain_scorer_matches_host(fixtures_dir):
    """Full (global, local, ali) per chain, tiles sharded over the mesh:
    bit-identical to the host scorer at every device count."""
    from genomealignmenttools_tpu.parallel.mesh import ShardedChainScorer
    scheme = score_scheme_default()
    gc = gap_calc_default()
    t_genome = Genome(os.path.join(fixtures_dir, "target.2bit"))
    q_genome = Genome(os.path.join(fixtures_dir, "query.2bit"))
    chains = read_chains(os.path.join(fixtures_dir, "synthetic.chain"))
    host = ChainScorer(scheme, gc, t_genome, q_genome)
    want = [host.global_and_local(c) for c in chains]
    for n_dev in (1, 2, 8):
        scorer = ShardedChainScorer(scheme, gc, t_genome, q_genome,
                                    make_mesh(n_dev))
        got = scorer.score_chains(chains)
        assert got == want, f"mismatch at n_dev={n_dev}"


def test_shard_indices_partition():
    from genomealignmenttools_tpu.parallel.distributed import shard_indices
    for n in (0, 1, 7, 23, 100):
        for k in (1, 2, 3, 8):
            seen = []
            for s in range(k):
                seen.extend(shard_indices(n, k, s))
            assert seen == list(range(n)), (n, k)


def test_score_chain_sharded_concat_matches(fixtures_dir, golden_dir,
                                            tmp_path):
    """scoreChain -numShards: concatenated shard outputs == full run."""
    from genomealignmenttools_tpu.engines.score_chain import score_chain_file
    args = (os.path.join(fixtures_dir, "synthetic.chain"),
            os.path.join(fixtures_dir, "target.2bit"),
            os.path.join(fixtures_dir, "query.2bit"))
    parts = []
    for s in range(3):
        out = str(tmp_path / f"shard{s}.chain")
        score_chain_file(*args, out, linear_gap="loose", num_shards=3,
                         shard=s)
        parts.append(open(out).read())
    golden = open(os.path.join(golden_dir, "scoreChain.loose.chain")).read()
    assert "".join(parts) == golden


def test_host0_merge_text_single_process():
    from genomealignmenttools_tpu.parallel.distributed import host0_merge_text
    assert host0_merge_text("abc") == "abc"


def test_chain_net_sharded_concat_parity(fixtures_dir, golden_dir, tmp_path):
    """Per-side chromosome sharding: concatenating shard outputs in shard
    order is byte-identical to a single chainNet run."""
    import io

    from genomealignmenttools_tpu.engines.chain_net import chain_net

    args = (os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
            os.path.join(fixtures_dir, "target.chrom.sizes"),
            os.path.join(fixtures_dir, "query.chrom.sizes"))
    golden_t = open(os.path.join(golden_dir, "chainNet.target.net")).read()
    golden_q = open(os.path.join(golden_dir, "chainNet.query.net")).read()
    for n in (2,):
        t_parts, q_parts = [], []
        for s in range(n):
            t_o, q_o = io.StringIO(), io.StringIO()
            chain_net(*args, t_o, q_o, num_shards=n, shard=s)
            t_parts.append(t_o.getvalue())
            q_parts.append(q_o.getvalue())
        assert "".join(t_parts) == golden_t
        assert "".join(q_parts) == golden_q


def test_repeat_filler_sharded_concat_parity(fixtures_dir, tmp_path):
    """Contiguous chain partition: concat of RepeatFiller shard outputs ==
    the single-run output."""
    import io

    from genomealignmenttools_tpu.engines.repeat_filler import repeat_filler

    args = (os.path.join(fixtures_dir, "repeatfiller_input.chain"),
            os.path.join(fixtures_dir, "target.2bit"),
            os.path.join(fixtures_dir, "query.2bit"))
    full = io.StringIO()
    repeat_filler(*args, full)
    for n in (2,):
        parts = []
        for s in range(n):
            o = io.StringIO()
            repeat_filler(*args, o, num_shards=n, shard=s)
            parts.append(o.getvalue())
        assert "".join(parts) == full.getvalue()

"""Byte-parity of chainCleaner + NetFilterNonNested against C/Perl goldens."""

import io
import os

from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains
from genomealignmenttools_tpu.engines.chain_net import chain_net
from genomealignmenttools_tpu.engines.net_filter_nonnested import (
    net_filter_non_nested)


def test_net_filter_non_nested_pipeline(fixtures_dir, tmp_path):
    """chainNet -minScore=0 | NetFilterNonNested -minScore1 3000 matches the
    perl-produced cleaner_input.net fixture."""
    t_out, q_out = io.StringIO(), io.StringIO()
    chain_net(
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        os.path.join(fixtures_dir, "target.chrom.sizes"),
        os.path.join(fixtures_dir, "query.chrom.sizes"),
        t_out, q_out, min_score=0)
    filtered = io.StringIO()
    net_filter_non_nested(t_out.getvalue().splitlines(), filtered,
                          min_score1=3000)
    golden = open(os.path.join(fixtures_dir, "cleaner_input.net")).read()
    assert filtered.getvalue() == golden


def _run_cleaner(fixtures_dir, tmp_path, net_file=None, **kw):
    out_chain = str(tmp_path / "clean.chain")
    out_bed = str(tmp_path / "clean.bed")
    clean_chains(
        os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
        os.path.join(fixtures_dir, "target.2bit"),
        os.path.join(fixtures_dir, "query.2bit"),
        out_chain, out_bed, net_file=net_file,
        t_sizes=os.path.join(fixtures_dir, "target.chrom.sizes"),
        q_sizes=os.path.join(fixtures_dir, "query.chrom.sizes"),
        linear_gap="loose", **kw)
    return open(out_chain).read(), open(out_bed).read()


def test_chain_cleaner_with_net(fixtures_dir, golden_dir, tmp_path):
    chain, bed = _run_cleaner(
        fixtures_dir, tmp_path,
        net_file=os.path.join(fixtures_dir, "cleaner_input.net"))
    assert bed == open(os.path.join(golden_dir,
                                    "chainCleaner.removedSuspects.bed")).read()
    assert chain == open(os.path.join(golden_dir,
                                      "chainCleaner.out.chain")).read()


def test_chain_cleaner_internal_netting(fixtures_dir, golden_dir, tmp_path):
    """Without -net, the engine nets in-process; result must be identical."""
    chain, bed = _run_cleaner(fixtures_dir, tmp_path, net_file=None)
    assert bed == open(os.path.join(golden_dir,
                                    "chainCleaner.removedSuspects.bed")).read()
    assert chain == open(os.path.join(golden_dir,
                                      "chainCleaner.out.chain")).read()


def test_chain_cleaner_fused_vs_text_breaks(fixtures_dir, golden_dir,
                                            tmp_path, monkeypatch):
    """The fused sweep->filter->breaks path (gat_breaks_from_sweep, no net
    text) must be byte-identical to the text pipeline it replaces
    (chainNet writer -> NetFilterNonNested -> gat_find_breaks)."""
    (tmp_path / "fused").mkdir()
    (tmp_path / "text").mkdir()
    chain_fused, bed_fused = _run_cleaner(fixtures_dir, tmp_path / "fused",
                                          net_file=None)
    monkeypatch.setenv("GAT_FUSED_BREAKS", "0")
    chain_text, bed_text = _run_cleaner(fixtures_dir, tmp_path / "text",
                                        net_file=None)
    assert chain_fused == chain_text
    assert bed_fused == bed_text
    # and both match the C golden
    assert chain_fused == open(os.path.join(
        golden_dir, "chainCleaner.out.chain")).read()


def test_chain_cleaner_batched_device_path(fixtures_dir, golden_dir, tmp_path):
    """The batched prescore + cached replay path (DeviceChainScorer) must be
    byte-identical to the sequential host path."""
    from genomealignmenttools_tpu.ops.rescore import DeviceChainScorer

    def factory(scheme, gap_calc, t_genome, q_genome):
        return DeviceChainScorer(scheme, gap_calc, t_genome, q_genome,
                                 mode="xla")

    chain, bed = _run_cleaner(fixtures_dir, tmp_path, net_file=None,
                              scorer_factory=factory)
    assert bed == open(os.path.join(golden_dir,
                                    "chainCleaner.removedSuspects.bed")).read()
    assert chain == open(os.path.join(golden_dir,
                                      "chainCleaner.out.chain")).read()


def test_chain_cleaner_sharded_merge_parity(fixtures_dir, golden_dir,
                                            tmp_path):
    """Sharded runs (break-list component partition) + merge must be
    byte-identical to the single run for every shard count."""
    from genomealignmenttools_tpu.engines.chain_cleaner import (
        clean_chains, merge_cleaner_shards)

    golden_chain = open(os.path.join(golden_dir,
                                     "chainCleaner.out.chain")).read()
    golden_bed = open(os.path.join(
        golden_dir, "chainCleaner.removedSuspects.bed")).read()

    for n in (2, 3):
        paths = []
        for s in range(n):
            p = str(tmp_path / f"shard_{n}_{s}.json")
            clean_chains(
                os.path.join(fixtures_dir, "synthetic.scored.sorted.chain"),
                os.path.join(fixtures_dir, "target.2bit"),
                os.path.join(fixtures_dir, "query.2bit"),
                str(tmp_path / "unused.chain"), str(tmp_path / "unused.bed"),
                t_sizes=os.path.join(fixtures_dir, "target.chrom.sizes"),
                q_sizes=os.path.join(fixtures_dir, "query.chrom.sizes"),
                linear_gap="loose", num_shards=n, shard=s, shard_out=p)
            paths.append(p)
        out_chain = tmp_path / f"merged_{n}.chain"
        out_bed = tmp_path / f"merged_{n}.bed"
        merge_cleaner_shards(paths, str(out_chain), str(out_bed))
        assert out_chain.read_text() == golden_chain, f"n={n}"
        assert out_bed.read_text() == golden_bed, f"n={n}"


def test_chain_cleaner_debug_flag(fixtures_dir, golden_dir, tmp_path,
                                  monkeypatch):
    """-debug writes chainsOfInterest/suspect/fill chain dumps and the
    suspectsAndFills bed to fixed CWD names (chainCleaner.c:592,
    1818-1822), byte-identical to the C binary, and leaves the main
    outputs unchanged."""
    monkeypatch.chdir(tmp_path)
    chain, bed = _run_cleaner(
        fixtures_dir, tmp_path,
        net_file=os.path.join(fixtures_dir, "cleaner_input.net"),
        debug=True)
    assert chain == open(os.path.join(golden_dir,
                                      "chainCleaner.out.chain")).read()
    assert bed == open(os.path.join(
        golden_dir, "chainCleaner.removedSuspects.bed")).read()
    for name in ("chainsOfInterest.chain", "suspect.chain",
                 "brokenChainLfill.chain", "brokenChainRfill.chain",
                 "brokenChainfill.chain", "suspectsAndFills.bed"):
        got = (tmp_path / name).read_text()
        want = open(os.path.join(golden_dir, "chainCleaner.debug",
                                 name)).read()
        assert got == want, name


def test_chain_cleaner_suspect_data_file(fixtures_dir, golden_dir, tmp_path):
    """-suspectDataFile dumps every tested break's data and suppresses all
    removals (chainCleaner.c:1282-1310, 1830-1832)."""
    tsv = str(tmp_path / "suspectData.tsv")
    chain, bed = _run_cleaner(
        fixtures_dir, tmp_path,
        net_file=os.path.join(fixtures_dir, "cleaner_input.net"),
        suspect_data_file=tsv)
    assert bed == ""  # nothing removed
    assert open(tsv).read() == open(os.path.join(
        golden_dir, "chainCleaner.suspectData.tsv")).read()
    assert chain == open(os.path.join(
        golden_dir, "chainCleaner.suspectData.out.chain")).read()


def test_chain_cleaner_zero_removal_score_side_effect(fixtures_dir, tmp_path,
                                                      monkeypatch):
    """A run that removes ZERO suspects must still apply getChainScore's
    full-cover side effect (the C reference mutates chain->score through
    chainSubsetOnT's original-chain return, chain.c:471-488 +
    chainCleaner.c:637-641).  Regression for the native break-loop fast
    path early-returning on n_removals == 0 without copying score_set:
    perturb every stored score so stored != recomputed, raise
    foldThreshold so nothing qualifies for removal, and demand the native
    path byte-match the python oracle."""
    src = open(os.path.join(fixtures_dir,
                            "synthetic.scored.sorted.chain")).read()
    perturbed = []
    for line in src.splitlines(keepends=True):
        if line.startswith("chain "):
            parts = line.split(" ")
            parts[1] = str(int(parts[1]) + 7919)  # stored != recomputed
            line = " ".join(parts)
        perturbed.append(line)
    in_chain = tmp_path / "perturbed.chain"
    in_chain.write_text("".join(perturbed))

    def run(sub, native):
        (tmp_path / sub).mkdir()
        monkeypatch.setenv("GAT_BREAK_LOOP", "1" if native else "0")
        out_chain = str(tmp_path / sub / "clean.chain")
        out_bed = str(tmp_path / sub / "clean.bed")
        clean_chains(
            str(in_chain),
            os.path.join(fixtures_dir, "target.2bit"),
            os.path.join(fixtures_dir, "query.2bit"),
            out_chain, out_bed,
            net_file=os.path.join(fixtures_dir, "cleaner_input.net"),
            t_sizes=os.path.join(fixtures_dir, "target.chrom.sizes"),
            q_sizes=os.path.join(fixtures_dir, "query.chrom.sizes"),
            linear_gap="loose", fold_threshold=1e18)
        return (open(out_chain).read(), open(out_bed).read())

    chain_nat, bed_nat = run("native", True)
    chain_py, bed_py = run("oracle", False)
    assert bed_nat == bed_py == ""  # nothing removed in either path
    assert chain_nat == chain_py
    # and the side effect actually fired: at least one written score must
    # differ from the perturbed input (else this test guards nothing)
    assert chain_nat != "".join(perturbed)


def test_chain_cleaner_only_this(fixtures_dir, golden_dir, tmp_path):
    """-onlyThisChr/-onlyThisStart/-onlyThisEnd restrict cleaning to one
    suspect region; chains on other chroms are dropped entirely
    (chainCleaner.c:600-601, 999-1003)."""
    chain, bed = _run_cleaner(
        fixtures_dir, tmp_path,
        net_file=os.path.join(fixtures_dir, "cleaner_input.net"),
        only_this_chr="chrA", only_this_start=382753,
        only_this_end=383003)
    assert bed == open(os.path.join(golden_dir,
                                    "chainCleaner.onlyThis.bed")).read()
    assert chain == open(os.path.join(
        golden_dir, "chainCleaner.onlyThis.out.chain")).read()

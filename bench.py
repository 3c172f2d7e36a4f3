#!/usr/bin/env python
"""Benchmark: chainCleaner end-to-end at chr1 scale vs the reference C
binary (the BASELINE.md headline metric), plus the rescore-kernel
throughput and cold scoreChain numbers.

Workloads (deterministic, cached under GAT_BENCH_DIR):

1. chainCleaner chr1-scale: 2000 planted breaking/broken scenarios +
   30000 bulk chains over a ~330 Mb target (utils/bench_workload.py
   build_cleaner_workload).  The reference C chainCleaner (+ its internal
   `chainNet | NetFilterNonNested.perl` netting, run explicitly because
   dash lacks pipefail) is timed on the same inputs when the locally-built
   binaries exist (.ref_build/); otherwise the recorded baseline in
   tests/golden/bench_baseline.json is used.  Outputs are compared
   byte-for-byte.
2. rescore throughput: ~366 Mb-aligned workload re-scored with chains
   resident (the chainCleaner/chainNet -rescore usage pattern).
3. scoreChain cold: parse + pack + score + write, end to end.

Prints ONE json line {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline is the chainCleaner wall-clock speedup (warm process;
cold-process numbers are in extra).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(HERE, "tests", "golden", "bench_baseline.json")
REF_BIN = os.path.join(HERE, ".ref_build", "bin")
KENT_BIN = os.path.join(HERE, ".ref_build", "kent", "bin")


def _have_ref():
    return (os.path.exists(os.path.join(REF_BIN, "chainCleaner"))
            and os.path.exists(os.path.join(KENT_BIN, "chainSort")))


def bench_cleaner(work_dir):
    """chainCleaner end-to-end: C reference vs this framework."""
    from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains
    from genomealignmenttools_tpu.utils.bench_workload import (
        build_cleaner_workload)
    from genomealignmenttools_tpu.utils.verbose import set_verbosity

    m = build_cleaner_workload(os.path.join(work_dir, "cleaner"))
    d = os.path.join(work_dir, "cleaner")
    c_chain = os.path.join(d, "c_out.chain")
    c_bed = os.path.join(d, "c_out.bed")
    c_time_path = os.path.join(d, "C_TIME.json")

    c_total = None
    if os.path.exists(c_time_path):
        c_total = json.load(open(c_time_path))["c_total_s"]
    elif _have_ref():
        env = dict(os.environ)
        env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]

        def run_c():
            t0 = time.time()
            pre_net = os.path.join(d, "c_pre.net")
            with open(pre_net, "w") as f:
                p1 = subprocess.Popen(
                    ["chainNet", "-minScore=0", m["chain"], m["t_sizes"],
                     m["q_sizes"], "stdout", "/dev/null"],
                    stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                    env=env)
                subprocess.run(["NetFilterNonNested.perl", "/dev/stdin",
                                "-minScore1", "3000"],
                               stdin=p1.stdout, stdout=f, env=env,
                               check=True)
                p1.wait()
            subprocess.run(
                ["chainCleaner", m["chain"], m["t2bit"], m["q2bit"],
                 c_chain, c_bed, "-net=" + pre_net,
                 "-tSizes=" + m["t_sizes"], "-qSizes=" + m["q_sizes"],
                 "-linearGap=loose"],
                env=env, check=True, capture_output=True)
            return time.time() - t0

        c_total = min(run_c(), run_c())  # best-of-2 (page-cache warm)
        json.dump({"c_total_s": c_total}, open(c_time_path, "w"))

    set_verbosity(0)
    out_chain = os.path.join(d, "gat_out.chain")
    out_bed = os.path.join(d, "gat_out.bed")

    def run_once():
        t0 = time.time()
        clean_chains(m["chain"], m["t2bit"], m["q2bit"], out_chain, out_bed,
                     t_sizes=m["t_sizes"], q_sizes=m["q_sizes"],
                     linear_gap="loose")
        return time.time() - t0

    cold = run_once()          # includes jax init + kernel compiles
    warm_dev = min(run_once(), run_once())
    # the all-native backend (byte-identical); wins on narrow host links
    os.environ["GAT_RESCORE"] = "hostnative"
    try:
        warm_host = min(run_once(), run_once())
    finally:
        del os.environ["GAT_RESCORE"]

    parity = None
    if os.path.exists(c_chain):
        parity = (open(out_chain).read() == open(c_chain).read()
                  and open(out_bed).read() == open(c_bed).read())

    return {"c_total_s": round(c_total, 2) if c_total else None,
            "cold_s": round(cold, 2),
            "warm_s": round(min(warm_dev, warm_host), 2),
            "warm_device_s": round(warm_dev, 2),
            "warm_hostnative_s": round(warm_host, 2),
            "byte_identical_vs_C": parity}


def bench_chainnet_rescore(work_dir):
    """chainNet -rescore (exact sub-net rescoring) at chr1 scale vs C."""
    from genomealignmenttools_tpu.engines.chain_net import chain_net
    from genomealignmenttools_tpu.utils.bench_workload import (
        build_cleaner_workload)

    m = build_cleaner_workload(os.path.join(work_dir, "cleaner"))
    d = os.path.join(work_dir, "cleaner")
    c_t = os.path.join(d, "c_rescore.t.net")
    c_q = os.path.join(d, "c_rescore.q.net")
    c_time_path = os.path.join(d, "C_NET_TIME.json")
    c_total = None
    if os.path.exists(c_time_path):
        c_total = json.load(open(c_time_path))["c_total_s"]
    elif _have_ref():
        env = dict(os.environ)
        env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]

        def run_c():
            t0 = time.time()
            subprocess.run(
                ["chainNet", "-rescore", "-linearGap=loose",
                 "-tNibDir=" + m["t2bit"], "-qNibDir=" + m["q2bit"],
                 m["chain"], m["t_sizes"], m["q_sizes"], c_t, c_q],
                env=env, check=True, capture_output=True)
            return time.time() - t0

        c_total = min(run_c(), run_c())
        json.dump({"c_total_s": c_total}, open(c_time_path, "w"))

    g_t = os.path.join(d, "gat_rescore.t.net")
    g_q = os.path.join(d, "gat_rescore.q.net")

    def run_once():
        t0 = time.time()
        with open(g_t, "w") as t_out, open(g_q, "w") as q_out:
            chain_net(m["chain"], m["t_sizes"], m["q_sizes"], t_out, q_out,
                      rescore=True, t_2bit=m["t2bit"], q_2bit=m["q2bit"],
                      linear_gap="loose")
        return time.time() - t0

    cold = run_once()
    warm_dev = min(run_once(), run_once())
    os.environ["GAT_RESCORE"] = "hostnative"
    try:
        warm_host = min(run_once(), run_once())
    finally:
        del os.environ["GAT_RESCORE"]
    parity = None
    if os.path.exists(c_t):
        parity = (open(g_t).read() == open(c_t).read()
                  and open(g_q).read() == open(c_q).read())
    return {"c_total_s": round(c_total, 2) if c_total else None,
            "cold_s": round(cold, 2),
            "warm_s": round(min(warm_dev, warm_host), 2),
            "warm_device_s": round(warm_dev, 2),
            "warm_hostnative_s": round(warm_host, 2),
            "byte_identical_vs_C": parity}


def bench_rescore(work_dir):
    """Warm rescore throughput + cold scoreChain end-to-end."""
    from genomealignmenttools_tpu.device.genome import Genome
    from genomealignmenttools_tpu.engines.score_chain import score_chain_file
    from genomealignmenttools_tpu.formats.chain import read_chains
    from genomealignmenttools_tpu.formats.gapcalc import gap_calc_default
    from genomealignmenttools_tpu.formats.scorematrix import (
        score_scheme_default)
    from genomealignmenttools_tpu.ops.rescore import DeviceChainScorer
    from genomealignmenttools_tpu.utils.bench_workload import build_workload

    meta = build_workload(work_dir, t_size=256_000_000, n_chains=384)
    ali_mb = meta["aligned_bases"] / 1e6

    # cold end-to-end scoreChain (parse + pack + score + write)
    t0 = time.time()
    score_chain_file(meta["chain"], meta["t2bit"], meta["q2bit"],
                     os.path.join(work_dir, "scored.chain"),
                     linear_gap="loose")
    cold_s = time.time() - t0

    # the all-native host path (GAT_RESCORE=hostnative): the right choice
    # for one-shot cold scoring when the host<->device link is narrow
    os.environ["GAT_RESCORE"] = "hostnative"
    try:
        t0 = time.time()
        score_chain_file(meta["chain"], meta["t2bit"], meta["q2bit"],
                         os.path.join(work_dir, "scored_hn.chain"),
                         linear_gap="loose")
        cold_hn_s = time.time() - t0
        assert (open(os.path.join(work_dir, "scored_hn.chain")).read()
                == open(os.path.join(work_dir, "scored.chain")).read())
    finally:
        del os.environ["GAT_RESCORE"]

    chains = read_chains(meta["chain"])
    scorer = DeviceChainScorer(score_scheme_default(), gap_calc_default(),
                               Genome(meta["t2bit"]), Genome(meta["q2bit"]))

    def run_once():
        return sum(g + loc for (g, loc, _a) in scorer.score_chains(chains))

    checksum = run_once()  # warmup: compile + first pack
    from genomealignmenttools_tpu.ops.rescore import (perf_reset,
                                                      perf_snapshot)
    times = []
    perf_reset()
    for _ in range(3):
        t0 = time.time()
        assert run_once() == checksum
        times.append(time.time() - t0)
    perf = perf_snapshot()
    warm_mb_s = ali_mb / min(times)
    # roofline accounting: the rescore kernel reads 1 packed byte per
    # aligned pair from HBM (resident tiles) + the LUT; v5e HBM ceiling
    # ~819 GB/s.  With the pack memoized (resident workload), h2d/d2h
    # traffic per run is what PERF recorded / 3 runs.
    pair_bytes = meta["aligned_bases"]
    hbm_gbs = pair_bytes / min(times) / 1e9
    return {"warm_mb_s": round(warm_mb_s, 1),
            "cold_e2e_s": round(cold_s, 2),
            "cold_e2e_mb_s": round(ali_mb / cold_s, 1),
            "cold_e2e_hostnative_s": round(cold_hn_s, 2),
            "roofline": {
                "bytes_hbm_per_run": pair_bytes,
                "achieved_gbs": round(hbm_gbs, 2),
                "pct_roofline_v5e": round(100 * hbm_gbs / 819, 2),
                "n_dispatches_3runs": perf["dispatches"],
                "h2d_bytes_3runs": perf["h2d_bytes"],
                "d2h_bytes_3runs": perf["d2h_bytes"],
            }}


def main():
    work_dir = os.environ.get("GAT_BENCH_DIR", "/tmp/gat_bench")
    os.makedirs(work_dir, exist_ok=True)

    cleaner = bench_cleaner(work_dir)
    net_rescore = bench_chainnet_rescore(work_dir)
    rescore = bench_rescore(work_dir)

    base = json.load(open(BASELINE_PATH)) if os.path.exists(BASELINE_PATH) \
        else {}
    c_total = cleaner["c_total_s"] or base.get("c_chaincleaner_chr1_s")
    vs = round(c_total / cleaner["warm_s"], 2) if c_total else None

    print(json.dumps({
        "metric": "chaincleaner_chr1_wallclock",
        "value": cleaner["warm_s"],
        "unit": "s_end_to_end(warm; vs C incl. netting)",
        "vs_baseline": vs,
        "extra": {
            "cleaner": cleaner,
            "chainnet_rescore": net_rescore,
            "rescore_throughput_mb_s": rescore["warm_mb_s"],
            "rescore_vs_c_scorechain": round(
                rescore["warm_mb_s"] / base["c_scorechain_mb_s"], 2)
                if base.get("c_scorechain_mb_s") else None,
            "scorechain_cold_e2e_s": rescore["cold_e2e_s"],
            "scorechain_cold_e2e_mb_s": rescore["cold_e2e_mb_s"],
            "scorechain_cold_hostnative_s": rescore["cold_e2e_hostnative_s"],
            "rescore_roofline": rescore["roofline"],
        },
    }))


if __name__ == "__main__":
    main()

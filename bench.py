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


def _device_run(snippet: str, timeout_s: int = 600, mode: str = "pallas"):
    """Run a device-backend measurement in a subprocess with a hard
    timeout: the tunneled TPU can wedge mid-transfer, and a hung device
    probe must not take the whole benchmark down.  The snippet must print
    a float (seconds) as its last line; returns None on any failure."""
    if os.environ.get("GAT_BENCH_DEVICE", "1") == "0":
        return None
    env = dict(os.environ)
    env["GAT_RESCORE"] = mode
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run([sys.executable, "-c", snippet], env=env,
                           capture_output=True, timeout=timeout_s,
                           text=True)
        if r.returncode != 0:
            return None
        last = r.stdout.strip().splitlines()[-1]
        if last.startswith("{"):
            return json.loads(last)
        return float(last)
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        return None


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

    cold = run_once()          # auto backend (host-native default)
    warm_host = min(run_once(), run_once())
    # the device backend, explicitly (auto picks host-native for one-shot
    # runs by measurement; this records the device side of that decision),
    # in a timeout-guarded subprocess - the tunnel can wedge
    warm_dev = _device_run(f"""
import time
from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains
from genomealignmenttools_tpu.utils.verbose import set_verbosity
set_verbosity(0)
args = ({m["chain"]!r}, {m["t2bit"]!r}, {m["q2bit"]!r},
        {out_chain + ".dev"!r}, {out_bed + ".dev"!r})
kw = dict(t_sizes={m["t_sizes"]!r}, q_sizes={m["q_sizes"]!r},
          linear_gap="loose")
clean_chains(*args, **kw)
best = 1e9
for _ in range(2):
    t0 = time.time(); clean_chains(*args, **kw)
    best = min(best, time.time() - t0)
print(best)
""")

    parity = None
    if os.path.exists(c_chain):
        parity = (open(out_chain).read() == open(c_chain).read()
                  and open(out_bed).read() == open(c_bed).read())

    return {"c_total_s": round(c_total, 2) if c_total else None,
            "cold_s": round(cold, 2),
            "warm_s": round(warm_host if warm_dev is None
                            else min(warm_dev, warm_host), 2),
            "warm_device_s": round(warm_dev, 2) if warm_dev else None,
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
    warm_host = min(run_once(), run_once())
    warm_dev = _device_run(f"""
import time
from genomealignmenttools_tpu.engines.chain_net import chain_net
def once():
    t0 = time.time()
    with open({g_t + ".dev"!r}, "w") as t_out, \
            open({g_q + ".dev"!r}, "w") as q_out:
        chain_net({m["chain"]!r}, {m["t_sizes"]!r}, {m["q_sizes"]!r},
                  t_out, q_out, rescore=True, t_2bit={m["t2bit"]!r},
                  q_2bit={m["q2bit"]!r}, linear_gap="loose")
    return time.time() - t0
once()
print(min(once(), once()))
""")
    parity = None
    if os.path.exists(c_t):
        parity = (open(g_t).read() == open(c_t).read()
                  and open(g_q).read() == open(c_q).read())
    return {"c_total_s": round(c_total, 2) if c_total else None,
            "cold_s": round(cold, 2),
            "warm_s": round(warm_host if warm_dev is None
                            else min(warm_dev, warm_host), 2),
            "warm_device_s": round(warm_dev, 2) if warm_dev else None,
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

    # cold end-to-end scoreChain (parse + pack + score + write); auto =
    # the all-native host path, the measured one-shot winner
    t0 = time.time()
    score_chain_file(meta["chain"], meta["t2bit"], meta["q2bit"],
                     os.path.join(work_dir, "scored.chain"),
                     linear_gap="loose")
    cold_s = time.time() - t0
    cold_hn_s = cold_s

    # the device backend for the same one-shot run, explicitly (timeout
    # guarded: the tunnel can wedge)
    dev_out = os.path.join(work_dir, "scored_dev.chain")
    cold_dev_s = _device_run(f"""
import time
from genomealignmenttools_tpu.engines.score_chain import score_chain_file
t0 = time.time()
score_chain_file({meta["chain"]!r}, {meta["t2bit"]!r}, {meta["q2bit"]!r},
                 {dev_out!r}, linear_gap="loose")
print(time.time() - t0)
""")
    if cold_dev_s is not None:
        assert (open(dev_out).read()
                == open(os.path.join(work_dir, "scored.chain")).read())

    # resident rescore throughput: the device backend's home turf (chains
    # packed once, re-scored repeatedly).  Timeout-guarded subprocess; on
    # tunnel failure the host-native resident number is recorded instead.
    snippet = f"""
import json, time
from genomealignmenttools_tpu.device.genome import Genome
from genomealignmenttools_tpu.engines.scoring import ChainScorer
from genomealignmenttools_tpu.formats.chain import read_chains
from genomealignmenttools_tpu.formats.gapcalc import gap_calc_default
from genomealignmenttools_tpu.formats.scorematrix import score_scheme_default
from genomealignmenttools_tpu.ops.rescore import (DeviceChainScorer,
                                                  perf_reset, perf_snapshot)
chains = read_chains({meta["chain"]!r})
scorer = DeviceChainScorer(score_scheme_default(), gap_calc_default(),
                           Genome({meta["t2bit"]!r}), Genome({meta["q2bit"]!r}))
def run_once():
    return sum(g + loc for (g, loc, _a) in scorer.score_chains(chains))
checksum = run_once()
perf_reset()
times = []
for _ in range(3):
    t0 = time.time()
    assert run_once() == checksum
    times.append(time.time() - t0)
# link physics: dispatch round trip + h2d bandwidth, so the roofline
# numbers are attributable (tunnel floor vs kernel floor)
import jax, jax.numpy as jnp, numpy as np
x = jnp.zeros(8, jnp.float32)
f = jax.jit(lambda a: a + 1)
f(x).block_until_ready()
t0 = time.time()
for _ in range(20):
    f(x).block_until_ready()
rtt_ms = (time.time() - t0) / 20 * 1000
a = np.zeros(64 * 1024 * 1024, np.uint8)
h2d_best = 1e9
for _ in range(2):
    t0 = time.time()
    jax.device_put(a).block_until_ready()
    h2d_best = min(h2d_best, time.time() - t0)
h2d_gbs = a.nbytes / h2d_best / 1e9
print(json.dumps({{"best_s": min(times), "perf": perf_snapshot(),
                   "link": {{"dispatch_rtt_ms": round(rtt_ms, 3),
                             "h2d_gbs": round(h2d_gbs, 2)}}}}))
"""
    best_s = None
    link = None
    perf = {"dispatches": None, "h2d_bytes": None, "d2h_bytes": None}
    backend = "device(pair)"
    # resident throughput: pair mode (tiles resident + on-device combine)
    # is the residency champion; the pallas windowed kernel wins the
    # tool-level probes (genome-resident, nothing shipped per run)
    dev = _device_run(snippet, mode="pair")
    if isinstance(dev, dict):
        best_s = dev["best_s"]
        perf = dev["perf"]
        link = dev.get("link")
    else:
        backend = "hostnative"
        env_save = os.environ.get("GAT_RESCORE")
        os.environ["GAT_RESCORE"] = "hostnative"
        try:
            chains = read_chains(meta["chain"])
            scorer = DeviceChainScorer(
                score_scheme_default(), gap_calc_default(),
                Genome(meta["t2bit"]), Genome(meta["q2bit"]))

            def run_once():
                return sum(g + loc
                           for (g, loc, _a) in scorer.score_chains(chains))

            checksum = run_once()
            times = []
            for _ in range(3):
                t0 = time.time()
                assert run_once() == checksum
                times.append(time.time() - t0)
            best_s = min(times)
        finally:
            if env_save is None:
                del os.environ["GAT_RESCORE"]
            else:
                os.environ["GAT_RESCORE"] = env_save
    warm_mb_s = ali_mb / best_s
    # roofline accounting: the rescore kernel reads 1 packed byte per
    # aligned pair from HBM (resident tiles) + the LUT; v5e HBM ceiling
    # ~819 GB/s.
    pair_bytes = meta["aligned_bases"]
    hbm_gbs = pair_bytes / best_s / 1e9
    return {"warm_mb_s": round(warm_mb_s, 1),
            "warm_backend": backend,
            "cold_e2e_s": round(cold_s, 2),
            "cold_e2e_mb_s": round(ali_mb / cold_s, 1),
            "cold_e2e_hostnative_s": round(cold_hn_s, 2),
            "cold_e2e_device_s": (round(cold_dev_s, 2)
                                  if cold_dev_s else None),
            "roofline": {
                "bytes_hbm_per_run": pair_bytes,
                "achieved_gbs": round(hbm_gbs, 2),
                "pct_roofline_v5e": round(100 * hbm_gbs / 819, 2),
                "n_dispatches_3runs": perf["dispatches"],
                "h2d_bytes_3runs": perf["h2d_bytes"],
                "d2h_bytes_3runs": perf["d2h_bytes"],
                "link": link,
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
            "scorechain_cold_device_s": rescore["cold_e2e_device_s"],
            "rescore_roofline": rescore["roofline"],
        },
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: chainCleaner end-to-end at chr1 scale vs the reference C
binary (the BASELINE.md headline metric), plus chainNet -rescore, cold
scoreChain, and the resident rescore-kernel throughput/roofline.

Prints ONE json line {"metric", "value", "unit", "vs_baseline", "extra"}
— ALWAYS, within a global wall-clock budget (GAT_BENCH_BUDGET_S, default
390 s).  A watchdog thread emits whatever has been measured so far and
exits 0 if the budget expires; device probes run LAST, each in a
subprocess whose timeout is derived from the remaining budget, so a
wedged tunnel or a 100-200 s remote Pallas compile can never take the
whole benchmark down (BENCH_r02 rc=1 / BENCH_r03 rc=124 post-mortem).

Workloads (deterministic, cached under GAT_BENCH_DIR=/tmp/gat_bench):

1. chainCleaner chr1-scale: 2000 planted breaking/broken scenarios +
   30000 bulk chains over a ~330 Mb target (utils/bench_workload.py
   build_cleaner_workload).  The reference C chainCleaner (+ its
   internal `chainNet | NetFilterNonNested.perl` netting, run explicitly
   because dash lacks pipefail) is timed on the same inputs when the
   locally-built binaries exist (.ref_build/); otherwise the recorded
   baseline in tests/golden/bench_baseline.json is used.  Outputs are
   compared byte-for-byte.
2. chainNet -rescore on the same inputs vs C.
3. scoreChain cold: parse + pack + score + write, end to end (~366 Mb
   aligned workload).
4. resident rescore throughput: chains+genome resident, re-scored
   repeatedly (the chainCleaner/chainNet usage pattern) + HBM roofline
   accounting for the device path.

The headline is the warm chainCleaner wall-clock speedup vs C.
Methodology: both sides run on the same host (2 cores in this sandbox);
C is single-threaded by design (the reference has no threading), ours
uses the cores it finds.  `extra.host_cores` records the core count.
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(HERE, "tests", "golden", "bench_baseline.json")
REF_BIN = os.path.join(HERE, ".ref_build", "bin")
KENT_BIN = os.path.join(HERE, ".ref_build", "kent", "bin")

BUDGET_S = float(os.environ.get("GAT_BENCH_BUDGET_S", "390"))
MARGIN_S = 12.0          # watchdog fires this long before the budget ends
_T0 = time.time()
DEADLINE = _T0 + BUDGET_S

# Result object, updated progressively as sections complete so the
# watchdog always has the best-so-far snapshot to emit.
RESULT = {"metric": "chaincleaner_chr1_wallclock", "value": None,
          "unit": "s_end_to_end(warm; vs C incl. netting)",
          "vs_baseline": None,
          "extra": {"budget_s": BUDGET_S, "host_cores": os.cpu_count(),
                    "sections_done": []}}
_EMITTED = False
_EMIT_LOCK = threading.Lock()
_LIVE_PROCS: list = []   # Popen objects the watchdog must reap on exit


def remaining() -> float:
    return DEADLINE - time.time()


def _emit(tag: str) -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        RESULT["extra"]["elapsed_s"] = round(time.time() - _T0, 1)
        RESULT["extra"]["completed"] = tag
        print(json.dumps(RESULT), flush=True)


def _watchdog() -> None:
    while True:
        left = DEADLINE - MARGIN_S - time.time()
        if left <= 0:
            break
        time.sleep(min(left, 1.0))
    if _EMITTED:
        return
    for p in list(_LIVE_PROCS):
        try:
            p.kill()
        except OSError:
            pass
    _emit("watchdog(budget exhausted)")
    os._exit(0)


def _have_ref():
    return (os.path.exists(os.path.join(REF_BIN, "chainCleaner"))
            and os.path.exists(os.path.join(KENT_BIN, "chainSort")))


def _device_run(snippet: str, need_s: float, mode: str = "pallas"):
    """Run a device-backend measurement in a subprocess with a hard
    timeout bounded by the remaining global budget.  The snippet must
    print a float (seconds) or a json dict as its last line; returns
    None on any failure, timeout, or insufficient budget."""
    if os.environ.get("GAT_BENCH_DEVICE", "1") == "0":
        return None
    timeout_s = min(600.0, remaining() - MARGIN_S - 3.0)
    if timeout_s < need_s:
        return None
    env = dict(os.environ)
    env["GAT_RESCORE"] = mode
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    try:
        p = subprocess.Popen([sys.executable, "-c", snippet], env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL, text=True)
        _LIVE_PROCS.append(p)
        try:
            out, _ = p.communicate(timeout=timeout_s)
        finally:
            _LIVE_PROCS.remove(p)
        if p.returncode != 0:
            return None
        last = out.strip().splitlines()[-1]
        if last.startswith("{"):
            return json.loads(last)
        return float(last)
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        try:
            p.kill()
        except OSError:
            pass
        return None


def _section(name):
    RESULT["extra"]["sections_done"].append(name)


# ---------------------------------------------------------------------------
# Host-side benches (run first: they ARE the headline)
# ---------------------------------------------------------------------------

def bench_cleaner_host(m, d):
    """chainCleaner end-to-end: C reference vs the host-native path."""
    from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains
    from genomealignmenttools_tpu.utils.verbose import set_verbosity

    c_chain = os.path.join(d, "c_out.chain")
    c_bed = os.path.join(d, "c_out.bed")
    c_time_path = os.path.join(d, "C_TIME.json")

    c_total = None
    if os.path.exists(c_time_path):
        c_total = json.load(open(c_time_path))["c_total_s"]
    elif _have_ref() and remaining() > 90:
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

        c_total = run_c()
        if remaining() > c_total + 45:
            c_total = min(c_total, run_c())  # best-of-2 (page-cache warm)
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
    t_cpu0 = os.times()
    warm_host = min(run_once(), run_once(), run_once())
    t_cpu1 = os.times()
    cpu_s_per_run = ((t_cpu1.user - t_cpu0.user)
                     + (t_cpu1.system - t_cpu0.system)) / 3

    # single-thread run: scaling evidence for the >20x-on-one-v5e-host
    # north star (this sandbox has 2 cores; the C reference is single-
    # threaded by design, so per-core efficiency + thread scaling is the
    # honest basis for the many-core projection)
    warm_1t = None
    if remaining() > 30:
        saved = os.environ.get("GAT_THREADS")
        os.environ["GAT_THREADS"] = "1"
        try:
            warm_1t = min(run_once(), run_once())
        finally:
            if saved is None:
                del os.environ["GAT_THREADS"]
            else:
                os.environ["GAT_THREADS"] = saved

    parity = None
    if os.path.exists(c_chain):
        parity = (open(out_chain).read() == open(c_chain).read()
                  and open(out_bed).read() == open(c_bed).read())

    return {"c_total_s": round(c_total, 2) if c_total else None,
            "cold_s": round(cold, 2),
            "warm_s": round(warm_host, 2),
            "warm_1thread_s": round(warm_1t, 2) if warm_1t else None,
            "cpu_s_per_warm_run": round(cpu_s_per_run, 2),
            "warm_device_s": None,
            "warm_hostnative_s": round(warm_host, 2),
            "byte_identical_vs_C": parity}


def bench_chainnet_rescore_host(m, d):
    """chainNet -rescore (exact sub-net rescoring) at chr1 scale vs C."""
    from genomealignmenttools_tpu.engines.chain_net import chain_net

    c_t = os.path.join(d, "c_rescore.t.net")
    c_q = os.path.join(d, "c_rescore.q.net")
    c_time_path = os.path.join(d, "C_NET_TIME.json")
    c_total = None
    if os.path.exists(c_time_path):
        c_total = json.load(open(c_time_path))["c_total_s"]
    elif _have_ref() and remaining() > 45:
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

        c_total = run_c()
        if remaining() > c_total + 30:
            c_total = min(c_total, run_c())
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
    parity = None
    if os.path.exists(c_t):
        parity = (open(g_t).read() == open(c_t).read()
                  and open(g_q).read() == open(c_q).read())
    return {"c_total_s": round(c_total, 2) if c_total else None,
            "cold_s": round(cold, 2),
            "warm_s": round(warm_host, 2),
            "warm_device_s": None,
            "warm_hostnative_s": round(warm_host, 2),
            "byte_identical_vs_C": parity}


def bench_scorechain_host(work_dir):
    """Cold scoreChain end-to-end + host-native resident throughput
    (fallback numbers if the device probe later can't run)."""
    from genomealignmenttools_tpu.engines.score_chain import score_chain_file
    from genomealignmenttools_tpu.utils.bench_workload import build_workload

    meta = build_workload(work_dir, t_size=256_000_000, n_chains=384)
    ali_mb = meta["aligned_bases"] / 1e6

    t0 = time.time()
    score_chain_file(meta["chain"], meta["t2bit"], meta["q2bit"],
                     os.path.join(work_dir, "scored.chain"),
                     linear_gap="loose")
    cold_s = time.time() - t0
    return meta, {"ali_mb": ali_mb, "cold_e2e_s": round(cold_s, 2),
                  "cold_e2e_mb_s": round(ali_mb / cold_s, 1),
                  "cold_e2e_hostnative_s": round(cold_s, 2)}


def bench_resident_hostnative(meta):
    """Host-native resident rescore throughput (always measurable)."""
    from genomealignmenttools_tpu.device.genome import Genome
    from genomealignmenttools_tpu.formats.chain import read_chains
    from genomealignmenttools_tpu.formats.gapcalc import gap_calc_default
    from genomealignmenttools_tpu.formats.scorematrix import (
        score_scheme_default)
    from genomealignmenttools_tpu.ops.rescore import DeviceChainScorer

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
        t0 = time.time()
        assert run_once() == checksum
        return time.time() - t0
    finally:
        if env_save is None:
            del os.environ["GAT_RESCORE"]
        else:
            os.environ["GAT_RESCORE"] = env_save


# ---------------------------------------------------------------------------
# Device probes (run last, each bounded by the remaining budget)
# ---------------------------------------------------------------------------

def device_resident_snippet(meta):
    return f"""
import json, time
import numpy as np
from genomealignmenttools_tpu.device.genome import Genome
from genomealignmenttools_tpu.formats.chain import read_chains
from genomealignmenttools_tpu.formats.gapcalc import gap_calc_default
from genomealignmenttools_tpu.formats.scorematrix import score_scheme_default
from genomealignmenttools_tpu.ops.rescore import (DeviceChainScorer,
                                                  perf_reset, perf_snapshot)
chains = read_chains({meta["chain"]!r})
scorer = DeviceChainScorer(score_scheme_default(), gap_calc_default(),
                           Genome({meta["t2bit"]!r}), Genome({meta["q2bit"]!r}))
def _timed(fn):
    t0 = time.time(); r = fn(); return time.time() - t0, r
# ONE compiled kernel for everything (remote pallas compiles cost tens
# of seconds; the driver budget cannot afford two): the dependency-
# chained pass serves both the single-shot number (n=1: one pass + RTT
# + fetch) and the sustained number.  Chaining makes pass i+1 consume
# pass i's output, so the device must execute every pass serially -
# sound on any runtime (pipelined same-input bursts measure 15x ABOVE
# the HBM roofline through the axon relay: the runtime memoizes pure
# executions or fast-acks block_until_ready, so that protocol is
# unusable).  Sustained per-pass = (T(11 passes) - T(1 pass)) / 10: the
# fetch and RTT cancel, leaving pure serialized kernel time.
import jax
burst_s = None
hbm_bytes = None
times = []
from genomealignmenttools_tpu.ops.pair_rescore import (PairBlockScorer,
                                                       PairChainScorer)
if not isinstance(scorer._dev, PairBlockScorer) \\
        or getattr(scorer._dev, "host_native", False):
    raise SystemExit(3)  # pair scorer unavailable: no resident numbers
pcs = PairChainScorer(scorer._dev, scorer.gap_calc)
jobs, order = scorer._grouped(chains)
nblocks = [chains[i].n_blocks for i in order]
hbm_bytes = pcs.resident_hbm_bytes(jobs, nblocks)
perf_reset()
out0 = pcs.score_chained(jobs, nblocks, 1)    # warm/compile + pack/h2d
for _ in range(2):
    dt, out = _timed(lambda: pcs.score_chained(jobs, nblocks, 1))
    assert np.array_equal(out, out0)          # determinism check
    times.append(dt)
t1 = min(times)
t21, _ = _timed(lambda: pcs.score_chained(jobs, nblocks, 21))
burst_s = max((t21 - t1) / 20, 1e-9)
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
print(json.dumps({{"best_s": min(times), "burst_s": burst_s,
                   "hbm_bytes": hbm_bytes, "perf": perf_snapshot(),
                   "link": {{"dispatch_rtt_ms": round(rtt_ms, 3),
                             "h2d_gbs": round(h2d_gbs, 2)}}}}))
"""


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    work_dir = os.environ.get("GAT_BENCH_DIR", "/tmp/gat_bench")
    os.makedirs(work_dir, exist_ok=True)
    base = json.load(open(BASELINE_PATH)) if os.path.exists(BASELINE_PATH) \
        else {}

    # -------- workload build (cached across runs) --------
    from genomealignmenttools_tpu.utils.bench_workload import (
        build_cleaner_workload)
    d = os.path.join(work_dir, "cleaner")
    m = build_cleaner_workload(d)
    _section("workload")

    # -------- host headline: chainCleaner --------
    cleaner = bench_cleaner_host(m, d)
    RESULT["extra"]["cleaner"] = cleaner
    c_total = cleaner["c_total_s"] or base.get("c_chaincleaner_chr1_s")
    RESULT["value"] = cleaner["warm_s"]
    RESULT["vs_baseline"] = (round(c_total / cleaner["warm_s"], 2)
                             if c_total else None)
    _section("cleaner_host")

    # -------- host: chainNet -rescore --------
    net_rescore = bench_chainnet_rescore_host(m, d)
    RESULT["extra"]["chainnet_rescore"] = net_rescore
    _section("chainnet_host")

    # -------- host: cold scoreChain + resident fallback --------
    meta, sc = bench_scorechain_host(work_dir)
    RESULT["extra"]["scorechain_cold_e2e_s"] = sc["cold_e2e_s"]
    RESULT["extra"]["scorechain_cold_e2e_mb_s"] = sc["cold_e2e_mb_s"]
    RESULT["extra"]["scorechain_cold_hostnative_s"] = \
        sc["cold_e2e_hostnative_s"]
    _section("scorechain_host")

    host_resident_s = bench_resident_hostnative(meta)
    ali_mb = sc["ali_mb"]
    RESULT["extra"]["rescore_throughput_mb_s"] = round(
        ali_mb / host_resident_s, 1)
    RESULT["extra"]["rescore_backend"] = "hostnative"
    if base.get("c_scorechain_mb_s"):
        RESULT["extra"]["rescore_vs_c_scorechain"] = round(
            (ali_mb / host_resident_s) / base["c_scorechain_mb_s"], 2)
    _section("resident_hostnative")

    # -------- device probes, in descending order of value --------
    # 1. resident rescore throughput (the device's home turf).  Before
    # launching, surface the last successful probe (clearly labeled
    # cached) so even a watchdog-cut run reports the device story; a
    # live success below replaces it.
    dev_cache = os.path.join(work_dir, "RESIDENT_PROBE.json")
    if os.path.exists(dev_cache):
        try:
            c = json.load(open(dev_cache))
            RESULT["extra"]["rescore_roofline_cached"] = {
                "note": "last successful device probe on this workload "
                        "(reported in case the live probe cannot fit "
                        "this run's budget)",
                "age_s": round(time.time() - c["ts"], 1),
                "burst_s": c["dev"].get("burst_s"),
                "best_s": c["dev"].get("best_s"),
                "hbm_bytes": c["dev"].get("hbm_bytes"),
            }
        except (OSError, ValueError, KeyError):
            pass
    dev = _device_run(device_resident_snippet(meta), need_s=60.0,
                      mode=os.environ.get("GAT_BENCH_RESIDENT_MODE", "pair"))
    if isinstance(dev, dict):
        RESULT["extra"].pop("rescore_roofline_cached", None)
        try:
            json.dump({"ts": time.time(), "dev": dev},
                      open(dev_cache, "w"))
        except OSError:
            pass
    if isinstance(dev, dict):
        best_s = dev["best_s"]
        RESULT["extra"]["rescore_throughput_mb_s"] = round(
            ali_mb / best_s, 1)
        RESULT["extra"]["rescore_backend"] = "device(pair)"
        if base.get("c_scorechain_mb_s"):
            RESULT["extra"]["rescore_vs_c_scorechain"] = round(
                (ali_mb / best_s) / base["c_scorechain_mb_s"], 2)
        # roofline vs REAL resident HBM traffic (padded pair tiles +
        # per-chunk combine metadata, not bare aligned bases), both
        # single-shot (includes the ~22 ms tunnel RTT per sync) and
        # amortized over a 10-deep pipelined burst (RTT paid once -
        # the sustained-kernel number)
        hbm_bytes = dev.get("hbm_bytes") or meta["aligned_bases"]
        burst_s = dev.get("burst_s")
        RESULT["extra"]["rescore_roofline"] = {
            "bytes_hbm_per_run": hbm_bytes,
            "aligned_bytes_per_run": meta["aligned_bases"],
            "singleshot_gbs": round(hbm_bytes / best_s / 1e9, 2),
            "sustained_gbs": (round(hbm_bytes / burst_s / 1e9, 2)
                              if burst_s else None),
            "sustained_mb_aligned_s": (round(ali_mb / burst_s, 1)
                                       if burst_s else None),
            "pct_roofline_v5e_sustained": (
                round(100 * hbm_bytes / burst_s / 1e9 / 819, 2)
                if burst_s else None),
            "n_dispatches_probe": dev["perf"]["dispatches"],
            "h2d_bytes_probe": dev["perf"]["h2d_bytes"],
            "d2h_bytes_probe": dev["perf"]["d2h_bytes"],
            "link": dev.get("link"),
        }
        _section("resident_device")

    # 2. device cleaner warm (informational: auto picks host for one-shot)
    out_chain = os.path.join(d, "gat_out.chain")
    out_bed = os.path.join(d, "gat_out.bed")
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
""", need_s=90.0)
    if warm_dev is not None:
        cleaner["warm_device_s"] = round(warm_dev, 2)
        if warm_dev < cleaner["warm_s"]:
            cleaner["warm_s"] = round(warm_dev, 2)
            RESULT["value"] = cleaner["warm_s"]
            if c_total:
                RESULT["vs_baseline"] = round(c_total / cleaner["warm_s"], 2)
        _section("cleaner_device")

    # 3. device chainNet -rescore warm (informational)
    g_t = os.path.join(d, "gat_rescore.t.net")
    g_q = os.path.join(d, "gat_rescore.q.net")
    net_dev = _device_run(f"""
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
""", need_s=90.0)
    if net_dev is not None:
        net_rescore["warm_device_s"] = round(net_dev, 2)
        if net_dev < net_rescore["warm_s"]:
            net_rescore["warm_s"] = round(net_dev, 2)
        _section("chainnet_device")

    _emit("all")


if __name__ == "__main__":
    main()

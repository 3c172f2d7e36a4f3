"""chr1-scale byte-parity vs the reference C binaries.

Two tiers:

- chr1-LITE (always on): a ~33 Mb build_cleaner_workload variant
  (n_scenarios=200, n_bulk=3000) exercising the native sweep, the fused
  break path, the cleaner and chainNet -rescore; outputs are compared
  against committed sha256 goldens produced by the reference C binaries
  (tests/golden/chr1_lite.json, provenance recorded there), and - when
  .ref_build is present - against a live C run as well.
- full chr1 scale (opt-in, GAT_BIG_TESTS=1 + .ref_build): the complete
  bench workload, same comparison bench.py performs on every run.
"""

import hashlib
import json
import os
import subprocess

import pytest

REF_BIN = "/root/repo/.ref_build/bin"
KENT_BIN = "/root/repo/.ref_build/kent/bin"
_HAVE_REF = os.path.exists(os.path.join(REF_BIN, "chainCleaner"))

big = pytest.mark.skipif(
    os.environ.get("GAT_BIG_TESTS") != "1" or not _HAVE_REF,
    reason="chr1-scale test: set GAT_BIG_TESTS=1 with .ref_build present")

LITE_DIR = os.environ.get("GAT_LITE_DIR", "/tmp/gat_lite") + "/cleaner"


def _sha(path):
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


@pytest.fixture(scope="session")
def lite_workload():
    from genomealignmenttools_tpu.utils.bench_workload import (
        build_cleaner_workload)
    return build_cleaner_workload(LITE_DIR, n_scenarios=200, n_bulk=3000)


def _golden():
    with open(os.path.join(os.path.dirname(__file__), "golden",
                           "chr1_lite.json")) as f:
        return json.load(f)


def test_chaincleaner_chr1_lite_parity(lite_workload, tmp_path):
    """Always-run ~33 Mb cleaner parity: native sweep + fused breaks +
    removal loop + serialize, vs committed C-produced golden hashes."""
    from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains
    from genomealignmenttools_tpu.utils.verbose import set_verbosity
    m = lite_workload
    set_verbosity(0)
    out_chain = str(tmp_path / "gat.chain")
    out_bed = str(tmp_path / "gat.bed")
    clean_chains(m["chain"], m["t2bit"], m["q2bit"], out_chain, out_bed,
                 t_sizes=m["t_sizes"], q_sizes=m["q_sizes"],
                 linear_gap="loose")
    g = _golden()
    assert _sha(out_chain) == g["c_out.chain.sha256"]
    assert _sha(out_bed) == g["c_out.bed.sha256"]
    if _HAVE_REF:  # live C cross-check when the reference build exists
        env = dict(os.environ)
        env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]
        pre_net = str(tmp_path / "c_pre.net")
        with open(pre_net, "w") as f:
            p1 = subprocess.Popen(
                ["chainNet", "-minScore=0", m["chain"], m["t_sizes"],
                 m["q_sizes"], "stdout", "/dev/null"],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env)
            subprocess.run(["NetFilterNonNested.perl", "/dev/stdin",
                            "-minScore1", "3000"],
                           stdin=p1.stdout, stdout=f, env=env, check=True)
            p1.wait()
        c_chain = str(tmp_path / "c.chain")
        c_bed = str(tmp_path / "c.bed")
        subprocess.run(
            ["chainCleaner", m["chain"], m["t2bit"], m["q2bit"], c_chain,
             c_bed, "-net=" + pre_net, "-tSizes=" + m["t_sizes"],
             "-qSizes=" + m["q_sizes"], "-linearGap=loose"],
            env=env, check=True, capture_output=True)
        assert open(out_chain).read() == open(c_chain).read()
        assert open(out_bed).read() == open(c_bed).read()


def test_chainnet_rescore_chr1_lite_parity(lite_workload, tmp_path):
    """Always-run chainNet -rescore parity on the lite workload."""
    from genomealignmenttools_tpu.engines.chain_net import chain_net
    m = lite_workload
    g_t = str(tmp_path / "t.net")
    g_q = str(tmp_path / "q.net")
    with open(g_t, "w") as t_out, open(g_q, "w") as q_out:
        chain_net(m["chain"], m["t_sizes"], m["q_sizes"], t_out, q_out,
                  rescore=True, t_2bit=m["t2bit"], q_2bit=m["q2bit"],
                  linear_gap="loose")
    g = _golden()
    assert _sha(g_t) == g["c_rescore.t.net.sha256"]
    assert _sha(g_q) == g["c_rescore.q.net.sha256"]


@big
def test_chaincleaner_chr1_scale_byte_parity(tmp_path):
    from genomealignmenttools_tpu.engines.chain_cleaner import clean_chains
    from genomealignmenttools_tpu.utils.bench_workload import (
        build_cleaner_workload)
    from genomealignmenttools_tpu.utils.verbose import set_verbosity

    work = os.environ.get("GAT_BENCH_DIR", "/tmp/gat_bench") + "/cleaner"
    m = build_cleaner_workload(work)
    env = dict(os.environ)
    env["PATH"] = f"{REF_BIN}:{KENT_BIN}:" + env["PATH"]
    c_chain = os.path.join(work, "c_out.chain")
    c_bed = os.path.join(work, "c_out.bed")
    if not os.path.exists(c_chain):
        pre_net = os.path.join(work, "c_pre.net")
        with open(pre_net, "w") as f:
            p1 = subprocess.Popen(
                ["chainNet", "-minScore=0", m["chain"], m["t_sizes"],
                 m["q_sizes"], "stdout", "/dev/null"],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env)
            subprocess.run(["NetFilterNonNested.perl", "/dev/stdin",
                            "-minScore1", "3000"],
                           stdin=p1.stdout, stdout=f, env=env, check=True)
            p1.wait()
        subprocess.run(
            ["chainCleaner", m["chain"], m["t2bit"], m["q2bit"], c_chain,
             c_bed, "-net=" + pre_net, "-tSizes=" + m["t_sizes"],
             "-qSizes=" + m["q_sizes"], "-linearGap=loose"],
            env=env, check=True, capture_output=True)
    set_verbosity(0)
    out_chain = str(tmp_path / "gat.chain")
    out_bed = str(tmp_path / "gat.bed")
    clean_chains(m["chain"], m["t2bit"], m["q2bit"], out_chain, out_bed,
                 t_sizes=m["t_sizes"], q_sizes=m["q_sizes"],
                 linear_gap="loose")
    assert open(out_chain).read() == open(c_chain).read()
    assert open(out_bed).read() == open(c_bed).read()

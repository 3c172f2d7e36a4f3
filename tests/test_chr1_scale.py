"""chr1-scale byte-parity vs the reference C binaries (opt-in: slow).

Run with GAT_BIG_TESTS=1 (and .ref_build present, see
tests/make_fixtures.py) - bench.py exercises the same comparison on every
benchmark run; this test makes it a first-class pytest target.
"""

import json
import os
import subprocess

import pytest

REF_BIN = "/root/repo/.ref_build/bin"
KENT_BIN = "/root/repo/.ref_build/kent/bin"

pytestmark = pytest.mark.skipif(
    os.environ.get("GAT_BIG_TESTS") != "1"
    or not os.path.exists(os.path.join(REF_BIN, "chainCleaner")),
    reason="chr1-scale test: set GAT_BIG_TESTS=1 with .ref_build present")


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

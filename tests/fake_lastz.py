#!/usr/bin/env python
"""lastz stand-in for RepeatFiller pipeline testing.

Parses the lastz invocation RepeatFiller generates
(`lastz T.2bit/chr[s..e][unmask] Q.2bit/chr[s..e][unmask] --format=axt ...
--strand=plus|minus`), runs this repo's GapAligner on the two regions and
emits the HSPs as ungapped axt records with absolute coordinates - exactly
the hits the in-process RepeatFiller engine sees.  This lets the reference
RepeatFiller.py (with real axtChain/chainSort binaries) and our engine be
compared end to end.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from genomealignmenttools_tpu.device.genome import Genome  # noqa: E402
from genomealignmenttools_tpu.formats.scorematrix import (  # noqa: E402
    score_scheme_default)
from genomealignmenttools_tpu.ops.seed_extend import GapAligner  # noqa: E402

CODE_TO_CHAR = np.frombuffer(b"TCAGN", dtype=np.uint8)


def parse_range(arg):
    m = re.match(r"(.+?)/([^/\[]+)\[(\d+)\.\.(\d+)\](?:\[unmask\])?$", arg)
    if m is None:
        raise SystemExit(f"fake_lastz: cannot parse range arg {arg!r}")
    path, name, s, e = m.group(1), m.group(2), int(m.group(3)), int(m.group(4))
    return path, name, s - 1, e  # 0-based half-open


def main():
    args = sys.argv[1:]
    strand = "plus"
    ranges = []
    # mirror the K/L/W lastz parameters from the command line so the
    # stand-in stays in lockstep with whatever RepeatFiller/patchChain
    # pass (RepeatFiller.py:163-169 `K=1500 L=2000 ... W=6`)
    params = {"K": 1500, "L": 2000, "W": 6}
    for a in args:
        if a.startswith("--strand="):
            strand = a.split("=", 1)[1]
        elif "[" in a and ".." in a:
            ranges.append(a)
        elif re.match(r"^[KLW]=\d+$", a):
            params[a[0]] = int(a.split("=")[1])
    t_path, t_name, t_lo, t_hi = parse_range(ranges[0])
    q_path, q_name, q_plus_lo, q_plus_hi = parse_range(ranges[1])

    t_genome = Genome(t_path)
    q_genome = Genome(q_path)
    q_strand = "+" if strand == "plus" else "-"
    t_codes = t_genome.codes(t_name, "+")
    q_codes = q_genome.codes(q_name, q_strand)
    q_size = q_genome.seq(q_name).size
    if q_strand == "-":
        q_lo, q_hi = q_size - q_plus_hi, q_size - q_plus_lo
    else:
        q_lo, q_hi = q_plus_lo, q_plus_hi

    seed_len = int(os.environ.get("FAKE_LASTZ_SEED", str(params["W"])))
    hsp = int(os.environ.get("FAKE_LASTZ_HSP", str(params["K"])))
    gapped = int(os.environ.get("FAKE_LASTZ_L", str(params["L"])))
    scheme = score_scheme_default()
    aligner = GapAligner(scheme.lut, seed_len=seed_len, hsp_threshold=hsp,
                         gapped_threshold=gapped, gap_open=scheme.gap_open,
                         gap_extend=scheme.gap_extend,
                         char_matrix=scheme.char_matrix())
    hsps = aligner.align(t_codes, q_codes, t_lo, t_hi, q_lo, q_hi)

    out = sys.stdout
    for i, (ts, te, qs, qe, sc) in enumerate(hsps):
        t_txt = CODE_TO_CHAR[np.minimum(t_codes[ts:te], 4)].tobytes().decode()
        q_txt = CODE_TO_CHAR[np.minimum(q_codes[qs:qe], 4)].tobytes().decode()
        out.write(f"{i} {t_name} {ts + 1} {te} {q_name} {qs + 1} {qe} "
                  f"{'+' if q_strand == '+' else '-'} {sc}\n")
        out.write(t_txt + "\n")
        out.write(q_txt + "\n")
        out.write("\n")


if __name__ == "__main__":
    main()

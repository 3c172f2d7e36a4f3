"""axt format: blocked pairwise alignments with explicit sequence text.

Behavioral reference: kent/src/lib/axt.c (axtRead:~100, axtWrite,
axtAddBlocksToBoxInList:~1040).  An axt record is a header line
  index tName tStart+1 tEnd qName qStart+1 qEnd strand score
followed by the target and query alignment text (with '-' gaps) and a
blank line.  Coordinates in memory are half-open 0-based; for '-' strand
records the q coordinates are in reverse-complement space (like chains).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass

import numpy as np


@dataclass
class Axt:
    q_name: str
    q_start: int
    q_end: int
    q_strand: str
    t_name: str
    t_start: int
    t_end: int
    score: int
    q_sym: str
    t_sym: str

    @property
    def sym_count(self) -> int:
        return len(self.q_sym)


def iter_axts(path_or_file, meta_out=None):
    """Streaming axt reader.  meta_out: callable receiving '#' lines at
    encounter (lineFileSetMetaDataOutput protocol, linefile.c:93-101), or a
    list to append to."""
    if isinstance(path_or_file, str):
        if path_or_file.endswith(".gz"):
            f = io.TextIOWrapper(gzip.open(path_or_file, "rb"))
        else:
            f = open(path_or_file)
        close = True
    else:
        f = path_or_file
        close = False
    emit = (meta_out.append if isinstance(meta_out, list) else meta_out)
    try:
        lines = iter(f)
        for raw in lines:
            line = raw.rstrip("\n")
            if not line.strip():
                continue
            if line.startswith("#"):
                if emit is not None:
                    emit(line)
                continue
            w = line.split()
            if len(w) < 9:
                raise ValueError(f"Bad axt header: {line!r}")
            t_sym = next(lines).rstrip("\n")
            q_sym = next(lines).rstrip("\n")
            yield Axt(
                q_name=w[4], q_start=int(w[5]) - 1, q_end=int(w[6]),
                q_strand=w[7], t_name=w[1], t_start=int(w[2]) - 1,
                t_end=int(w[3]), score=int(w[8]),
                q_sym=q_sym, t_sym=t_sym)
    finally:
        if close:
            f.close()


def read_axts(path_or_file, meta_out: list[str] | None = None) -> list[Axt]:
    return list(iter_axts(path_or_file, meta_out=meta_out))


def write_axts(axts, path_or_file) -> None:
    if isinstance(path_or_file, str):
        out = open(path_or_file, "w")
        close = True
    else:
        out = path_or_file
        close = False
    try:
        for i, a in enumerate(axts):
            out.write(f"{i} {a.t_name} {a.t_start + 1} {a.t_end} {a.q_name} "
                      f"{a.q_start + 1} {a.q_end} {a.q_strand} {a.score}\n")
            out.write(a.t_sym + "\n")
            out.write(a.q_sym + "\n")
            out.write("\n")
    finally:
        if close:
            out.close()


def axt_to_blocks(axt: Axt) -> np.ndarray:
    """Gapless blocks of an axt as (n,4) [tS,tE,qS,qE] int64
    (axtAddBlocksToBoxInList semantics, but in forward order)."""
    blocks = []
    q_pos, t_pos = axt.q_start, axt.t_start
    q_start = t_start = None
    in_block = False
    for qc, tc in zip(axt.q_sym + "-", axt.t_sym + "-"):
        adv_q = qc.isalpha()
        adv_t = tc.isalpha()
        if adv_q and adv_t:
            if not in_block:
                q_start, t_start = q_pos, t_pos
                in_block = True
        else:
            if in_block and q_pos > q_start:
                blocks.append((t_start, t_pos, q_start, q_pos))
            in_block = False
        q_pos += 1 if adv_q else 0
        t_pos += 1 if adv_t else 0
    return (np.array(blocks, dtype=np.int64) if blocks
            else np.zeros((0, 4), np.int64))

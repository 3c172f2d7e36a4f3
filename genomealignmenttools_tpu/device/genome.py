"""Genome sequences as code arrays (host numpy; mirrored to device HBM).

Code mapping follows the 2bit packing (T=0 C=1 A=2 G=3, N=4).  Reverse
complement in code space is `code ^ 2` for codes < 4 (T<->A, C<->G) and N
stays N - so '-'-strand query sequences are derived on the fly without a
character round-trip (reference loads revcomp'd char sequences on demand,
e.g. scoreChain.c getSeqFromHash).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..formats.twobit import TwoBitFile, TwoBitSeq


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement a code array (0..4)."""
    rc = codes[::-1]
    return np.where(rc < 4, rc ^ 2, rc).astype(codes.dtype)


@dataclass
class GenomeSeq:
    name: str
    size: int
    codes: np.ndarray  # uint8 codes 0..4, full chromosome
    mask: np.ndarray | None = None  # bool soft-mask, only loaded when needed
    _rc: np.ndarray | None = field(default=None, repr=False)

    def rc_codes(self) -> np.ndarray:
        if self._rc is None:
            self._rc = revcomp_codes(self.codes)
        return self._rc


class Genome:
    """Lazily-loaded genome backed by a 2bit file; caches decoded chroms."""

    def __init__(self, twobit_path: str, with_mask: bool = False):
        self.tbf = TwoBitFile(twobit_path)
        self.with_mask = with_mask
        self._seqs: dict[str, GenomeSeq] = {}

    def names(self) -> list[str]:
        return self.tbf.seq_names()

    def seq(self, name: str) -> GenomeSeq:
        if name not in self._seqs:
            raw: TwoBitSeq = self.tbf.read_seq(name)
            self._seqs[name] = GenomeSeq(
                name=name,
                size=raw.size,
                codes=raw.codes(),
                mask=raw.mask_bits() if self.with_mask else None,
            )
        return self._seqs[name]

    def codes(self, name: str, strand: str = "+") -> np.ndarray:
        s = self.seq(name)
        return s.codes if strand == "+" else s.rc_codes()

"""Seed-and-extend local alignment for bounded regions (the lastz stage of
RepeatFiller / patchChain, re-designed).

Behavioral reference: the role lastz plays in src/RepeatFiller.py:445-468
(repeat-seeded alignment inside chain gaps, K/L score thresholds, W word
size) - not a lastz port.  Design:

- exact k-mer seeds over the two regions (soft-mask ignored, like lastz's
  [unmask]; N-containing words excluded)
- per *diagonal*, the full diagonal substitution-score vector is scanned
  for maximal-scoring segments (clamped-prefix-sum decomposition), giving
  gap-free HSPs - equivalent to greedy x-drop extension of every seed on
  the diagonal at once, and fully vectorized
- HSPs above the threshold feed the kd-tree chainer (engines/kd_chainer),
  which plays lastz's gapped/chaining stage

Host numpy implementation; the per-diagonal scan maps 1:1 onto the device
local-score kernel for future batching.
"""

from __future__ import annotations

import numpy as np


def kmer_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Base-4 packed k-mers; -1 where the window contains an N."""
    n = codes.shape[0]
    if n < k:
        return np.zeros(0, np.int64)
    c = codes.astype(np.int64)
    val = np.zeros(n - k + 1, np.int64)
    bad = np.zeros(n - k + 1, bool)
    for j in range(k):
        w = c[j:n - k + 1 + j]
        val = (val << 2) | np.minimum(w, 3)
        bad |= w >= 4
    val[bad] = -1
    return val


def _max_segments(scores: np.ndarray, min_score: int):
    """Disjoint maximal-scoring segments with score >= min_score.

    Returns list of (start, end, segment_score).  Uses the clamp-at-zero
    decomposition: within each zero-reset region the best segment runs
    from just after the prefix minimum to the prefix maximum.
    """
    out = []
    n = scores.shape[0]
    if n == 0:
        return out
    # take the globally best segment, then recurse on the two flanks
    # (segments above threshold are rare and few)
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= 0:
            continue
        seg = scores[lo:hi]
        c = np.cumsum(seg)
        pref = np.concatenate([[0], c])
        best_end = int(np.argmax(c))
        best_start = int(np.argmin(pref[:best_end + 1]))
        score = int(c[best_end] - pref[best_start])
        if score < min_score:
            continue
        out.append((lo + best_start, lo + best_end + 1, score))
        stack.append((lo, lo + best_start))
        stack.append((lo + best_end + 1, hi))
    out.sort()
    return out


class GapAligner:
    """Aligns two bounded genome regions into scored gap-free blocks."""

    def __init__(self, lut: np.ndarray, seed_len: int = 10,
                 hsp_threshold: int = 1500, max_region: int = 1_000_000,
                 max_seeds: int = 2_000_000):
        self.lut = np.asarray(lut, dtype=np.int64)
        self.seed_len = seed_len
        self.hsp_threshold = hsp_threshold
        self.max_region = max_region
        self.max_seeds = max_seeds

    def align(self, t_codes: np.ndarray, q_codes: np.ndarray,
              t_lo: int, t_hi: int, q_lo: int, q_hi: int) -> list:
        """HSP block rows [tS, tE, qS, qE, score] (absolute coordinates in
        the supplied code arrays), sorted by (q, t)."""
        if t_hi - t_lo > self.max_region or q_hi - q_lo > self.max_region:
            return []
        t_region = t_codes[t_lo:t_hi]
        q_region = q_codes[q_lo:q_hi]
        k = self.seed_len
        t_kmers = kmer_codes(t_region, k)
        q_kmers = kmer_codes(q_region, k)
        if t_kmers.size == 0 or q_kmers.size == 0:
            return []

        order = np.argsort(t_kmers, kind="stable")
        t_sorted = t_kmers[order]
        lo_idx = np.searchsorted(t_sorted, q_kmers, side="left")
        hi_idx = np.searchsorted(t_sorted, q_kmers, side="right")
        counts = hi_idx - lo_idx
        valid = (q_kmers >= 0) & (counts > 0)
        counts = np.where(valid, counts, 0)
        total = int(counts.sum())
        if total == 0 or total > self.max_seeds:
            return []
        q_pos = np.repeat(np.arange(q_kmers.shape[0]), counts)
        flat = np.concatenate(
            [order[lo_idx[i]:hi_idx[i]] for i in np.flatnonzero(counts)]) \
            if total else np.zeros(0, np.int64)
        t_pos = flat

        # unique diagonals (t - q per region coords)
        diags = np.unique(t_pos - q_pos)
        lut = self.lut
        blocks = []
        tn, qn = t_region.shape[0], q_region.shape[0]
        for d in diags:
            d = int(d)
            # overlap of the diagonal with both regions
            t0 = max(0, d)
            q0 = t0 - d
            length = min(tn - t0, qn - q0)
            if length < k:
                continue
            ts = t_region[t0:t0 + length].astype(np.int64)
            qs = q_region[q0:q0 + length].astype(np.int64)
            scores = lut[qs, ts]
            for s, e, sc in _max_segments(scores, self.hsp_threshold):
                blocks.append([t_lo + t0 + s, t_lo + t0 + e,
                               q_lo + q0 + s, q_lo + q0 + e, sc])
        blocks.sort(key=lambda b: (b[2], b[0]))
        return blocks

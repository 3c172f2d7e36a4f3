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
    # take the globally best segment (max over ends e of
    # pref[e+1] - min(pref[:e+1]), the running-min formulation), then
    # recurse on the two flanks (segments above threshold are rare)
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= 0:
            continue
        seg = scores[lo:hi]
        c = np.cumsum(seg)
        pref = np.concatenate([[0], c])
        runmin = np.minimum.accumulate(pref[:-1])
        cand = c - runmin  # best segment score ending at each position
        best_end = int(np.argmax(cand))
        score = int(cand[best_end])
        if score < min_score:
            continue
        best_start = int(np.argmin(pref[:best_end + 1]))
        out.append((lo + best_start, lo + best_end + 1, score))
        stack.append((lo, lo + best_start))
        stack.append((lo + best_end + 1, hi))
    out.sort()
    return out


_CODE2CHAR = np.frombuffer(b"TCAGN", dtype=np.uint8)


class GapAligner:
    """Aligns two bounded genome regions into scored gap-free blocks.

    Two stages, mirroring the role lastz's K/L thresholds play
    (RepeatFiller.py:163-169 `K=1500 L=2000`, patchChain.perl:23 `L=2500`):

    - ungapped: per-diagonal maximal segments with score >= K
      (hsp_threshold) - the HSP stage
    - gapped (when gapped_threshold/L is set): each HSP is extended left
    and right across indels with the banded affine-gap DP
      (ops/band_ext, the bit-exact kent bandExt port); an alignment is
      kept iff its total gapped score >= L.  Without L, HSPs are emitted
      directly (the round-1 behavior).

    The emitted gap-free blocks feed the kd-tree chainer (lastz's chaining
    stage is played by engines/kd_chainer downstream).
    """

    def __init__(self, lut: np.ndarray, seed_len: int = 10,
                 hsp_threshold: int = 1500, max_region: int = 1_000_000,
                 max_seeds: int = 2_000_000,
                 gapped_threshold: int | None = None,
                 gap_open: int = 400, gap_extend: int = 30,
                 char_matrix: np.ndarray | None = None,
                 max_insert: int = 100, max_ext: int = 2_000):
        self.lut = np.asarray(lut, dtype=np.int64)
        self.seed_len = seed_len
        self.hsp_threshold = hsp_threshold
        self.max_region = max_region
        self.max_seeds = max_seeds
        self.gapped_threshold = gapped_threshold
        self.gap_open = gap_open
        self.gap_extend = gap_extend
        self.char_matrix = char_matrix
        self.max_insert = max_insert
        self.max_ext = max_ext

    # -- gapped stage --------------------------------------------------
    def _ext_blocks_and_score(self, t_sym: bytes, q_sym: bytes,
                              t_anchor: int, q_anchor: int, direction: int):
        """Turn band_ext symbol strings into gap-free blocks + affine
        score.  Coordinates grow from (t_anchor, q_anchor) in
        `direction`; for direction=-1 the anchor is the block START.

        band_ext returns syms in genomic-ASCENDING order for both
        directions (it reverses its output only for direction>0, having
        run the DP on reversed input for direction<0) - so for the left
        extension the anchor-adjacent symbol is LAST.  Flip to
        anchor-adjacent-first so the offset arithmetic below is uniform.
        """
        ta = np.frombuffer(t_sym, np.uint8)
        qa = np.frombuffer(q_sym, np.uint8)
        if direction < 0:
            ta = ta[::-1]
            qa = qa[::-1]
        dash = ord("-")
        both = (ta != dash) & (qa != dash)
        score = int(self.char_matrix[ta[both], qa[both]].sum())
        # affine gap charges: O for the first base, E per extra
        # (bandExt.c state init, bandExt.c:129-141)
        gap = ~both
        if gap.any():
            runs = np.flatnonzero(np.diff(np.concatenate(
                [[0], gap.view(np.int8), [0]])))
            starts, ends = runs[0::2], runs[1::2]
            lens = ends - starts
            score -= int(self.gap_open * len(lens)
                         + self.gap_extend * (lens - 1).sum())
        # blocks: runs of aligned columns; t/q advance where not a dash
        t_adv = np.cumsum(ta != dash)
        q_adv = np.cumsum(qa != dash)
        blocks = []
        if both.any():
            bruns = np.flatnonzero(np.diff(np.concatenate(
                [[0], both.view(np.int8), [0]])))
            for s, e in zip(bruns[0::2], bruns[1::2]):
                t_off0 = int(t_adv[s - 1]) if s else 0
                q_off0 = int(q_adv[s - 1]) if s else 0
                t_off1, q_off1 = int(t_adv[e - 1]), int(q_adv[e - 1])
                if direction > 0:
                    blocks.append([t_anchor + t_off0, t_anchor + t_off1,
                                   q_anchor + q_off0, q_anchor + q_off1])
                else:
                    blocks.append([t_anchor - t_off1, t_anchor - t_off0,
                                   q_anchor - q_off1, q_anchor - q_off0])
        return blocks, score

    def _band_batch(self):
        cached = getattr(self, "_band_batch_obj", None)
        if cached is None:
            from .pallas_band import BandExtBatch
            cached = self._band_batch_obj = BandExtBatch(
                False, self.char_matrix, self.gap_open, self.gap_extend,
                self.max_insert, a_max=max(256, -(-self.max_ext // 128)
                                           * 128))
        return cached

    def _gapped(self, hsps: list, t_region: np.ndarray, q_region: np.ndarray,
                t_lo: int, q_lo: int) -> list:
        """Extend HSPs across indels; keep alignments scoring >= L.

        All (left, right) extension problems are built up front and run
        through the batched banded-DP kernel (ops/pallas_band: Pallas on
        TPU, the numpy band_ext loop elsewhere - identical results), then
        the best-first coverage replay uses the batch results."""
        if self.char_matrix is None:
            from ..formats.scorematrix import score_scheme_default
            self.char_matrix = score_scheme_default().char_matrix()
        t_chars = _CODE2CHAR[np.minimum(t_region, 4)]
        q_chars = _CODE2CHAR[np.minimum(q_region, 4)]
        tn, qn = t_region.shape[0], q_region.shape[0]
        # best-first; skip anchors already covered by an emitted alignment
        hsps = sorted(hsps, key=lambda b: -b[4])
        probs = []
        for tS, tE, qS, qE, _score in hsps:
            rt0, rt1 = tS - t_lo, tE - t_lo
            rq0, rq1 = qS - q_lo, qE - q_lo
            probs.append((
                t_chars[rt1:min(tn, rt1 + self.max_ext)].tobytes(),
                q_chars[rq1:min(qn, rq1 + self.max_ext)].tobytes(), 1))
            probs.append((
                t_chars[max(0, rt0 - self.max_ext):rt0].tobytes(),
                q_chars[max(0, rq0 - self.max_ext):rq0].tobytes(), -1))
        exts = self._band_batch().run(probs)

        covered: list[tuple[int, int, int]] = []  # (diag, t0, t1) in region
        out = []
        for hi, (tS, tE, qS, qE, hsp_score) in enumerate(hsps):
            rt0, rt1 = tS - t_lo, tE - t_lo
            rq0 = qS - q_lo
            diag = rt0 - rq0
            if any(d == diag and c0 <= rt0 and rt1 <= c1
                   for d, c0, c1 in covered):
                continue
            total = hsp_score
            blocks = [[tS, tE, qS, qE]]
            ok, t_sym, q_sym, _, _ = exts[2 * hi]       # right extension
            if ok:
                eb, es = self._ext_blocks_and_score(t_sym, q_sym, tE, qE, 1)
                blocks.extend(eb)
                total += es
            ok, t_sym, q_sym, _, _ = exts[2 * hi + 1]   # left extension
            if ok:
                eb, es = self._ext_blocks_and_score(t_sym, q_sym, tS, qS, -1)
                blocks.extend(eb)
                total += es
            if total < self.gapped_threshold:
                continue
            for bt0, bt1, bq0, bq1 in blocks:
                covered.append((bt0 - bq0 - (t_lo - q_lo),
                                bt0 - t_lo, bt1 - t_lo))
            out.extend([b[0], b[1], b[2], b[3],
                        int(self.lut[q_region[b[2] - q_lo:b[3] - q_lo],
                                     t_region[b[0] - t_lo:b[1] - t_lo]]
                            .sum())]
                       for b in blocks)
        out.sort(key=lambda b: (b[2], b[0]))
        return out

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
        if self.gapped_threshold is not None:
            return self._gapped(blocks, t_region, q_region, t_lo, q_lo)
        blocks.sort(key=lambda b: (b[2], b[0]))
        return blocks

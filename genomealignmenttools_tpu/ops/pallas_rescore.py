"""Pallas TPU kernel for batched per-base block scoring.

XLA's gather on TPU runs at ~0.1 Gelem/s (measured), which makes the naive
expand+gather rescore ~30x slower than the single-core C loop.  This kernel
avoids gathers entirely:

- host packs blocks (split into chunks of <= CHUNK bases) into *windows*:
  runs of chunks whose t- and q-spans both fit in WIN bases.  Chains are
  nearly contiguous in both genomes, so windows stay large.
- grid = windows; per step the kernel DMAs the two WIN-byte genome windows
  HBM->VMEM (double-buffered, overlapping the previous step's compute)
- per chunk: two 128-aligned slices of width CW=CHUNK+128 (Mosaic requires
  lane-aligned dynamic slices); the q slice is rotated into t-alignment by
  a bit-decomposed circular roll; scoring uses a *packed* LUT: for each
  q code a 32-bit constant packs the four t-code scores as bytes, so the
  per-base score is (packed[q] >> 8*t) & 0xFF sign-extended - arithmetic
  only, no per-entry select chain.  (Matrix rows/cols for code 4 = N are
  always zero in blastz schemes - axt.c propagateCase leaves them
  untouched - so masking t==4 / q==4 to zero is exact.)
- per-chunk sums land in a (1, CMAX) carry written once per window

Results are bit-identical to the host numpy path (int32 exact); the host
segment-sums chunk scores back to blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tunables (static in the kernel)
CHUNK = 256          # max bases per chunk (blocks longer are split)
CW = CHUNK + 128     # aligned slice width
WIN = 16384          # genome window span per grid step
CMAX = 256           # max chunks per window


def _rescore_kernel(t_base_ref, q_base_ref, nchunk_ref, packed_lut_ref,
                    desc_ref,          # (1, 3, CMAX) int32 in SMEM
                    t_hbm, q_hbm,      # (1, N) int32 genome code arrays in ANY/HBM
                    out_ref,           # (1, 8, CMAX//8) int32, c -> (c%8, c//8)
                    t_win, q_win, t_tile, q_tile, sems):
    """One grid step = one window."""
    i = pl.program_id(0)
    n_win = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def start_dma(w, s):
        tb = pl.multiple_of(t_base_ref[w], 1024)
        qb = pl.multiple_of(q_base_ref[w], 1024)
        pltpu.make_async_copy(t_hbm.at[:, pl.ds(tb, WIN)], t_win.at[s],
                              sems.at[s, 0]).start()
        pltpu.make_async_copy(q_hbm.at[:, pl.ds(qb, WIN)], q_win.at[s],
                              sems.at[s, 1]).start()

    @pl.when(i == 0)
    def _():
        start_dma(0, 0)

    @pl.when(i + 1 < n_win)
    def _():
        start_dma(i + 1, nxt)

    # wait for this window's data
    pltpu.make_async_copy(t_hbm.at[:, pl.ds(pl.multiple_of(t_base_ref[i], 1024), WIN)],
                          t_win.at[slot], sems.at[slot, 0]).wait()
    pltpu.make_async_copy(q_hbm.at[:, pl.ds(pl.multiple_of(q_base_ref[i], 1024), WIN)],
                          q_win.at[slot], sems.at[slot, 1]).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, CW), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (8, CMAX // 8), 1)
    row_iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    pk0 = packed_lut_ref[0]
    pk1 = packed_lut_ref[1]
    pk2 = packed_lut_ref[2]
    pk3 = packed_lut_ref[3]

    def vec8(scalars):
        """Build an (8,1) int32 vector from 8 scalars."""
        v = jnp.zeros((8, 1), jnp.int32)
        for j, s in enumerate(scalars):
            v = jnp.where(row_iota8 == j, s, v)
        return v

    def group_body(g, scores):
        # process chunks c = 8g .. 8g+7 as rows of an (8, CW) tile
        base_c = g * 8
        tos, qos, lns = [], [], []
        for j in range(8):
            c = base_c + j
            to = desc_ref[0, 0, c]
            qo = desc_ref[0, 1, c]
            lns.append(desc_ref[0, 2, c])
            to_al = pl.multiple_of((to // 128) * 128, 128)
            qo_al = pl.multiple_of((qo // 128) * 128, 128)
            tos.append(to - to_al)
            qos.append(qo - qo_al)
            # stage rows through VMEM scratch (a direct 8-row concatenate
            # of dynamic slices miscompiles on this Mosaic build: only row
            # 0 survives)
            t_tile[j, :] = t_win[slot, 0, pl.ds(to_al, CW)]
            q_tile[j, :] = q_win[slot, 0, pl.ds(qo_al, CW)]
        t8 = t_tile[...]
        q8 = q_tile[...]
        dt_v = vec8(tos)
        dq_v = vec8(qos)
        ln_v = vec8(lns)
        # per-row right-roll of q8 by r = (dt - dq) mod CW, bit-decomposed
        r_v = jax.lax.rem(dt_v - dq_v + CW, CW)
        for b in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            take = jax.lax.rem(r_v // b, 2) == 1
            q8 = jnp.where(take, pltpu.roll(q8, b, axis=1), q8)
        packed = jnp.where(q8 == 0, pk0,
                           jnp.where(q8 == 1, pk1,
                                     jnp.where(q8 == 2, pk2,
                                               jnp.where(q8 == 3, pk3, 0))))
        shift = jnp.minimum(t8, 3) * 8
        v8 = jax.lax.shift_right_logical(packed, shift) & 0xFF
        val = v8 - ((v8 & 0x80) << 1)  # sign-extend the byte
        valid = (lane >= dt_v) & (lane < dt_v + ln_v) & (t8 < 4) & (q8 < 4)
        val = jnp.where(valid, val, 0)
        sums = jnp.sum(val, axis=1, keepdims=True)  # (8, 1)
        return jnp.where(col_iota == g, sums, scores)

    n_groups = (nchunk_ref[i] + 7) // 8
    scores = jax.lax.fori_loop(0, n_groups, group_body,
                               jnp.zeros((8, CMAX // 8), jnp.int32),
                               unroll=False)
    # chunk c lives at (row c%8, col c//8)
    out_ref[0] = scores

@functools.partial(jax.jit, static_argnames=("n_windows", "interpret"))
def _rescore_call(t_bases, q_bases, n_chunks, packed_lut, descs, t_codes,
                  q_codes, n_windows: int, interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec((1, 3, CMAX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, CMAX // 8), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, WIN), jnp.int32),
            pltpu.VMEM((2, 1, WIN), jnp.int32),
            pltpu.VMEM((8, CW), jnp.int32),
            pltpu.VMEM((8, CW), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _rescore_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows, 8, CMAX // 8), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(t_bases, q_bases, n_chunks, packed_lut, descs, t_codes, q_codes)


def pack_lut(lut: np.ndarray) -> np.ndarray:
    """Pack each q row's four t scores into one int32 (byte per t code).

    Requires N rows/cols to be zero and scores in int8 range - true for
    every blastz scheme (axt.c never fills non-acgt entries).
    """
    lut = np.asarray(lut, np.int64)
    assert np.all(lut[4, :] == 0) and np.all(lut[:, 4] == 0), \
        "packed LUT requires zero N row/col"
    assert np.all((lut >= -128) & (lut <= 127)), "scores must fit int8"
    out = np.zeros(4, np.uint32)
    for q in range(4):
        acc = 0
        for t in range(4):
            acc |= (int(lut[q, t]) & 0xFF) << (8 * t)
        out[q] = acc
    return out.view(np.int32)


def pack_windows(blocks: np.ndarray):
    """Split blocks into chunks and pack chunks into windows (vectorized).

    Returns (t_bases, q_bases, n_chunks, descs, chunk_block_ids, n_windows,
    chunks_per_window); descs is (n_windows, CMAX, 3)
    [rel_t_off, rel_q_off, len].
    """
    n = blocks.shape[0]
    sizes = (blocks[:, 1] - blocks[:, 0]).astype(np.int64)
    n_chunks_per_block = np.maximum((sizes + CHUNK - 1) // CHUNK, 1)
    total_chunks = int(n_chunks_per_block.sum())
    c_block = np.repeat(np.arange(n), n_chunks_per_block)
    within = np.arange(total_chunks) - np.repeat(
        np.cumsum(n_chunks_per_block) - n_chunks_per_block, n_chunks_per_block)
    c_toff = (blocks[c_block, 0] + within * CHUNK).astype(np.int64)
    c_qoff = (blocks[c_block, 2] + within * CHUNK).astype(np.int64)
    c_len = np.minimum(sizes[c_block] - within * CHUNK, CHUNK).astype(np.int64)

    # monotonic segments (chain transitions break t/q monotonicity)
    if total_chunks > 1:
        dec = (np.diff(c_toff) < 0) | (np.diff(c_qoff) < 0)
        seg_starts = np.concatenate([[0], np.flatnonzero(dec) + 1,
                                     [total_chunks]])
        seg_starts = np.unique(seg_starts)
    else:
        seg_starts = np.array([0, total_chunks])

    lim = WIN - CW
    win_start_idx = []   # first chunk index of each window
    win_end_idx = []
    t_bases_l = []
    q_bases_l = []
    for s_i in range(len(seg_starts) - 1):
        lo, hi = int(seg_starts[s_i]), int(seg_starts[s_i + 1])
        ci = lo
        while ci < hi:
            t_base = (int(c_toff[ci]) // 1024) * 1024
            q_base = (int(c_qoff[ci]) // 1024) * 1024
            # window ends at the first chunk violating any constraint
            e1 = int(np.searchsorted(c_toff[ci:hi], t_base + lim,
                                     side="right")) + ci
            e2 = int(np.searchsorted(c_qoff[ci:hi], q_base + lim,
                                     side="right")) + ci
            end = min(e1, e2, ci + CMAX, hi)
            win_start_idx.append(ci)
            win_end_idx.append(end)
            t_bases_l.append(t_base)
            q_bases_l.append(q_base)
            ci = end
    n_windows = len(win_start_idx)
    ws = np.array(win_start_idx, np.int64)
    we = np.array(win_end_idx, np.int64)
    counts = we - ws
    descs = np.zeros((n_windows, CMAX, 3), np.int32)
    # scatter chunk descriptors into window slots
    w_of_chunk = np.repeat(np.arange(n_windows), counts)
    slot_of_chunk = np.arange(total_chunks) - np.repeat(ws, counts)
    descs[w_of_chunk, slot_of_chunk, 0] = c_toff - np.repeat(
        np.array(t_bases_l, np.int64), counts)
    descs[w_of_chunk, slot_of_chunk, 1] = c_qoff - np.repeat(
        np.array(q_bases_l, np.int64), counts)
    descs[w_of_chunk, slot_of_chunk, 2] = c_len
    return (np.array(t_bases_l, np.int32), np.array(q_bases_l, np.int32),
            counts.astype(np.int32), descs,
            c_block.astype(np.int64), n_windows, counts.astype(np.int64))


# Windows per kernel dispatch.  Exactly ONE compiled shape exists: the
# remote-compile helper on tunneled TPU backends costs ~100-200 s per
# Pallas shape, so the dispatch grid must never track workload size (a
# second "small" shape was measured to cost far more in cold compile than
# its padding savings are worth: jobs are group-concatenated, so small
# batches are rare and a padded 2048-window batch wastes only ~60-90 ms).
# Batches are dispatched asynchronously (JAX dispatch is non-blocking) and
# fetched once at the end, so the ~24 ms link RTT is pipelined, not paid
# per batch.
WB = 2048


class PallasBlockScorer:
    """Pallas-accelerated block scorer: genome-resident windowed DMA
    kernel, fixed-shape streamed dispatches, native C++ combine via the
    chunk_scores_multi interface (same contract as PairBlockScorer)."""

    def __init__(self, lut: np.ndarray, t_cache, q_cache):
        self.packed_lut = pack_lut(lut)
        self._dev_lut = None
        self.t_cache = t_cache
        self.q_cache = q_cache
        self._pack_cache: dict[int, tuple] = {}

    def _pack(self, blocks: np.ndarray):
        """pack_windows memoized by blocks identity (array pinned in the
        entry: a freed array's id can be reused by a different blocks
        array, silently serving stale descriptors).  The entry also holds
        the batch inputs once uploaded (dev_batches, filled lazily by
        _dispatch_job): a RESIDENT workload re-scoring the same chains
        ships nothing on repeat calls."""
        ck = id(blocks)
        hit = self._pack_cache.get(ck)
        if hit is not None and hit[0] is blocks:
            return hit[1]
        (t_bases, q_bases, n_chunks, descs, slot_block, n_windows,
         chunks_per_window) = pack_windows(blocks)
        packed = [t_bases, q_bases, n_chunks, descs.transpose(0, 2, 1),
                  slot_block, n_windows, chunks_per_window, None]
        if len(self._pack_cache) > 16:
            self._pack_cache.clear()
        self._pack_cache[ck] = (blocks, packed)
        return packed

    def _dispatch_job(self, t_name, q_name, q_strand, blocks):
        """Dispatch all window batches of one job asynchronously.  Returns
        (pending device arrays, n_windows, chunks_per_window, slot_block)."""
        from .rescore import PERF
        packed = self._pack(blocks)
        (t_bases, q_bases, n_chunks, descs_t, slot_block, n_windows,
         chunks_per_window, dev_batches) = packed
        t_codes = self.t_cache.codes_padded_i32(t_name, "+", WIN)
        q_codes = self.q_cache.codes_padded_i32(q_name, q_strand, WIN)
        if self._dev_lut is None:
            self._dev_lut = jnp.asarray(self.packed_lut)
        interpret = jax.default_backend() == "cpu"
        if dev_batches is None:
            dev_batches = []
            start = 0
            while start < n_windows:
                wb = WB
                end = min(start + wb, n_windows)
                tb = _pad_to(t_bases[start:end], wb)
                qb = _pad_to(q_bases[start:end], wb)
                nc = _pad_to(n_chunks[start:end], wb)
                de = np.zeros((wb, 3, CMAX), np.int32)
                de[:end - start] = descs_t[start:end]
                PERF["h2d_bytes"] += (tb.nbytes + qb.nbytes + nc.nbytes
                                      + de.nbytes)
                dev_batches.append((jnp.asarray(tb), jnp.asarray(qb),
                                    jnp.asarray(nc), jnp.asarray(de),
                                    wb, end - start))
                start = end
            packed[7] = dev_batches
        pending = []
        for (tb, qb, nc, de, wb, used) in dev_batches:
            PERF["dispatches"] += 1
            out = _rescore_call(tb, qb, nc, self._dev_lut, de,
                                t_codes, q_codes, wb, interpret=interpret)
            pending.append((out, used))
        return pending, n_windows, chunks_per_window, slot_block

    @staticmethod
    def _chunk_scores(pending, n_windows, chunks_per_window) -> np.ndarray:
        """Fetch batch outputs and extract per-chunk sums in chunk order."""
        from .rescore import PERF
        if not pending:
            return np.zeros(0, np.int32)
        rows = []
        for out, used in pending:
            a = np.asarray(out)   # (wb, 8, CMAX//8), chunk c at (c%8, c//8)
            PERF["d2h_bytes"] += a.nbytes
            rows.append(a.transpose(0, 2, 1).reshape(a.shape[0], CMAX)[:used])
        mat = np.concatenate(rows)                      # (n_windows, CMAX)
        cpw = np.asarray(chunks_per_window, np.int64)
        mask = np.arange(CMAX)[None, :] < cpw[:, None]
        return mat[mask]                                # chunk order

    def chunk_scores_multi(self, jobs):
        """(chunk_scores int32, c_block int64, n_blocks) across jobs, with
        every batch of every job in flight before the first fetch (one
        pipelined link round trip instead of one per group)."""
        dispatched = []
        n_blocks = 0
        for (tn, qn, strand, blocks) in jobs:
            dispatched.append((self._dispatch_job(tn, qn, strand, blocks),
                               blocks.shape[0]))
            n_blocks += blocks.shape[0]
        cs_parts = []
        cb_parts = []
        block_base = 0
        for (pending, n_win, cpw, slot_block), nb in dispatched:
            cs_parts.append(self._chunk_scores(pending, n_win, cpw))
            cb_parts.append(slot_block + block_base)
            block_base += nb
        cs = np.concatenate(cs_parts) if cs_parts else np.zeros(0, np.int32)
        cb = np.concatenate(cb_parts) if cb_parts else np.zeros(0, np.int64)
        return cs.astype(np.int32, copy=False), cb, n_blocks

    def block_scores(self, t_name: str, q_name: str, q_strand: str,
                     blocks: np.ndarray) -> np.ndarray:
        n = blocks.shape[0]
        if n == 0:
            return np.zeros(0, np.int64)
        pending, n_win, cpw, slot_block = self._dispatch_job(
            t_name, q_name, q_strand, blocks)
        chunk_scores = self._chunk_scores(pending, n_win, cpw)
        block_scores = np.zeros(n, np.int64)
        np.add.at(block_scores, slot_block, chunk_scores.astype(np.int64))
        return block_scores


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_to(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, a.dtype)
    out[:a.shape[0]] = a
    return out

"""Fused Pallas segmented-combine kernel for pair-mode chain rescoring.

Replaces the staged XLA combine of ops/pair_rescore.py (_stage_delta /
_stage_cumsum / _stage_base_scatter / _stage_m / _stage_cummin /
_stage_sampled / _stage_cummax): four M-element cumulative ops whose TPU
lowering runs at ~12 GB/s each (log-step shift trees with an HBM round
trip per stage, ~28 of the pipeline's ~35 ms device time at chr1 scale).
Here all three dependent segmented scans (chain-prefix sum, running
min of sampled prefixes, running max of local candidates) run in ONE
kernel pass: a tile of chunk sums is DMA'd to VMEM once and every
Hillis-Steele step works on registers/VMEM, so HBM sees each input byte
exactly once.

Semantics are the staged pipeline's, with segmentation done by RESET
FLAGS instead of the chain_id*2^33 int64 offset trick - real resets keep
everything in int32, which PairChainScorer's existing overflow guard
(|any chain prefix| <= ali*127 + gap_total < 2^31) already ensures is
exact.  Per chunk i (chain-local, reset at chain starts):

    c_i      = (start_i ? 0 : c_{i-1}) + s_i - bias_i
    m_i      = min(sample_i ? c_i : INF, first_i ? c_i - s_i : INF)
    runmin_i = min over chain prefix of m
    w_i      = max over chain prefix of (sample ? c - min(runmin, 0) : -INF)

and per chain: global = c[end_idx], local = max(w[end_idx], 0)
(kent chainConnect.c chainCalcScore:24-40 / scoreChain.c
chainCalcScoreLocal:176-198 exactly - bit-identical to the host path,
asserted by tests/test_pallas_combine.py against the staged oracle).

The scan order is row-major over (SL, 128) tiles; a flat element shift
by k decomposes into a lane roll (+ previous-row fix-up for the wrapped
columns) for k < 128 and a sublane roll for multiples of 128.  Cross-
tile carries (one int32 per scan) ride in SMEM scratch across the
sequential TPU grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
SUBLANES = 256                  # tile = SUBLANES * LANES = 32768 chunks
TILE = SUBLANES * LANES

I32_MAX = np.int32(2 ** 31 - 1)
I32_MIN = np.int32(-(2 ** 31) + 1)

# flags bit layout (packed host-side in PairChainScorer._meta)
F_START = 1                     # first chunk of a chain
F_FIRST = 2                     # first chunk of a block (bias applied)
F_SAMPLE = 4                    # last chunk of a block (scored prefix)


def _flat_shift(x, k: int, fill):
    """Logical right-shift of the row-major (SL, L) sequence by k
    elements; the first k logical positions get `fill`."""
    from jax.experimental.pallas import tpu as pltpu
    sl, lanes = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if k % lanes == 0:
        r = k // lanes
        y = pltpu.roll(x, shift=r, axis=0)
        return jnp.where(row < r, fill, y)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = pltpu.roll(x, shift=k, axis=1)
    yp = pltpu.roll(y, shift=1, axis=0)   # previous row's wrapped tail
    z = jnp.where(col < k, yp, y)
    return jnp.where((row == 0) & (col < k), fill, z)


def _seg_scan(v, f, op, identity):
    """Segmented inclusive scan over the row-major tile.

    v: (SL, L) int32 values; f: (SL, L) int32 reset flags (1 = segment
    start).  Returns (scan, f_prefix) where f_prefix[i] = any REAL reset
    in the tile at positions <= i (used for cross-tile carry compose).

    The flag shift fills with 0, NOT 1: the value shift already fills
    with the op identity, so combining past the tile start is a no-op
    and needs no flag guard - while a fill of 1 would leak fake resets
    into f_prefix, making the carry compose skip the previous tile's
    contribution for every chain that crosses a tile boundary and ends
    anywhere but the tile's last element (found on the chr1-scale
    workload; the fix is load-bearing for multi-tile correctness)."""
    n = v.shape[0] * v.shape[1]
    k = 1
    while k < n:
        sv = _flat_shift(v, k, identity)
        sf = _flat_shift(f, k, jnp.int32(0))
        v = jnp.where(f > 0, v, op(sv, v))
        f = f | sf
        k *= 2
    return v, f


def _last_elem(x, kind):
    """Scalar at logical position (-1, -1) via a masked reduction -
    vector->scalar extraction by indexing lowers to dynamic_slice, which
    Mosaic does not implement (found on real v5e; interpret mode hides it)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = (row == x.shape[0] - 1) & (col == x.shape[1] - 1)
    if kind == "min":
        return jnp.min(jnp.where(mask, x, I32_MAX))
    return jnp.max(jnp.where(mask, x, I32_MIN))


def _combine_kernel(s_ref, bias_ref, flags_ref, c_ref, w_ref, carry_ref):
    from jax.experimental import pallas as pl

    s = s_ref[...]
    flags = flags_ref[...]
    start = (flags & F_START).astype(jnp.int32)
    is_first = (flags & F_FIRST) > 0
    is_sample = (flags & F_SAMPLE) > 0

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[0] = jnp.int32(0)
        carry_ref[1] = I32_MAX
        carry_ref[2] = I32_MIN

    # scan 1: chain-local prefix sum of (s - bias)
    dp = s - bias_ref[...]
    c_t, f_c = _seg_scan(dp, start, lambda a, b: a + b, jnp.int32(0))
    c = jnp.where(f_c > 0, c_t, carry_ref[0] + c_t)

    # scan 2: running min of allowed prefixes (post-block / post-gap)
    m = jnp.minimum(jnp.where(is_sample, c, I32_MAX),
                    jnp.where(is_first, c - s, I32_MAX))
    mn_t, f_m = _seg_scan(m, start, jnp.minimum, I32_MAX)
    runmin = jnp.where(f_m > 0, mn_t, jnp.minimum(carry_ref[1], mn_t))

    # scan 3: running max of local-score candidates at sample points
    sampled = jnp.where(is_sample, c - jnp.minimum(runmin, 0), I32_MIN)
    w_t, f_w = _seg_scan(sampled, start, jnp.maximum, I32_MIN)
    w = jnp.where(f_w > 0, w_t, jnp.maximum(carry_ref[2], w_t))

    c_ref[...] = c
    w_ref[...] = w
    carry_ref[0] = _last_elem(c, "max")
    carry_ref[1] = _last_elem(runmin, "min")
    carry_ref[2] = _last_elem(w, "max")


@functools.partial(jax.jit, static_argnames=("interpret",))
def pair_combine_scan(s, bias, flags, interpret: bool = False):
    """(c, w) int32 per chunk; inputs are (M,) with M % TILE == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = s.shape[0]
    if m % TILE:
        pad = TILE - m % TILE
        s = jnp.pad(s, (0, pad))        # inert: continues the last chain
        bias = jnp.pad(bias, (0, pad))
        flags = jnp.pad(flags, (0, pad))
        m += pad
    grid = m // TILE
    shape2 = (m // LANES, LANES)
    spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0))
    c, w = pl.pallas_call(
        _combine_kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.int32),
                   jax.ShapeDtypeStruct(shape2, jnp.int32)],
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(s.reshape(shape2), bias.reshape(shape2), flags.reshape(shape2))
    return c.reshape(m), w.reshape(m)


@jax.jit
def pair_combine_finish(c, w, end_idx):
    """(n_chains, 2) int32 [global, local] from the per-chunk scans."""
    glob = c[end_idx]
    loc = jnp.maximum(w[end_idx], 0)
    return jnp.stack([glob, loc], axis=1)

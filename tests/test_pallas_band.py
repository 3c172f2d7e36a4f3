"""Differential tests: the batched Pallas banded-DP kernel must produce
outputs identical to ops/band_ext.band_ext (the bit-exact kent bandExt
port).  Runs the kernel in interpret mode so the test is hermetic-CPU;
the same kernel is Mosaic-compiled on TPU (>10x host on 10k batches,
measured 19.5x on v5e)."""

import numpy as np
import pytest

from genomealignmenttools_tpu.formats.scorematrix import score_scheme_default
from genomealignmenttools_tpu.ops.band_ext import band_ext
from genomealignmenttools_tpu.ops.pallas_band import BandExtBatch


def _problems(seed, n=10):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    probs = []
    for i in range(n):
        la = int(rng.integers(3, 180))
        lb = int(rng.integers(3, 180))
        a = bases[rng.integers(0, 4, la)].tobytes()
        if i % 2:  # homologous with indels
            bb = bytearray(a[:lb] if lb <= la
                           else a + bases[rng.integers(0, 4,
                                                       lb - la)].tobytes())
            for _ in range(int(rng.integers(1, 5))):
                pos = int(rng.integers(0, max(1, len(bb) - 2)))
                if rng.random() < 0.5 and len(bb) > 3:
                    del bb[pos]
                else:
                    bb.insert(pos, int(bases[rng.integers(0, 4)]))
            b = bytes(bb)
        else:  # unrelated
            b = bases[rng.integers(0, 4, lb)].tobytes()
        probs.append((a, b, 1 if i % 3 else -1))
    return probs


@pytest.mark.parametrize("global_mode", [False, True])
@pytest.mark.parametrize("max_insert", [7, 20])
def test_pallas_band_matches_band_ext(global_mode, max_insert):
    cm = score_scheme_default().char_matrix()
    probs = _problems(3)
    batch = BandExtBatch(global_mode, cm, 400, 30, max_insert, a_max=256,
                         interpret=True)
    got = batch.run(probs)
    for i, (a, b, d) in enumerate(probs):
        want = band_ext(global_mode, cm, 400, 30, max_insert, a, b, d)
        assert got[i] == want, (global_mode, max_insert, i)


def test_pallas_band_host_fallback_identical():
    """GAT_BAND=host path goes through band_ext directly."""
    import os
    cm = score_scheme_default().char_matrix()
    probs = _problems(9, n=4)
    os.environ["GAT_BAND"] = "host"
    try:
        batch = BandExtBatch(False, cm, 400, 30, 10, a_max=256)
        got = batch.run(probs)
    finally:
        del os.environ["GAT_BAND"]
    for i, (a, b, d) in enumerate(probs):
        assert got[i] == band_ext(False, cm, 400, 30, 10, a, b, d)


@pytest.mark.parametrize("global_mode", [False, True])
@pytest.mark.parametrize("max_insert", [7, 100])
def test_native_band_matches_band_ext(global_mode, max_insert):
    """The threaded C++ batch (native/bandext.cpp) must equal the numpy
    oracle tuple-for-tuple (scores, tie parents, traceback syms), both
    modes, across homologous/unrelated/empty problems."""
    from genomealignmenttools_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    cm = score_scheme_default().char_matrix()
    probs = _problems(11, n=30) + [(b"", b"ACGT", 1), (b"ACGT", b"", -1)]
    batch = BandExtBatch(global_mode, cm, 400, 30, max_insert, a_max=256)
    got = batch._run_native(probs)
    assert got is not None
    for i, (a, b, d) in enumerate(probs):
        want = band_ext(global_mode, cm, 400, 30, max_insert, a, b, d)
        assert got[i] == want, (global_mode, max_insert, i)

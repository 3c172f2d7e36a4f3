"""Gap cost table unit tests: exact values from gapCalc.c semantics."""

import numpy as np

from genomealignmenttools_tpu.formats.gapcalc import (
    gap_calc_default, gap_calc_from_file, gap_calc_original)


def test_loose_small_values():
    gc = gap_calc_default()
    # direct table values (positions 1,2,3 in the loose table)
    assert gc.cost(1, 0) == 325
    assert gc.cost(2, 0) == 360
    assert gc.cost(3, 0) == 400
    assert gc.cost(0, 1) == 325
    assert gc.cost(1, 1) == 660  # both gap of total 2
    assert gc.cost(0, 0) == 0


def test_interpolation_truncation():
    gc = gap_calc_default()
    # between 3 (400) and 11 (450): v = 400 + 50*(x-3)/8
    assert gc.cost(4, 0) == 400 + int(50 * 1 / 8)  # 406
    assert gc.cost(7, 0) == 400 + 25  # exact .0
    assert gc.cost(10, 0) == 400 + int(50 * 7 / 8)  # 443


def test_extrapolation_beyond_last():
    gc = gap_calc_default()
    # loose qGap: last two points (152111, 31600) (252111, 56600)
    # slope = 25000/100000 = 0.25
    assert gc.cost(252111, 0) == 56600
    assert gc.cost(252115, 0) == 56601
    assert gc.cost(1_000_000, 0) == int(56600 + 0.25 * (1_000_000 - 252111))


def test_medium_differs():
    gc = gap_calc_original()
    assert gc.cost(1, 0) == 350
    assert gc.cost(1, 1) == 825


def test_vectorized_matches_scalar():
    gc = gap_calc_default()
    rng = np.random.default_rng(0)
    dq = rng.integers(0, 500_000, 4000)
    dt = rng.integers(0, 500_000, 4000)
    # force lots of one-sided gaps
    dq[::3] = 0
    dt[1::3] = 0
    vec = gc.cost_vec(dq, dt)
    for i in range(0, 4000, 37):
        assert vec[i] == gc.cost(int(dq[i]), int(dt[i])), (dq[i], dt[i])


def test_file_roundtrip(tmp_path):
    p = tmp_path / "gap.txt"
    p.write_text(
        "tablesize 11\n"
        "smallSize 111\n"
        "position 1 2 3 11 111 2111 12111 32111 72111 152111 252111\n"
        "qGap 325 360 400 450 600 1100 3600 7600 15600 31600 56600\n"
        "tGap 325 360 400 450 600 1100 3600 7600 15600 31600 56600\n"
        "bothGap 625 660 700 750 900 1400 4000 8000 16000 32000 57000\n")
    gc = gap_calc_from_file(str(p))
    ref = gap_calc_default()
    for dq, dt in [(0, 5), (7, 0), (3, 9), (100000, 0), (12345, 54321)]:
        assert gc.cost(dq, dt) == ref.cost(dq, dt)

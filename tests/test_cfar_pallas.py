"""Pallas bit-serial CFAR kernel vs the XLA formulation (interpret mode).

The kernel must be bit-exact in integer mode and decision-identical in float
mode (rank selection is exact via the IEEE-754 bitcast ordering; only the
mean/threshold float rounding may differ in the last ulp).
"""

import numpy as np
import pytest

from fmcw_tpu import CfarParams
from fmcw_tpu.ops import cfar as C
from fmcw_tpu.ops.cfar_pallas import cfar_2d_pallas, cfar_2d_pallas_detect

FULL = CfarParams()
QUICK = CfarParams(ref_range=2, ref_doppler=2, guard_range=1, guard_doppler=1)


def _int_map(shape=(256, 128), seed=0):
    rng = np.random.default_rng(seed)
    m = rng.integers(0, 45056, shape).astype(np.int32)
    m[shape[0] // 5, shape[1] // 4] = 45000
    m[shape[0] * 3 // 4, shape[1] * 3 // 4] = 44000
    return m


@pytest.mark.parametrize("cfar", [FULL, QUICK], ids=["full", "quick"])
def test_integer_bit_exact(cfar):
    m = _int_map()
    d1, t1, s1 = C.cfar_2d(m, 0, cfar=cfar, integer=True)
    d2, t2, s2 = cfar_2d_pallas(m, 0, cfar=cfar, integer=True, interpret=True)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_float_decision_identical():
    rng = np.random.default_rng(3)
    m = (rng.random((256, 128)) * 1e8).astype(np.float32)
    m[40, 40] = 9e8
    d1, t1, _ = C.cfar_2d(m, 0, cfar=FULL, integer=False)
    d2, t2, _ = cfar_2d_pallas(m, 0, cfar=FULL, integer=False, interpret=True)
    assert np.array_equal(np.asarray(d1) > 0, np.asarray(d2) > 0)
    # Rank selection exact: threshold/scale ratio (= order statistic) matches.
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)


def test_scale_override_and_prepadded():
    m = _int_map((128, 64), seed=5)
    _, _, s = cfar_2d_pallas(m, 6, cfar=QUICK, integer=True, interpret=True)
    assert np.all(np.asarray(s) == 6)
    # prepadded_range: manual wrap pad == internal pad.
    hr = QUICK.halo_range
    mp = np.pad(m, ((hr, hr), (0, 0)), mode="wrap")
    d1, _, _ = cfar_2d_pallas(m, 0, cfar=QUICK, integer=True, interpret=True)
    d2, _, _ = cfar_2d_pallas(mp, 0, cfar=QUICK, integer=True,
                              prepadded_range=True, interpret=True)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))


def test_rejects_non_os_variant():
    with pytest.raises(ValueError, match="os variant"):
        cfar_2d_pallas(_int_map(), 0,
                       cfar=CfarParams(variant="ca"), integer=True,
                       interpret=True)


# --- count-only detection kernel (cfar_2d_pallas_detect) -------------------

@pytest.mark.parametrize("cfar", [FULL, QUICK], ids=["full", "quick"])
@pytest.mark.parametrize("so", [0, 6], ids=["auto", "override"])
def test_detect_integer_bit_exact(cfar, so):
    m = _int_map(seed=11)
    # Low-entropy values force heavy ties — the regime where a non-exact
    # counting equivalence would diverge from the explicit order statistic.
    m[:64] = (m[:64] // 8192) * 8192
    d1, _, s1 = C.cfar_2d(m, so, cfar=cfar, integer=True)
    d2, s2 = cfar_2d_pallas_detect(m, so, cfar=cfar, integer=True,
                                   interpret=True)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_detect_float_bit_exact():
    rng = np.random.default_rng(7)
    m = (rng.random((256, 128)) * 1e8).astype(np.float32)
    m[40, 40] = 9e8
    m[200:208] = np.float32(3e7)  # tie block
    d1, _, s1 = C.cfar_2d(m, 0, cfar=FULL, integer=False)
    d2, s2 = cfar_2d_pallas_detect(m, 0, cfar=FULL, integer=False,
                                   interpret=True)
    # Exact (not just decision-level) parity: scaled-count equivalence is
    # bit-exact against the XLA order-statistic path, float mode included.
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(s1).astype(np.float32), np.asarray(s2))


def test_detect_float_qmin_fuzz():
    # Candidate lemma behind the kernel's float fast path: the smallest q
    # with RN(q*s) >= cut is within 2 ulps below RN(cut/s).  Brute-force the
    # per-ref-multiply ground truth on engineered boundary values.
    rng = np.random.default_rng(0)
    n = 200_000
    for scale in (2.0, 4.0, 6.0):
        s = np.float32(scale)
        cut = (rng.random(n, dtype=np.float32) * np.float32(1e6)
               + np.float32(1.0))
        t0 = (cut / s).astype(np.float32)
        ti = t0.view(np.int32)
        v = (ti + rng.integers(-3, 4, n).astype(np.int32)).view(np.float32)
        lhs = (v * s) >= cut
        q = (ti + 1).view(np.float32)
        for delta in (0, -1, -2):
            c = (ti + delta).view(np.float32)
            q = np.where((c * s) >= cut, c, q)
        assert np.array_equal(lhs, v >= q), f"scale={scale}"


def test_detect_float_boundary_map():
    # Map whose cells sit exactly on CUT/scale rounding boundaries of their
    # neighbors: values are bit-neighbors of each other scaled by 4/6.
    rng = np.random.default_rng(23)
    base = np.float32(3e7)
    steps = rng.integers(-2, 3, (256, 128)).astype(np.int32)
    m = (base.view(np.int32) + steps).view(np.float32).astype(np.float32)
    m[10, 10] = np.float32(4.0) * base  # exact 4x of a training neighbor
    m[60, 60] = np.float32(6.0) * base
    d1, _, s1 = C.cfar_2d(m, 0, cfar=FULL, integer=False)
    d2, s2 = cfar_2d_pallas_detect(m, 0, cfar=FULL, integer=False,
                                   interpret=True)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(s1).astype(np.float32), np.asarray(s2))


def test_detect_integer_wide_values_exact():
    # Maps wider than 24 bits must take the multiply fallback (the one-
    # division ceiling is only exact below 2^24): regression for the
    # constructible cut=16777224/scale=6/ref=2796204 counterexample.
    rng = np.random.default_rng(31)
    m = rng.integers(0, 1 << 27, (128, 128)).astype(np.int32)
    m[10, 10] = 16777224
    m[64:70, 64:70] = 2796204 * 6 + 1
    d1, _, s1 = C.cfar_2d(m, 0, cfar=QUICK, integer=True)
    d2, s2 = cfar_2d_pallas_detect(m, 0, cfar=QUICK, integer=True,
                                   interpret=True, int_bits=27)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_detect_prepadded_matches():
    m = _int_map((128, 64), seed=13)
    hr = QUICK.halo_range
    mp = np.pad(m, ((hr, hr), (0, 0)), mode="wrap")
    d1, _ = cfar_2d_pallas_detect(m, 0, cfar=QUICK, integer=True,
                                  interpret=True)
    d2, _ = cfar_2d_pallas_detect(mp, 0, cfar=QUICK, integer=True,
                                  prepadded_range=True, interpret=True)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))


def test_auto_dispatch_detect_only():
    # need_debug=False + pallas => threshold None, det/scale exact.
    m = _int_map((128, 64), seed=17)
    d1, t1, s1 = C.cfar_2d_auto(m, 0, cfar=QUICK, integer=True, method="xla")
    d2, t2, s2 = C.cfar_2d_auto(m, 0, cfar=QUICK, integer=True,
                                method="pallas", need_debug=False)
    assert t2 is None and t1 is not None
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))

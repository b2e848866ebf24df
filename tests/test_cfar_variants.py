"""CFAR variant sweep tests (BASELINE config 4): CA/OS/GO/SO on the JAX path
plus the angle-bin extension (3D CFAR)."""

import numpy as np
import jax

from fmcw_tpu import CfarParams
from fmcw_tpu.golden import fixed_point as fx
from fmcw_tpu.ops import cfar as C

CF = CfarParams(ref_range=2, ref_doppler=2, guard_range=1, guard_doppler=1)


def _map(seed=0, shape=(64, 32)):
    rng = np.random.default_rng(seed)
    m = rng.integers(80, 121, shape).astype(np.int32)
    m[20, 10] += 4000
    m[45, 25] += 3000
    return m


def test_variants_match_golden():
    m = _map()
    for variant in ("os", "ca", "go", "so"):
        cf = CfarParams(ref_range=2, ref_doppler=2, guard_range=1,
                        guard_doppler=1, variant=variant)
        det_j, thr_j, _ = C.cfar_2d(m, 0, cfar=cf, integer=True)
        det_g, thr_g, _ = fx.os_cfar_2d(m.astype(np.int64), cf,
                                        return_debug=True)
        # Threshold maps (not just detections) must agree bit-for-bit.
        assert np.array_equal(np.asarray(thr_j), thr_g), variant
        assert np.array_equal(np.asarray(det_j), det_g), variant


def test_variants_match_golden_full_geometry():
    rng = np.random.default_rng(9)
    m = rng.integers(50, 2000, (128, 128)).astype(np.int32)
    m[64, 64] = 40000
    for variant in ("os", "ca", "go", "so"):
        cf = CfarParams(variant=variant)  # default 13x11 window
        det_j, thr_j, _ = C.cfar_2d(m, 0, cfar=cf, integer=True)
        det_g, thr_g, _ = fx.os_cfar_2d(m.astype(np.int64), cf,
                                        return_debug=True)
        assert np.array_equal(np.asarray(thr_j), thr_g), variant


def test_cfar_3d_independent_angles():
    cube = np.stack([_map(s) for s in range(4)])
    det, thr, sc = C.cfar_3d(cube, 0, cfar=CF, integer=True,
                             ref_angle=0, method="xla")
    # Per-angle results equal the 2D op applied per plane.
    for a in range(4):
        d2, _, _ = C.cfar_2d(cube[a], 0, cfar=CF, integer=True)
        assert np.array_equal(np.asarray(det)[a], np.asarray(d2))


def test_cfar_3d_angle_training():
    cube = np.stack([_map(s) for s in range(5)])
    det, thr, sc = C.cfar_3d(cube, 0, cfar=CF, integer=True,
                             ref_angle=1, guard_angle=0)
    det = np.asarray(det)
    # Targets present in every plane are local peaks in 3D too.
    assert all(det[a, 20, 10] > 0 for a in range(5))
    # Enlarged training set: n_ref grows by the extra angle planes -> the
    # threshold map differs from the per-angle case somewhere.
    det0, thr0, _ = C.cfar_3d(cube, 0, cfar=CF, integer=True, ref_angle=0,
                              method="xla")
    assert not np.array_equal(np.asarray(thr), np.asarray(thr0))


def test_cfar_3d_scale_override():
    cube = np.stack([_map(s) for s in range(3)])
    _, _, sc = C.cfar_3d(cube, 7, cfar=CF, integer=True, ref_angle=1)
    assert np.all(np.asarray(sc) == 7)

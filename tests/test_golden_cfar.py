"""2D CFAR golden-model tests.

Mirrors rtl/src/tb_os_cfar_2d.vhd:50-212: a 64x32 synthetic map with
deterministic noise and two targets with 3x3 mainlobes; detection count,
false-alarm bound on noise-only input, scale override.  Plus variant (CA/GO/
SO), peak-grouping, and geometry checks.
"""

import numpy as np

from fmcw_tpu import CfarParams
from fmcw_tpu.golden import fixed_point as fx

R, D = 64, 32
CFAR = CfarParams(ref_range=2, ref_doppler=2, guard_range=1, guard_doppler=1)


def synthetic_map(with_targets=True, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.integers(80, 121, size=(R, D)).astype(np.int64)
    if with_targets:
        for (tr, td, amp) in [(20, 10, 4000), (45, 25, 3000)]:
            m[tr - 1: tr + 2, td - 1: td + 2] += amp // 4
            m[tr, td] += amp
    return m


def test_geometry_counts():
    # Default full-size params: 13x11 window, 128 training cells, rank 96
    # (os_cfar_2d.vhd:41-47,181-182).
    c = CfarParams()
    assert c.win_range == 13 and c.win_doppler == 11
    assert c.n_ref == 128 and c.rank_idx == 96
    offs = fx._window_offsets(c)
    assert len(set(offs)) == 128
    assert (0, 0) not in offs
    for dr, dd in offs:
        assert not (abs(dr) <= 2 and abs(dd) <= 1)


def test_targets_detected():
    det = fx.os_cfar_2d(synthetic_map(), CFAR)
    assert det[20, 10] > 0 and det[45, 25] > 0


def test_noise_only_false_alarm_bound():
    # tb_os_cfar_2d.vhd:131-155 allows <=3 false alarms on the noise map.
    det = fx.os_cfar_2d(synthetic_map(with_targets=False), CFAR)
    assert np.count_nonzero(det) <= 3


def test_scale_override():
    m = synthetic_map()
    det_hi, thr_hi, sc_hi = fx.os_cfar_2d(m, CFAR, scale_override=7,
                                          return_debug=True)
    det_lo, thr_lo, sc_lo = fx.os_cfar_2d(m, CFAR, scale_override=1,
                                          return_debug=True)
    assert np.all(sc_hi == 7) and np.all(sc_lo == 1)
    # Scale 1 threshold = ranked value: the uniform-ish noise map fires a lot.
    assert np.count_nonzero(det_lo) > np.count_nonzero(det_hi)
    assert np.all(thr_hi == 7 * thr_lo)


def test_adaptive_scale_regimes():
    # Uniform map -> ranked ~ mean -> nominal scale.
    m = np.full((R, D), 100, dtype=np.int64)
    _, _, sc = fx.os_cfar_2d(m, CFAR, return_debug=True)
    assert np.all(sc == CFAR.scale_nom)
    # Heavy-tailed clutter: most refs tiny, a few huge -> ranked > 1.5*mean
    # only when the high cells cross the rank position; craft directly:
    est = np.array([400]); mean = np.array([100])
    assert fx.cfar_scale(est, mean, CFAR)[0] == CFAR.scale_max
    est = np.array([40])
    assert fx.cfar_scale(est, mean, CFAR)[0] == CFAR.scale_min
    est = np.array([120])
    assert fx.cfar_scale(est, mean, CFAR)[0] == CFAR.scale_nom


def test_variants_detect_isolated_target():
    m = synthetic_map()
    for variant in ("ca", "go", "so"):
        det = fx.os_cfar_2d(m, CfarParams(ref_range=2, ref_doppler=2,
                                          guard_range=1, guard_doppler=1,
                                          variant=variant))
        assert det[20, 10] > 0, variant


def test_os_masks_close_targets_less_than_ca():
    # Two close targets: OS-CFAR's rank statistic tolerates interferers in the
    # training window better than cell averaging (the classic OS advantage,
    # cf. rtl/src/tb_os_cfar.vhd two-close-targets case).
    m = np.full((R, D), 100, dtype=np.int64)
    m[30, 10] = 5000
    m[30, 14] = 5000  # inside each other's training window, outside guards
    os_det = fx.os_cfar_2d(m, CFAR)
    ca_det = fx.os_cfar_2d(m, CfarParams(ref_range=2, ref_doppler=2,
                                         guard_range=1, guard_doppler=1,
                                         variant="ca"))
    assert os_det[30, 10] > 0 and os_det[30, 14] > 0
    assert np.count_nonzero(os_det) >= np.count_nonzero(ca_det)


def test_edge_modes_agree_interior():
    m = synthetic_map()
    wrap = fx.os_cfar_2d(m, CFAR)
    refl = fx.os_cfar_2d(m, CfarParams(ref_range=2, ref_doppler=2,
                                       guard_range=1, guard_doppler=1,
                                       edge_mode="reflect"))
    h = 4  # halo width: interior cells see identical windows
    assert np.array_equal(wrap[h:-h, h:-h], refl[h:-h, h:-h])


def test_peak_group_collapses_clusters():
    det = fx.os_cfar_2d(synthetic_map(), CFAR)
    grouped = fx.peak_group(det, radius=2)
    n = np.count_nonzero(grouped)
    assert 2 <= n <= np.count_nonzero(det)
    assert grouped[20, 10] > 0 and grouped[45, 25] > 0
    # Plateau tie-break keeps exactly one cell.
    plateau = np.zeros((16, 16), dtype=np.int64)
    plateau[5:8, 5:8] = 100
    g = fx.peak_group(plateau, radius=2)
    assert np.count_nonzero(g) == 1


def test_extract_detections_stream_order():
    det = np.zeros((8, 4), dtype=np.int64)
    det[3, 2] = 5
    det[1, 0] = 7
    det[1, 3] = 9
    r, d, m = fx.extract_detections(det)
    assert list(zip(r, d, m)) == [(1, 0, 7), (1, 3, 9), (3, 2, 5)]

"""MTI notch and magnitude golden-model tests.

Mirrors rtl/src/tb_doppler_notch.vhd:114-184 (DC rejection, passband tone,
bypass, 3-pulse, per-row delay-line reset) and rtl/src/tb_magnitude_calc.vhd
(directed vectors vs reference model, <4% error bound).
"""

import numpy as np

from fmcw_tpu.golden import fixed_point as fx


def test_notch_rejects_dc():
    x = np.full((4, 128), 5000)
    yi, yq = fx.mti_notch(x, x, axis=1, mode=2)
    # Steady DC is fully cancelled (transient chirp zeroed by default).
    assert np.all(yi == 0) and np.all(yq == 0)


def test_notch_passthrough_transient_matches_reference():
    x = np.full((1, 8), 1000)
    yi, _ = fx.mti_notch(x, x, axis=1, mode=2, transient="passthrough")
    # First chirp passes unsubtracted (doppler_notch.vhd:99-102).
    assert yi[0, 0] == 1000 and np.all(yi[0, 1:] == 0)


def test_notch_passes_fast_target():
    # Nyquist-rate alternation (max Doppler) is amplified by ~2x, saturating.
    c = np.arange(128)
    x = (10000 * np.cos(np.pi * c)).astype(np.int64)[None, :]
    yi, _ = fx.mti_notch(x, np.zeros_like(x), axis=1, mode=2)
    out_power = np.mean(yi[0, 2:].astype(np.float64) ** 2)
    in_power = np.mean(x[0, 2:].astype(np.float64) ** 2)
    assert out_power > 2.0 * in_power


def test_notch_saturates():
    x = np.array([[32767, -32768, 32767]])
    yi, _ = fx.mti_notch(x, np.zeros_like(x), axis=1, mode=2,
                         transient="passthrough")
    assert yi[0, 1] == -32768 and yi[0, 2] == 32767


def test_notch_3pulse():
    x = np.full((2, 64), 7000)
    yi, _ = fx.mti_notch(x, x, axis=1, mode=3)
    assert np.all(yi == 0)
    # Linear ramp is also cancelled by the 3-pulse (second-difference) filter.
    ramp = (np.arange(64) * 100)[None, :]
    yr, _ = fx.mti_notch(ramp, np.zeros_like(ramp), axis=1, mode=3)
    assert np.all(yr[:, 2:] == 0)


def test_notch_bypass():
    rng = np.random.default_rng(3)
    x = rng.integers(-1000, 1000, (4, 32))
    yi, yq = fx.mti_notch(x, x, axis=1, mode=2, bypass=True)
    assert np.array_equal(yi, x) and np.array_equal(yq, x)


def test_notch_rows_independent():
    # Delay line resets per range bin (per row): row boundaries don't leak.
    x = np.zeros((2, 16), dtype=np.int64)
    x[0, :] = 9999  # row 0 all DC
    yi, _ = fx.mti_notch(x, np.zeros_like(x), axis=1, mode=2,
                         transient="passthrough")
    assert np.all(yi[1] == 0)  # row 1 sees no residue of row 0
    assert yi[0, 0] == 9999


# --- magnitude ---

DIRECTED = [
    (0, 0), (1, 0), (0, 1), (3, 4), (4, 3), (-3, -4), (100, 0), (0, -100),
    (1000, 1000), (-32768, 0), (0, -32768), (-32768, -32768), (32767, 32767),
    (30000, -12345), (5, 12), (-7, 24), (16384, 16384),
]


def test_magnitude_formula_exact():
    for i, q in DIRECTED:
        ai, aq = abs(i), abs(q)
        mx, mn = max(ai, aq), min(ai, aq)
        expected = mx + (mn >> 2) + (mn >> 3)
        got = fx.magnitude(np.array([i]), np.array([q]))[0]
        assert got == expected, (i, q)


def test_magnitude_error_bound():
    # alpha-max-beta-min with (alpha=1, beta=0.375): worst-case analog error is
    # -2.8% (45 deg) / +6.8% (atan 0.375 midpoint).  The reference's "<4%"
    # comment (magnitude_calc.vhd:5-6) describes only the underestimate side.
    rng = np.random.default_rng(7)
    i = rng.integers(-32768, 32768, 100000)
    q = rng.integers(-32768, 32768, 100000)
    got = fx.magnitude(i, q).astype(np.float64)
    true = np.hypot(i.astype(np.float64), q.astype(np.float64))
    big = true > 1000
    rel = (got[big] - true[big]) / true[big]
    assert rel.max() < 0.069 and rel.min() > -0.04


def test_magnitude_abs_int16_min():
    # |−32768| = +32768 via two's-complement wrap (magnitude_calc.vhd:57-58).
    assert fx.magnitude(np.array([-32768]), np.array([0]))[0] == 32768
    assert fx.magnitude(np.array([-32768]), np.array([-32768]))[0] == 32768 + 8192 + 4096

"""Window multiplier golden-model tests.

Mirrors the reference unit testbench rtl/src/tb_window_multiplier.vhd:78-150:
DC input -> Hamming shape, zero input, full-scale saturation, impulse,
symmetry within 1 LSB — plus bit-level checks of the ROM and rounding modes.
"""

import numpy as np
import pytest

from fmcw_tpu.golden import fixed_point as fx


N = 1024


def test_rom_matches_float_window():
    rom = fx.hamming_rom(N)
    i = np.arange(N // 2)
    ideal = (0.54 - 0.46 * np.cos(2 * np.pi * i / (N - 1))) * 32767
    assert np.max(np.abs(rom - ideal)) <= 1.0
    assert rom.min() >= 0 and rom.max() <= 32767


def test_coeff_symmetry_within_1_lsb():
    # tb_window_multiplier.vhd symmetry test: coef[i] vs coef[N-1-i].
    c = fx.hamming_coeffs(N)
    assert np.max(np.abs(c - c[::-1])) <= 1


def test_dc_input_traces_window_shape():
    # DC (constant 16384) input: output follows the window shape scaled by
    # the Q14 extraction (gain coef/2^14).
    c = fx.hamming_coeffs(N)
    x = np.full(N, 16384)
    i_out, _, sat = fx.window_apply(x, np.zeros(N), c, rounding="unbiased")
    expected = np.floor(16384 * c / 16384 + 0.5)
    assert np.array_equal(i_out, expected)
    assert not sat.any()


def test_zero_input():
    c = fx.hamming_coeffs(N)
    z = np.zeros(N)
    i_u, q_u, _ = fx.window_apply(z, z, c, rounding="unbiased")
    assert np.array_equal(i_u, z)
    # Reference-exact biased rounding maps 0 -> 1 wherever coef > 0
    # (window_multiplier.vhd:146-149; the hardware's +0.5 LSB bias).
    i_b, _, _ = fx.window_apply(z, z, c, rounding="biased")
    assert np.array_equal(i_b, np.ones(N))


def test_full_scale_saturates_at_center():
    # Effective gain ~2 at window center: +32767 input must saturate there
    # (tb_window_multiplier.vhd full-scale test).
    c = fx.hamming_coeffs(N)
    x = np.full(N, 32767)
    i_out, _, sat = fx.window_apply(x, x, c)
    assert i_out[N // 2] == 32767
    assert sat.any()
    # Negative full scale clamps at INT16_MIN.
    i_neg, _, sat_n = fx.window_apply(np.full(N, -32768), x, c)
    assert i_neg[N // 2] == -32768
    assert sat_n.any()


def test_impulse_passthrough_scaled():
    c = fx.hamming_coeffs(N)
    x = np.zeros(N)
    x[N // 2] = 1000
    i_out, _, _ = fx.window_apply(x, np.zeros(N), c, rounding="unbiased")
    expected = np.floor(1000 * c[N // 2] / 16384 + 0.5)
    assert i_out[N // 2] == expected
    assert np.count_nonzero(i_out) == 1


@pytest.mark.parametrize("n", [128, 1024])
def test_windowed_output_symmetry(n):
    # Symmetric input through a symmetric window stays symmetric within 1 LSB.
    c = fx.hamming_coeffs(n)
    x = np.full(n, 12345)
    i_out, _, _ = fx.window_apply(x, x, c)
    assert np.max(np.abs(i_out - i_out[::-1])) <= 1


def test_biased_vs_unbiased_differ_by_at_most_one():
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, size=4096)
    c = fx.hamming_coeffs(1024)
    b, _, _ = fx.window_apply(x.reshape(4, 1024), np.zeros((4, 1024)), c[None, :])
    u, _, _ = fx.window_apply(x.reshape(4, 1024), np.zeros((4, 1024)), c[None, :],
                              rounding="unbiased")
    d = b - u
    assert d.min() >= 0 and d.max() <= 1

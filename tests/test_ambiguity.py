"""Staggered-PRF velocity unfolding (utils/ambiguity.py).

Bins are generated with the scenario's exact reference bin mapping
(models/scenario._vel_to_doppler_bin == tb_tactical.vhd:164-171), so the
resolver is tested against the same quantization the pipeline produces.
"""

import numpy as np
import pytest

from fmcw_tpu.models import scenario as sc
from fmcw_tpu.utils import ambiguity as amb

CFG = sc.ScenarioConfig()
PRFS = CFG.prf_hz          # (8000, 9000, 10000) -> v_amb 400/450/500 m/s
ND = 128
QUANT = max(PRFS) * CFG.wavelength / 2.0 / ND   # ~3.9 m/s per bin


@pytest.mark.parametrize("v_true", [0.0, 120.0, -340.0, 455.0, -700.0,
                                    1050.0])
def test_unfold_recovers_beyond_single_prf_ambiguity(v_true):
    bins = [sc._vel_to_doppler_bin(v_true, p, CFG, ND) for p in PRFS]
    v_hat, res = amb.unfold_velocity(bins, PRFS, ND,
                                     wavelength=CFG.wavelength)
    assert abs(v_hat - v_true) <= 2 * QUANT, (v_true, v_hat)
    assert res <= 2 * QUANT
    # The single-PRF (visualizer) conversion aliases for |v| > v_amb/2:
    if abs(v_true) > PRFS[0] * CFG.wavelength / 4.0:
        v_single = amb.apparent_velocity(bins[0], ND, PRFS[0],
                                         CFG.wavelength)
        assert abs(v_single - v_true) > 10 * QUANT


def test_unfold_two_prfs_and_misassociation_flag():
    v_true = 455.0
    bins = [sc._vel_to_doppler_bin(v_true, p, CFG, ND) for p in PRFS[:2]]
    v_hat, res = amb.unfold_velocity(bins, PRFS[:2], ND,
                                     wavelength=CFG.wavelength)
    assert abs(v_hat - v_true) <= 2 * QUANT
    # Mis-association detection needs >= 3 PRFs (two congruences almost
    # always admit SOME consistent velocity in range; three over-determine
    # it): corrupting one of three bins leaves a large residual — the
    # caller's cue to reject the pairing.
    bins3 = [sc._vel_to_doppler_bin(v_true, p, CFG, ND) for p in PRFS]
    bad = [bins3[0], (bins3[1] + 37) % ND, bins3[2]]
    _, res_bad = amb.unfold_velocity(bad, PRFS, ND,
                                     wavelength=CFG.wavelength)
    assert res_bad > 10 * QUANT


def test_validation():
    with pytest.raises(ValueError):
        amb.unfold_velocity([5], [8000.0], ND)

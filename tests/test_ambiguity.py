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


def test_resolve_track_velocities_from_history():
    """viz.resolve_track_velocities: synthetic track whose per-scan bins
    follow the scenario's PRF stagger recovers the unambiguous velocity."""
    from fmcw_tpu.utils import viz

    v_true = -520.0          # aliases at every single PRF
    scans = list(range(6))   # two full stagger cycles
    bins = [sc._vel_to_doppler_bin(v_true, PRFS[s % 3], CFG, ND)
            for s in scans]
    t = viz.TrackHistory(scans=scans, range_q2=[400 * 4] * 6,
                         dopp_q2=[b * 4 for b in bins],
                         vel_r=[0] * 6, quality=[10] * 6, status=[2] * 6)
    out = viz.resolve_track_velocities({3: t}, ND, prfs=PRFS,
                                       wavelength=CFG.wavelength)
    v_hat, res = out[3]
    assert abs(v_hat - v_true) <= 2 * QUANT, (v_hat, res)
    # a single-scan track yields nothing
    t1 = viz.TrackHistory([0], [0], [bins[0] * 4], [0], [5], [1])
    assert viz.resolve_track_velocities({0: t1}, ND, prfs=PRFS) == {}

"""Notch-maneuver survival analysis (utils/viz.notch_analysis) — the
headline analysis of the reference's tactical demo
(model/visualize_radar_targets.py:324-366: fighters zero their radial
velocity at the notch scan, fall into the MTI notch for 3 scans, and the
question is how many tracks coast through vs drop).

Two layers: exact semantics on synthetic track histories, and a pinned
seeded quick-scenario run through the full pipeline + TWS tracker (the
integration the tactical demo performs, deterministic at seed 42).
"""

import os
import tempfile

import numpy as np
import pytest

import fmcw_tpu
from fmcw_tpu.utils import viz


def _hist(scans):
    return viz.TrackHistory(list(scans), [], [], [], [], [])


def test_notch_analysis_semantics():
    """survived = track seen before the notch AND at/after notch+3 (it
    outlived the 3-scan notch window, by detection or coast); lost = seen
    before but never again from notch+3 on; tracks born inside/after the
    window don't count either way."""
    notch = 6
    tracks = {
        0: _hist([1, 2, 3, 4, 5, 9, 10]),    # coasts through -> survived
        1: _hist([2, 3, 4, 5]),              # gone before notch+3 -> lost
        2: _hist(range(1, 12)),              # tracked throughout -> survived
        3: _hist([7, 8]),                    # born inside window -> neither
        4: _hist([10, 11]),                  # born after window -> neither
        5: _hist([5, 9]),                    # last pre-notch scan, returns
    }
    counts = [2, 3, 3, 3, 3, 3, 2, 2, 2, 3, 3, 3]
    info = viz.notch_analysis(tracks, counts, notch)
    assert info["tracks_survived"] == 3      # 0, 2, 5
    assert info["tracks_lost"] == 1          # 1
    assert info["active_before_notch"] == counts[notch - 2]
    assert info["min_active_during_notch"] == min(counts[notch:notch + 3])


@pytest.mark.slow
def test_quick_scenario_notch_survival_pinned():
    """Seeded (42) 12-scan quick scenario, point targets, no sea clutter:
    the fighters notch at scan 6 and resume at 9; the TWS coast logic must
    carry every pre-notch track through the window (tracks_lost == 0, the
    survival story of ADR_tb_tactical.vhd:62-131), with the active count
    dipping during the notch.  Values pinned like the golden data — the
    deterministic fixed-point chain makes them exact."""
    import jax
    from fmcw_tpu.models import pipeline as pl, tracker as jt, scenario as sc
    from fmcw_tpu.utils import io as rio

    q = fmcw_tpu.quick()
    q = q.replace(cfar=fmcw_tpu.CfarParams(ref_range=4, ref_doppler=3,
                                           guard_range=2, guard_doppler=1))
    cfg = sc.quick_scenario()
    cfg.num_scans = 12
    cfg.sea_clutter = 0.0          # target-only tracks: the notch is visible
    cfg.burst_synthesis = False    # point targets detect every scan
    scen = sc.TacticalScenario(q, cfg)
    proc = pl.make_processor(q, mode="fixed", peak_group_radius=2)
    state = jt.init_state(q.tracker)
    trk = os.path.join(tempfile.mkdtemp(), "tac_tracks.txt")
    open(trk, "w").close()
    for scan, frame, truth in scen.run():
        out = jax.tree.map(np.asarray, proc(pl.complex_to_iq(frame)))
        state, rep = jt.step(state, out["range_bin"], out["doppler_bin"],
                             out["mag"].astype(np.int32), out["valid"],
                             tp=q.tracker)
        rep = jax.tree.map(np.asarray, rep)
        ids = np.nonzero(rep["report_mask"])[0]
        rio.write_tracks(trk, [
            {"id": i, "range_pos": rep["range_pos"][i],
             "dopp_pos": rep["dopp_pos"][i],
             "range_vel": rep["range_vel"][i],
             "quality": rep["quality"][i], "status": rep["status"][i]}
            for i in ids], active_count=int(rep["active_tracks"]),
            append=True)
    tracks, counts = viz.load_tracks(trk)
    assert counts == [8, 9, 11, 11, 11, 11, 10, 9, 9, 10, 10, 11]
    info = viz.notch_analysis(tracks, counts, cfg.notch_scan)
    assert info == {"tracks_survived": 5, "tracks_lost": 0,
                    "active_before_notch": 11,
                    "min_active_during_notch": 9}
    # The notch really bit: the active count dips inside the window and
    # recovers after it, and nothing established before the notch was lost.
    assert min(counts[6:9]) < counts[4]
    assert counts[-1] >= counts[4]


def test_tracker_register_unwrap_roundtrip():
    """The reference's Q2 track registers are signed 12/9-bit
    (tws_tracker.vhd:52-53): on the full 1024x128 map, range bins >= 512
    and Doppler bins >= 64 log NEGATIVE values.  The analysis-layer
    unwrap recovers every on-map bin exactly (one-to-one for n_range <=
    1024 / n_doppler <= 128)."""
    def wrap(v, bits):
        m = 1 << bits
        return ((np.asarray(v) + (m >> 1)) % m) - (m >> 1)

    rq2 = np.arange(1024) * 4 + 3               # every range bin, Q2 + frac
    wrapped = wrap(rq2, 12)
    assert wrapped.min() < 0                    # the hardware really wraps
    assert np.array_equal(viz.unwrap_range_q2(wrapped, 1024), rq2)
    dq2 = np.arange(128) * 4 + 1
    wd = wrap(dq2, 9)
    assert wd.min() < 0
    assert np.array_equal(viz.unwrap_dopp_q2(wd, 128), dq2)
    # Small maps never wrap; unwrap is the identity there.
    assert np.array_equal(viz.unwrap_range_q2(np.arange(128) * 4, 128),
                          np.arange(128) * 4)

"""Parity against the reference's own checked-in artifacts.

Two artifact families close the loop to outputs the reference actually
produced (VERDICT r2 items 1-2):

* ``data/radar_output.txt`` — the full 1024x128 magnitude map of the golden
  two-target frame (rtl/old/tb_radar_core.vhd:173-208).  This map is
  EXACTLY the stream the consolidated core's CFAR consumes, so feeding it
  to the hw-compat streaming CFAR reproduces bit-for-bit what the
  rtl/src hardware would emit for frame 0 — a true bit-level parity test
  against reference-produced data.

* ``vivado_proj/.../xsim/ADR_quick_det.txt`` / ``ADR_quick_trk.txt`` — the
  quick-scenario expected-behavior artifacts (873 detections, track ramp).
  Their stimulus is regenerated bit-exactly (golden/adr_quick.py — IEEE
  1076.2 UNIFORM, seeds 42/42), but the chain that consumed it was the
  *old* ADR core driving Xilinx xfft IP with an all-zeros config word =
  INVERSE transforms, no stage scaling (ADR_radar_core.vhd:290's
  "0=forward" comment has the XFFT polarity backwards) plus the pre-fix
  ADR_os_cfar_2d.  Detection comparisons are therefore CLUSTER-level in
  true-Doppler space, mapping artifact labels back through the two
  documented as-built effects:

      d_true = (N_DOPPLER - (label + 3)) mod N_DOPPLER = (29 - label) % 32

  (-3 = the streaming-CFAR label offset, N-x = the inverse-FFT mirror).
  Under this mapping the artifact's three cluster centroids land exactly
  on the synthesized truth bins (fighters 26 -> label 3, attacker 2 ->
  label 27, notched fighters 16 -> label 13), which these tests pin.
"""

import collections

import numpy as np
import pytest

from fmcw_tpu import params as P
from fmcw_tpu.golden import adr_quick, fixed_point as fx, reference
from fmcw_tpu.golden import tracker as TRK
from fmcw_tpu.utils import io


# ---------------------------------------------------------------------------
# Golden map: bit-level hw-compat CFAR on reference-produced data
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def golden_map():
    return io.golden_output_map()


def _true_cells(lr, ld, R, D):
    flat = (lr * D + ld + 3) % (R * D)
    return flat // D, flat % D


def test_golden_map_hw_detections(golden_map):
    """What the as-built hardware emits for the golden frame: every
    detection's TRUE cell sits in the two target range clusters (99-101 /
    499-501 — the documented straddle peaks of BASELINE.md), the strongest
    is the map's documented maximum 43717, and labels carry the -3 offset."""
    p = P.full()
    lr, ld, lm = fx.os_cfar_2d_hw_stream(golden_map, p.cfar)
    assert len(lr) > 100
    tr, td = _true_cells(lr, ld, 1024, 128)
    # every detection within the two targets' range neighborhoods; >= 90%
    # on the straddle-peak rows themselves (stray 1-2-count cells are range
    # sidelobes of the burst synthesis)
    assert np.all((np.abs(tr.astype(int) - 100) <= 7)
                  | (np.abs(tr.astype(int) - 500) <= 7))
    core = np.isin(tr, (99, 100, 101, 499, 500, 501))
    assert core.mean() >= 0.9
    top = np.argmax(lm)
    assert lm[top] == 43717 == golden_map.max()
    assert golden_map[tr[top], td[top]] == 43717
    # the label offset on the strongest detection: label = true - 3 flat
    assert (lr[top] * 128 + ld[top]) == (tr[top] * 128 + td[top] - 3)


def test_golden_map_hw_xla_matches_golden(golden_map):
    """The XLA hw-stream op reproduces the golden model bit-for-bit on the
    reference's own map."""
    from fmcw_tpu.ops import cfar as C
    p = P.full()
    det_map, _, _ = C.cfar_2d_hw_stream(golden_map.astype(np.int32), 0,
                                        cfar=p.cfar, integer=True)
    m = np.asarray(det_map)
    got_r, got_d = np.nonzero(m)
    lr, ld, lm = fx.os_cfar_2d_hw_stream(golden_map, p.cfar)
    assert sorted(zip(got_r.tolist(), got_d.tolist(),
                      m[got_r, got_d].tolist())) == \
        sorted(zip(lr.tolist(), ld.tolist(), lm.tolist()))


def test_golden_map_hw_vs_named_geometry(golden_map):
    """The crossed as-built geometry and the framework's named-axis default
    agree on the golden frame's detection clusters (>= 90% common true
    cells) — the geometry difference only moves margin cells."""
    p = P.full()
    lr, ld, _ = fx.os_cfar_2d_hw_stream(golden_map, p.cfar)
    tr, td = _true_cells(lr, ld, 1024, 128)
    nr, nd, _ = fx.extract_detections(fx.os_cfar_2d(golden_map, p.cfar))
    hw = set(zip(tr.tolist(), td.tolist()))
    named = set(zip(nr.tolist(), nd.tolist()))
    assert len(hw & named) >= 0.9 * max(len(hw), len(named))


# ---------------------------------------------------------------------------
# Quick scenario: stimulus reproduction + cluster-level artifact parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def quick_run():
    """Faithful-configuration run: exact stimulus -> fixed chain (biased
    rounding, passthrough transient) -> hw-compat streaming CFAR over the
    5-frame stream."""
    frames, truths = adr_quick.quick_frames()
    p = P.quick()
    mags = np.stack([
        reference.process_frame_fixed(frames[k], p, window_rounding="biased",
                                      mti_transient="passthrough")[0]
        for k in range(adr_quick.NUM_SCANS)])
    dbg = fx.os_cfar_2d_hw_stream(mags, p.cfar, return_debug=True)
    det = dbg["det"]
    cells = dbg["cells"][det]
    labels = dbg["labels"][det]
    return {
        "frames": frames, "truths": truths, "mags": mags, "p": p,
        "cells": cells, "lr": labels // 32, "ld": labels % 32,
        "lm": dbg["mag"][det], "frame_of": cells // (128 * 32),
    }


def test_quick_stimulus_truth_bins():
    """The regenerated scenario places the targets where the artifact's
    geometry implies: fighters at range 85/87 Doppler 26 (16 during the
    scan-3 notch), attacker at range 74-75 Doppler 2."""
    _, truths = adr_quick.quick_frames()
    assert [t[:2] for t in [truths[0][0], truths[0][1], truths[0][2]]] == \
        [(85, 26), (87, 26), (75, 2)]
    assert [(rb, db) for rb, db, _ in truths[2]] == \
        [(85, 16), (87, 16), (74, 2)]
    assert truths[4][2][:2] == (74, 2)


def test_quick_stimulus_is_int16_deterministic():
    frames, _ = adr_quick.quick_frames()
    assert np.all(np.abs(frames.real) <= 32000)
    assert np.all(np.abs(frames.imag) <= 32000)
    assert np.array_equal(frames.real, np.round(frames.real))
    # pin a few cells so an RNG regression is caught loudly
    f0 = frames[0]
    again, _ = adr_quick.quick_frames()
    assert np.array_equal(f0, again[0])


def test_artifact_clusters_land_on_truth_after_unmapping():
    """The checked-in 873 detections, unmapped through the -3 label offset
    and the inverse-FFT mirror, cluster exactly on the synthesized truth
    Doppler bins — the quantitative closure of the as-built label/geometry
    analysis."""
    art = adr_quick.load_artifact_detections()
    assert len(art) == 873
    labels = art[:, 1]
    hist = collections.Counter(labels.tolist())

    def mass(center, radius):
        return sum(hist.get((center + o) % 32, 0)
                   for o in range(-radius, radius + 1))

    def centroid(center, radius=1):
        num = den = 0
        for o in range(-radius, radius + 1):
            c = hist.get((center + o) % 32, 0)
            num += (center + o) * c
            den += c
        return num / den

    # predicted label centers: fighters (d=26) -> 3, attacker (d=2) -> 27,
    # notched fighters (d=16) -> 13
    assert mass(3, 1) + mass(27, 1) + mass(13, 1) >= 0.75 * len(art)
    assert mass(3, 2) + mass(27, 2) + mass(13, 2) >= 0.85 * len(art)
    assert abs(centroid(3) - 3) <= 0.5
    assert abs(centroid(27) - 27) <= 0.5
    assert mass(13, 1) >= 10            # notch-scan cluster present


def test_quick_detection_cluster_parity(quick_run):
    """Our faithful run and the artifact agree at cluster level in TRUE
    Doppler space: both concentrate on the attacker ridge (d=2), the
    fighter ridge (d=26) and the notch-scan ridge (d=16)."""
    q = quick_run
    ours_true = (q["ld"] + 3) % 32
    art = adr_quick.load_artifact_detections()
    art_true = (29 - art[:, 1]) % 32

    def frac_near(vals, centers, radius=1):
        ok = np.zeros(len(vals), dtype=bool)
        for c in centers:
            d = np.abs(((vals - c + 16) % 32) - 16)
            ok |= d <= radius
        return ok.mean()

    centers = (2, 26, 16)
    assert frac_near(ours_true, centers) >= 0.8
    assert frac_near(art_true, centers) >= 0.75
    # every cluster is populated in both sets
    for c in centers:
        assert np.sum(np.abs(((ours_true - c + 16) % 32) - 16) <= 1) >= 2
        assert np.sum(np.abs(((art_true - c + 16) % 32) - 16) <= 1) >= 10
    # detections exist in every scan of ours
    assert set(q["frame_of"].tolist()) == set(range(5))
    # overall count within an order of magnitude sanity band (the old
    # core's unscaled-inverse-FFT wraparound smears far more energy across
    # the ridge than the defined BFP semantics — documented, not hidden)
    assert 10 <= len(ours_true) <= 300


def test_quick_track_ramp_shape(quick_run):
    """Track-level shape parity (the artifact's tracker ran row-rate scans
    — ~43 per CPI — so only granularity-independent shape invariants are
    comparable):

    * confirmation delay: no FIRM/COAST report before INIT_HITS+1 scans in
      either (artifact: 6 SCAN_ENDs precede the first TRK line);
    * both ramp from start to a plateau >= 3 active tracks;
    * our firm tracks pin the fighter range cluster (85 +- 3) persistently.
    """
    q = quick_run
    tp = q["p"].tracker
    st = TRK.init_state(tp)
    actives, firm_ranges = [], []
    for k in range(5):
        m = q["frame_of"] == k
        order = np.argsort(q["cells"][m])
        st, rep = TRK.step(st, q["lr"][m][order], q["ld"][m][order],
                           q["lm"][m][order], tp)
        actives.append(rep["active_tracks"])
        firm_ranges.append(sorted((rep["range_pos"] // 4).tolist()))
    # confirmation delay: INIT_HITS=2 -> first firm report at scan 3
    assert firm_ranges[0] == [] and firm_ranges[1] == []
    assert len(firm_ranges[2]) >= 1
    # plateau
    assert max(actives) >= 3 and actives[-1] >= 3
    # a firm track stays on the fighter range cluster through scans 3-5
    for k in (2, 3, 4):
        assert any(82 <= r <= 90 for r in firm_ranges[k])

    # artifact side: 215 row-rate scans, first TRK after 6 SCAN_ENDs,
    # plateau >= 3, max 7
    counts = adr_quick.load_artifact_active_counts()
    assert len(counts) == 215
    assert counts.max() == 7
    assert (counts[:4] == 0).all() and counts[4] > 0
    assert np.mean(counts[4:50]) >= 3
    import os
    with open(os.path.join(adr_quick.ARTIFACT_DIR,
                           "ADR_quick_trk.txt")) as f:
        lines = [ln for ln in f]
    first_trk = next(i for i, ln in enumerate(lines) if ln.startswith("TRK"))
    assert sum(1 for ln in lines[:first_trk]
               if ln.startswith("SCAN_END")) == 6


# ---------------------------------------------------------------------------
# Exact golden-data stimulus + the map's overflow forensics
# ---------------------------------------------------------------------------

def test_golden_stimulus_exact_regeneration(golden_map):
    """The radar_output.txt stimulus regenerated bit-exactly (IEEE 1076.2
    seeds (1,1)); our chain on the IDENTICAL input puts the peaks exactly
    on the physical cells, while the checked-in map's strong rows carry
    the v3 core's unscaled-FFT wrap signature — the demonstrated reason
    map-level parity is impossible in principle (design_notes §3)."""
    frame = adr_quick.golden_frame_exact(cpi=0)
    assert frame.shape == (128, 1024)
    assert np.array_equal(frame, adr_quick.golden_frame_exact(cpi=0))
    assert not np.array_equal(frame, adr_quick.golden_frame_exact(cpi=1))
    assert np.all(np.abs(frame.real) <= 32767)

    p = P.full()
    # v3 chain has no MTI; biased window rounding is the hw behavior.
    mag, _ = reference.process_frame_fixed(frame, p, mti_bypass=True,
                                           window_rounding="biased")
    top = np.argsort(mag.ravel())[-5:][::-1]
    cells = {(int(i // 128), int(i % 128)) for i in top}
    # our top-5: the two targets' straddle rows at their TRUE dopplers
    assert cells <= {(99, 5), (100, 5), (101, 5),
                     (499, 118), (500, 118), (501, 118)}
    assert {(99, 5), (499, 118)} <= cells | {(101, 5), (501, 118)}

    # The artifact's overflow signature: row 99's maximum sits at Doppler
    # 25 — NOT the synthesized Doppler 5 — and rows 99/101 outweigh the
    # true row 100 (doppler-FFT wrap scatters the strong straddle rows;
    # the noise floor, which never wraps, stays clean: median 104).
    assert int(np.argmax(golden_map[99])) == 25
    assert golden_map[99].max() > 1.3 * golden_map[100].max()
    assert np.median(golden_map) == 104
    # our map has no such scatter: every row's max at the target Doppler
    for r in (99, 100, 101):
        assert int(np.argmax(mag[r])) == 5
    for r in (499, 500, 501):
        assert int(np.argmax(mag[r])) == 118

"""Array-radar model (pipeline.make_array_processor): beamformer ->
per-beam RDM -> 3D CFAR -> (beam, range, doppler) detections."""

import numpy as np
import jax

from fmcw_tpu import RadarParams, CfarParams
from fmcw_tpu.golden import reference
from fmcw_tpu.models import pipeline as pl
from fmcw_tpu.ops.beamform import steering_matrix

P = RadarParams(n_range=256, n_doppler=64,
                cfar=CfarParams(scale_block=2))
N_ELEMS = 8
N_BEAMS = 8


def _element_frames(u0: float, seed: int = 4):
    """Point source at steering sine ``u0``: per-element phase-shifted
    copies of a single-channel target frame (plus independent noise)."""
    rng = np.random.default_rng(seed)
    z = np.asarray(reference.two_target_frame(P, seed=seed,
                                              targets=((60, 20, 12000),)))
    elems = []
    for e in range(N_ELEMS):
        ph = np.exp(2j * np.pi * 0.5 * e * u0)   # wavefront phase; W conjugates
        noisy = z * ph + (rng.normal(0, 8, z.shape)
                          + 1j * rng.normal(0, 8, z.shape))
        elems.append(pl.complex_to_iq(noisy))
    return np.stack(elems)


def test_point_source_lands_in_matched_beam():
    u0 = 0.4
    iq = _element_frames(u0)
    proc = pl.make_array_processor(P, n_elems=N_ELEMS, n_beams=N_BEAMS)
    out = jax.tree.map(np.asarray, proc(iq))
    assert out["valid"].any()
    # strongest detection: correct range/Doppler and the beam steered
    # closest to u0
    wr, _ = steering_matrix(N_ELEMS, N_BEAMS)
    u = np.linspace(-np.sin(np.deg2rad(60.0)), np.sin(np.deg2rad(60.0)),
                    N_BEAMS)
    b_star = int(np.argmin(np.abs(u - u0)))
    assert out["beam_bin"][0] == b_star
    assert abs(int(out["range_bin"][0]) - 60) <= 1
    assert abs(int(out["doppler_bin"][0]) - 20) <= 1
    assert out["nonfinite_count"] == 0


def test_single_element_single_beam_matches_2d_pipeline():
    """Degenerate E=1/B=1 array (unit steering weight): detections equal
    the single-channel float pipeline's."""
    frame = pl.complex_to_iq(reference.two_target_frame(P, seed=2))
    proc_a = pl.make_array_processor(P, n_elems=1, n_beams=1)
    out_a = jax.tree.map(np.asarray, proc_a(frame[None]))
    proc_2d = pl.make_processor(P, mode="float32", frontend="xla",
                                include_maps=True)
    out_2d = jax.tree.map(np.asarray, proc_2d(frame))
    assert np.array_equal(out_a["det_cube"][0] > 0, out_2d["det_map"] > 0)
    v = out_2d["valid"]
    assert np.array_equal(out_a["valid"], v)
    assert np.array_equal(out_a["range_bin"][v], out_2d["range_bin"][v])
    assert np.array_equal(out_a["doppler_bin"][v], out_2d["doppler_bin"][v])
    assert (out_a["beam_bin"][v] == 0).all()


def test_fused_frontend_matches_xla_chain():
    """frontend='pallas' (fused per-beam front-end+detect kernel on the
    beamformed float I/Q, bf16x3) vs the vmapped XLA chain + cfar_3d
    (ref_angle=0): identical (beam, range, doppler) detection sets, det-cube
    support, and mag cube to the bf16x3 scale-relative tolerance."""
    import pytest
    iq = _element_frames(0.4, seed=11)
    proc_x = pl.make_array_processor(P, n_elems=N_ELEMS, n_beams=N_BEAMS,
                                     frontend="xla")
    proc_p = pl.make_array_processor(P, n_elems=N_ELEMS, n_beams=N_BEAMS,
                                     frontend="pallas")
    a = jax.tree.map(np.asarray, proc_x(iq))
    b = jax.tree.map(np.asarray, proc_p(iq))
    da = set(zip(a["beam_bin"][a["valid"]].tolist(),
                 a["range_bin"][a["valid"]].tolist(),
                 a["doppler_bin"][a["valid"]].tolist()))
    db = set(zip(b["beam_bin"][b["valid"]].tolist(),
                 b["range_bin"][b["valid"]].tolist(),
                 b["doppler_bin"][b["valid"]].tolist()))
    assert da and da == db
    assert int(a["n_dets"]) == int(b["n_dets"])
    assert np.array_equal(a["det_cube"] > 0, b["det_cube"] > 0)
    scale = float(np.abs(a["mag_cube"]).max())
    assert np.max(np.abs(a["mag_cube"] - b["mag_cube"])) / scale < 2e-4

    # Unsupported front-end shapes still refuse the explicit fused path at
    # ref_angle > 0 (192 is not 128-sliceable: n1 = 128, 192 % 128 != 0).
    with pytest.raises(ValueError, match="front-end shape"):
        pl.make_array_processor(P.replace(n_range=192), n_elems=N_ELEMS,
                                n_beams=N_BEAMS, ref_angle=1,
                                frontend="pallas")


def test_fused_frontend_ref_angle_matches_xla_chain():
    """ref_angle > 0 with frontend='pallas': the fused Pallas FRONT-END
    (detect=False) feeds the angle-extended 3D CFAR — same decisions as the
    XLA per-beam chain up to bf16x3/HIGHEST near-tie flips (the r4 perf
    route for the angle-extended regime, docs/PERF_LOG.md)."""
    iq = _element_frames(0.4, seed=13)
    kw = dict(n_elems=N_ELEMS, n_beams=N_BEAMS, ref_angle=1, guard_angle=0)
    a = jax.tree.map(np.asarray, pl.make_array_processor(
        P, frontend="xla", **kw)(iq))
    b = jax.tree.map(np.asarray, pl.make_array_processor(
        P, frontend="pallas", **kw)(iq))
    da = set(zip(a["beam_bin"][a["valid"]].tolist(),
                 a["range_bin"][a["valid"]].tolist(),
                 a["doppler_bin"][a["valid"]].tolist()))
    db = set(zip(b["beam_bin"][b["valid"]].tolist(),
                 b["range_bin"][b["valid"]].tolist(),
                 b["doppler_bin"][b["valid"]].tolist()))
    assert da and db
    assert len(da ^ db) <= max(2, len(da) // 8)       # near-tie flips only
    assert (int(a["beam_bin"][0]), int(a["range_bin"][0]),
            int(a["doppler_bin"][0])) == (int(b["beam_bin"][0]),
                                          int(b["range_bin"][0]),
                                          int(b["doppler_bin"][0]))
    scale = float(np.abs(a["mag_cube"]).max())
    assert np.max(np.abs(a["mag_cube"] - b["mag_cube"])) / scale < 2e-4


def test_grouped_sliced_topk_matches_deinterleaved():
    """The grouped fused extraction (beam grouping on the SLICED det layout
    + recomputed row maxes + row-select top-K, PERF_LOG r4) is exactly
    equivalent to de-interleaving first and running the flat top-K — same
    kernel outputs, so set equality is exact, not tolerance-bound."""
    from fmcw_tpu.ops import cfar as C, detect as DET
    from fmcw_tpu.ops.frontend_pallas import rdm_frontend
    from fmcw_tpu.ops.beamform import beamform
    import jax.numpy as jnp

    iq = _element_frames(0.25, seed=17)
    out = jax.tree.map(np.asarray, pl.make_array_processor(
        P, frontend="pallas", n_elems=N_ELEMS, n_beams=N_BEAMS,
        peak_group_radius=2, beam_group_radius=1, include_maps=True)(iq))
    # Recompose the old formulation from the model's own det cube (the
    # de-interleaved GROUPED cube is returned in det_cube).
    det = jnp.asarray(out["det_cube"])
    flat = det.reshape(N_BEAMS * P.n_range, P.n_doppler)
    want = jax.tree.map(np.asarray,
                        DET.topk_detections(flat, max_dets=64))
    got = set(zip(out["beam_bin"][out["valid"]].tolist(),
                  out["range_bin"][out["valid"]].tolist(),
                  out["doppler_bin"][out["valid"]].tolist(),
                  out["mag"][out["valid"]].tolist()))
    exp = set(zip((want["range_bin"][want["valid"]] // P.n_range).tolist(),
                  (want["range_bin"][want["valid"]] % P.n_range).tolist(),
                  want["doppler_bin"][want["valid"]].tolist(),
                  want["mag"][want["valid"]].tolist()))
    assert got == exp
    assert int(out["n_dets"]) == int(want["n_dets"])


def test_angle_extended_training_window():
    """ref_angle=1: the 3D training set spans neighbor beams; the point
    source still detects at the matched beam."""
    u0 = -0.25
    iq = _element_frames(u0, seed=9)
    proc = pl.make_array_processor(P, n_elems=N_ELEMS, n_beams=N_BEAMS,
                                   ref_angle=1, guard_angle=0)
    out = jax.tree.map(np.asarray, proc(iq))
    assert out["valid"].any()
    u = np.linspace(-np.sin(np.deg2rad(60.0)), np.sin(np.deg2rad(60.0)),
                    N_BEAMS)
    b_star = int(np.argmin(np.abs(u - u0)))
    assert out["beam_bin"][0] == b_star


def test_element_frames_single_element_matches_frame():
    """element_frames(E=1) consumes the RNG exactly like frame(): a
    1-element array reproduces the single-channel stimulus bit-for-bit."""
    from fmcw_tpu.models import scenario as sc

    s1 = sc.TacticalScenario(P, sc.quick_scenario())
    s2 = sc.TacticalScenario(P, sc.quick_scenario())
    for scan in (1, 2):
        frame, truth = s1.frame(scan)
        ef, truth_b = s2.element_frames(scan, n_elems=1)
        assert np.array_equal(frame, ef[0])
        assert [t[:3] for t in truth_b] == truth
        assert all(len(t) == 4 for t in truth_b)    # adds bearing_u


def test_element_scenario_detects_at_matched_beam():
    """Scenario element synthesis -> beamformed 3D pipeline: the strongest
    detection lands at a truth target's range and its bearing's beam."""
    import dataclasses
    from fmcw_tpu import CfarParams
    from fmcw_tpu.models import scenario as sc

    n = 8
    cfg = sc.quick_scenario()
    cfg.burst_synthesis = False          # point targets: energy in one bin
    # Demo CFAR geometry (guard band covers the target spread).
    p = P.replace(cfar=dataclasses.replace(
        CfarParams(ref_range=4, ref_doppler=3, guard_range=2,
                   guard_doppler=1), scale_block=2))
    scen = sc.TacticalScenario(p, cfg)
    frames, truth = scen.element_frames(1, n_elems=n)
    proc = pl.make_array_processor(p, n_elems=n, n_beams=n)
    out = jax.tree.map(np.asarray, proc(pl.complex_to_iq(frames)))
    assert out["valid"].any()
    u = np.linspace(-np.sin(np.deg2rad(60.0)), np.sin(np.deg2rad(60.0)), n)
    rb0, b0 = int(out["range_bin"][0]), int(out["beam_bin"][0])
    matched = [t for t in truth if abs(t[0] - rb0) <= 2]
    assert matched, (rb0, truth)
    b_star = int(np.argmin(np.abs(u - matched[0][3])))
    assert abs(b0 - b_star) <= 1


def test_peak_group_beams_semantics():
    """Beam-axis grouping: same-cell collapse to the strongest beam, ties
    toward the lower beam, NO wrap between the first and last beams."""
    import jax.numpy as jnp
    from fmcw_tpu.ops.cfar import peak_group_beams

    det = np.zeros((4, 3, 3), np.float32)
    det[0, 0, 0] = 5
    det[1, 0, 0] = 5        # tie -> beam 0 survives
    det[2, 1, 1] = 6
    det[3, 1, 1] = 7        # edge beam holds the max
    det[0, 2, 2] = 4        # isolated detection
    out = np.asarray(peak_group_beams(jnp.asarray(det), radius=1))
    assert out[0, 0, 0] == 5 and out[1, 0, 0] == 0
    assert out[3, 1, 1] == 7 and out[2, 1, 1] == 0
    assert out[0, 2, 2] == 4
    # Non-periodic: beams 0 and 3 are not neighbors even at radius 1.
    det2 = np.zeros((4, 1, 1), np.float32)
    det2[0, 0, 0] = 1
    det2[3, 0, 0] = 2
    out2 = np.asarray(peak_group_beams(jnp.asarray(det2), radius=1))
    assert out2[0, 0, 0] == 1 and out2[3, 0, 0] == 2


def test_array_grouping_fused_matches_xla():
    """peak_group_radius + beam_group_radius: the fused path (in-kernel 2D
    grouping + XLA beam grouping) agrees with the XLA chain up to near-tie
    survivor flips — grouping keeps the strict local max, so cells whose
    magnitudes differ by less than the bf16x3/HIGHEST numeric gap can pick
    a different (equally valid) survivor.  The strongest detection and the
    overwhelming majority of the set must match, and grouping must collapse
    the multi-beam duplicates."""
    iq = _element_frames(0.25, seed=6)
    kw = dict(n_elems=N_ELEMS, n_beams=N_BEAMS, peak_group_radius=2,
              beam_group_radius=1)
    a = jax.tree.map(np.asarray, pl.make_array_processor(
        P, frontend="xla", **kw)(iq))
    b = jax.tree.map(np.asarray, pl.make_array_processor(
        P, frontend="pallas", **kw)(iq))
    raw = jax.tree.map(np.asarray, pl.make_array_processor(
        P, frontend="xla", n_elems=N_ELEMS, n_beams=N_BEAMS)(iq))
    assert int(a["n_dets"]) < int(raw["n_dets"])      # grouping reduces
    assert abs(int(a["n_dets"]) - int(b["n_dets"])) <= 2
    da = set(zip(a["beam_bin"][a["valid"]].tolist(),
                 a["range_bin"][a["valid"]].tolist(),
                 a["doppler_bin"][a["valid"]].tolist()))
    db = set(zip(b["beam_bin"][b["valid"]].tolist(),
                 b["range_bin"][b["valid"]].tolist(),
                 b["doppler_bin"][b["valid"]].tolist()))
    assert da and db
    assert len(da ^ db) <= max(2, len(da) // 8)       # near-tie flips only
    # Strongest detection (the target peak, no near-tie) matches exactly.
    assert (int(a["beam_bin"][0]), int(a["range_bin"][0]),
            int(a["doppler_bin"][0])) == (int(b["beam_bin"][0]),
                                          int(b["range_bin"][0]),
                                          int(b["doppler_bin"][0]))
    # Adjacent-beam duplicates collapsed: survivors sharing a (range,
    # doppler) cell are more than beam_group_radius apart (both frontends).
    for dets in (da, db):
        cells = {}
        for bb, rr, dd in dets:
            cells.setdefault((rr, dd), []).append(bb)
        for beams in cells.values():
            beams = sorted(beams)
            assert all(b2 - b1 > 1 for b1, b2 in zip(beams, beams[1:]))


def test_peak_group_beams_fast_path_equals_general():
    """The contiguous-id fast path (zero-filled shifted views, r4) is
    bit-identical to the general beam_ids formulation on random sparse
    cubes — ties, edges, radii 1..3."""
    import jax.numpy as jnp
    from fmcw_tpu.ops.cfar import peak_group_beams

    rng = np.random.default_rng(23)
    for _ in range(4):
        B, R, D = 8, 16, 8
        det = np.where(rng.random((B, R, D)) < 0.1,
                       rng.integers(1, 5, (B, R, D)).astype(np.float32),
                       0.0)                      # dense ties (values 1..4)
        for radius in (1, 2, 3):
            fast = np.asarray(peak_group_beams(jnp.asarray(det),
                                               radius=radius))
            general = np.asarray(peak_group_beams(
                jnp.asarray(det), radius=radius,
                beam_ids=jnp.arange(B)))
            assert np.array_equal(fast, general), radius


def test_peak_group_beams_pallas_kernel_matches_xla():
    """The grouping kernel (cfar_pallas.peak_group_beams_pallas) is
    bit-identical to peak_group_beams on random sparse stacks with dense
    ties, and its row-max / count epilogues are exact."""
    import jax.numpy as jnp
    from fmcw_tpu.ops.cfar import peak_group_beams
    from fmcw_tpu.ops.cfar_pallas import peak_group_beams_pallas

    rng = np.random.default_rng(41)
    for radius in (1, 2):
        B, R, D = 8, 64, 128
        det = np.where(rng.random((B, R, D)) < 0.05,
                       rng.integers(1, 6, (B, R, D)).astype(np.float32),
                       0.0)
        want = np.asarray(peak_group_beams(jnp.asarray(det), radius=radius))
        got, rmax, nd = peak_group_beams_pallas(jnp.asarray(det),
                                                radius=radius,
                                                interpret=True)
        assert np.array_equal(np.asarray(got), want), radius
        assert np.array_equal(np.asarray(rmax),
                              want.reshape(B * R, D).max(axis=1))
        assert int(nd) == int((want > 0).sum())

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

    # The fused path needs per-beam 2D decisions: ref_angle > 0 must refuse.
    with pytest.raises(ValueError, match="ref_angle"):
        pl.make_array_processor(P, n_elems=N_ELEMS, n_beams=N_BEAMS,
                                ref_angle=1, frontend="pallas")


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

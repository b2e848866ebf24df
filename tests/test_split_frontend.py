"""Split fused front-end (ops/split_frontend.py): kernel A + all-to-all +
kernel B must be BIT-EXACT against the monolithic fused kernel — the
contract that lets sp>1 meshes run at kernel speed with the single-chip
kernel's parity guarantees (round-5 verdict item 1).

All kernels run in Pallas interpret mode on CPU (tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def mk_mesh(dp, sp):
    return M.make_mesh(dp=dp, sp=sp, devices=jax.devices()[:dp * sp])

from fmcw_tpu import RadarParams, CfarParams, TrackerParams
from fmcw_tpu.golden import reference
from fmcw_tpu.models import pipeline as pl
from fmcw_tpu.ops import split_frontend as SF
from fmcw_tpu.ops.frontend_pallas import rdm_frontend, rdm_frontend_fixed
from fmcw_tpu.parallel import mesh as M, sharded as sh


def params(nr=256, nd=64, **cfar_kw):
    cf = dict(ref_range=4, ref_doppler=4, guard_range=2, guard_doppler=1,
              edge_mode="wrap", scale_mode="cell")
    cf.update(cfar_kw)
    return RadarParams(n_range=nr, n_doppler=nd, cfar=CfarParams(**cf),
                       tracker=TrackerParams(max_dets=64))


def frame(p, seed=0):
    return pl.complex_to_iq(reference.two_target_frame(p, seed=seed))


def dein_mono(det_s, p):
    """De-interleave the MONOLITHIC kernel's sliced det layout to (nr, nd)."""
    n2 = max(p.n_range // 128, 1)
    n1 = min(p.n_range, 128)
    n2d = det_s.shape[0] // n2
    ndl = p.n_doppler // n2d
    return np.transpose(np.asarray(det_s).reshape(n2, n2d, n1, ndl),
                        (2, 0, 3, 1)).reshape(p.n_range, p.n_doppler)


def dein_split(det_s, p):
    """De-interleave the SPLIT kernel B's contiguous det layout."""
    n_planes = det_s.shape[0]
    n2d = 1 if p.n_doppler <= 128 else p.n_doppler // 128
    n2l = n_planes // n2d
    ndl = p.n_doppler // n2d
    return np.transpose(np.asarray(det_s).reshape(n2l, n2d, 128, ndl),
                        (0, 2, 3, 1)).reshape(n2l * 128, p.n_doppler)


def run_split(p, iq, fixed=False, pgr=0, **kw):
    return SF.split_frontend_frame(
        iq, cfar=p.cfar, fixed=fixed, peak_group_radius=pgr,
        notch_mode=p.notch_mode, interpret=True, emit_mag=True, **kw)


def run_mono(p, iq, fixed=False, pgr=0):
    if fixed:
        return rdm_frontend_fixed(iq, False, 0, notch_mode=p.notch_mode,
                                  interpret=True, cfar=p.cfar,
                                  peak_group_radius=pgr, emit_mag=True)
    return rdm_frontend(iq, False, notch_mode=p.notch_mode, interpret=True,
                        cfar=p.cfar, detect=True, scale_override=0,
                        peak_group_radius=pgr, emit_mag=True)


@pytest.mark.parametrize("variant,pgr", [("os", 0), ("os", 2), ("ca", 0),
                                         ("go", 0), ("so", 2)])
def test_split_bitexact_vs_monolithic_float(variant, pgr):
    p = params(variant=variant)
    iq = frame(p)
    det_s, mag_s, nf_s, rmax_s, nd_s = run_split(p, iq, pgr=pgr)
    det_m, mag_m, nf_m, rmax_m, nd_m = run_mono(p, iq, pgr=pgr)
    np.testing.assert_array_equal(dein_split(det_s, p), dein_mono(det_m, p))
    np.testing.assert_array_equal(np.asarray(mag_s), np.asarray(mag_m))
    assert int(nd_s) == int(nd_m)
    assert int(nf_s) == int(nf_m) == 0


def test_split_bitexact_vs_monolithic_fixed():
    p = params()
    iq = frame(p)
    det_s, mag_s, sat_s, _, nd_s = run_split(p, iq, fixed=True, pgr=2)
    det_m, mag_m, sat_m, _, nd_m = run_mono(p, iq, fixed=True, pgr=2)
    np.testing.assert_array_equal(dein_split(det_s, p), dein_mono(det_m, p))
    np.testing.assert_array_equal(np.asarray(mag_s), np.asarray(mag_m))
    assert int(sat_s) == int(sat_m)
    assert int(nd_s) == int(nd_m)


def test_split_fixed_sat_count_excludes_halo():
    """Doppler-window saturations within halo_range of the shard seam must
    be counted ONCE (regression: kernel B's halo block used to re-run
    iwin() on the exchanged column copies and re-count their saturation
    events into the shard's stat — 9206 vs the monolithic kernel's 9166 on
    this frame).  The crafted frame parks a near-full-scale tone at the TOP
    range bin (inside the self-halo) with a Doppler ramp the MTI notch
    passes, so the saturations land exactly in the halo columns."""
    p = params()
    nr, nd = p.n_range, p.n_doppler
    n = np.arange(nr)[None, :]
    c = np.arange(nd)[:, None]
    z = 32000.0 * np.exp(2j * np.pi * ((nr - 1) * n / nr + 0.23 * c))
    iq = pl.complex_to_iq(z.astype(np.complex64))
    det_s, mag_s, sat_s, _, nd_s = run_split(p, iq, fixed=True, pgr=2)
    det_m, mag_m, sat_m, _, nd_m = run_mono(p, iq, fixed=True, pgr=2)
    assert int(sat_m) > 0          # non-vacuous: the frame does saturate
    assert int(sat_s) == int(sat_m)
    np.testing.assert_array_equal(dein_split(det_s, p), dein_mono(det_m, p))
    np.testing.assert_array_equal(np.asarray(mag_s), np.asarray(mag_m))
    assert int(nd_s) == int(nd_m)


def test_split_bitexact_longcpi():
    """Long-CPI Doppler split (n_doppler = 256 -> n2d = 2 parity planes)."""
    p = params(nr=256, nd=256)
    iq = frame(p)
    det_s, mag_s, _, _, nd_s = run_split(p, iq, pgr=1)
    det_m, mag_m, _, _, nd_m = run_mono(p, iq, pgr=1)
    np.testing.assert_array_equal(dein_split(det_s, p), dein_mono(det_m, p))
    np.testing.assert_array_equal(np.asarray(mag_s), np.asarray(mag_m))
    assert int(nd_s) == int(nd_m)


def test_split_runtime_controls():
    """mti_bypass and scale_override flow through both kernels."""
    p = params()
    iq = frame(p)
    for byp, so in ((True, 0), (False, 7)):
        det_s, _, _, _, _ = run_split(p, iq)
        det_b, _, _, _, _ = SF.split_frontend_frame(
            iq, mti_bypass=byp, scale_override=so, cfar=p.cfar,
            notch_mode=p.notch_mode, interpret=True)
        det_m = rdm_frontend(iq, byp, notch_mode=p.notch_mode,
                             interpret=True, cfar=p.cfar, detect=True,
                             scale_override=so)[0]
        np.testing.assert_array_equal(dein_split(det_b, p),
                                      dein_mono(det_m, p))
        # and the control actually changed something
        assert not np.array_equal(dein_split(det_b, p), dein_split(det_s, p))


def det_set(out, i=0):
    v = np.asarray(out["valid"][i])
    return set(zip(np.asarray(out["range_bin"][i])[v].tolist(),
                   np.asarray(out["doppler_bin"][i])[v].tolist(),
                   np.asarray(out["mag"][i])[v].tolist()))


def single_fused_set(p, iq, mode="float32", pgr=0):
    proc = pl.make_processor(p, mode=mode, frontend="pallas",
                             include_maps=False, peak_group_radius=pgr)
    out = proc(iq)
    return det_set({k: np.asarray(v)[None] for k, v in out.items()
                    if k in ("valid", "range_bin", "doppler_bin", "mag")})


@pytest.mark.parametrize("dp,sp", [(1, 2), (2, 2), (1, 4)])
def test_sharded_split_detect_matches_fused_single_chip(dp, sp):
    """The headline contract: an sp-sharded mesh on the split fused path
    reproduces the single-chip MONOLITHIC fused kernel's detection set
    bit-exactly (positions AND magnitudes) — the sequence-parallel mesh
    runs the same numerics as the fastest single-chip path."""
    p = params(nr=128 * sp, nd=64)
    mesh = mk_mesh(dp, sp)
    proc = sh.make_sharded_processor(mesh, p, mode="float32",
                                     frontend="pallas",
                                     peak_group_radius=2)
    batch = np.stack([frame(p, seed=s) for s in range(dp)])
    out = proc(batch)
    ref = single_fused_set(p, batch[0], pgr=2)
    assert det_set(out) == ref and len(ref) > 0


def test_sharded_split_detect_fixed_matches_fused_single_chip():
    p = params(nr=256, nd=64)
    mesh = mk_mesh(1, 2)
    proc = sh.make_sharded_processor(mesh, p, mode="fixed",
                                     frontend="pallas")
    batch = np.stack([frame(p)])
    out = proc(batch)
    ref = single_fused_set(p, batch[0], mode="fixed")
    got = det_set(out)
    assert got == ref and len(ref) > 0
    # saturation counters also reproduce the fused single chip's
    sproc = pl.make_processor(p, mode="fixed", frontend="pallas",
                              include_maps=False)
    assert (int(np.asarray(out["saturation_count"][0]))
            == int(np.asarray(sproc(batch[0])["saturation_count"])))


def test_sharded_split_maps_match_fused_single_chip():
    """include_maps: the gathered sharded mag/det maps equal the monolithic
    fused kernel's, bit for bit."""
    p = params(nr=256, nd=64)
    mesh = mk_mesh(1, 2)
    proc = sh.make_sharded_processor(mesh, p, mode="float32",
                                     frontend="pallas", include_maps=True)
    batch = np.stack([frame(p)])
    out = proc(batch)
    det_m, mag_m, _, _, _ = run_mono(p, batch[0])
    np.testing.assert_array_equal(np.asarray(out["mag_map"][0]),
                                  np.asarray(mag_m))
    np.testing.assert_array_equal(np.asarray(out["det_map"][0]),
                                  dein_mono(det_m, p))


def test_sharded_split_block_scale_path():
    """Block-scale configs ride kernel A + kernel B(mag) + the sharded
    block-grid scale + standalone Pallas detect: the mag map must equal the
    monolithic fused kernel's bit-exactly, and the decision must equal the
    single-device standalone formulation on the gathered map."""
    import dataclasses
    from fmcw_tpu.ops import cfar as C
    p = params(nr=256, nd=64, scale_mode="block", scale_block=8)
    mesh = mk_mesh(1, 2)
    proc = sh.make_sharded_processor(mesh, p, mode="float32",
                                     frontend="pallas", include_maps=True)
    batch = np.stack([frame(p)])
    out = proc(batch)
    mag = np.asarray(out["mag_map"][0])
    mag_mono = np.asarray(rdm_frontend(batch[0], False,
                                       notch_mode=p.notch_mode,
                                       interpret=True))
    np.testing.assert_array_equal(mag, mag_mono)
    scale_map = C.block_scale_map(jnp.asarray(mag), p.cfar, integer=False)
    det_ref, _, _ = C.cfar_2d_auto(jnp.asarray(mag), 0, cfar=p.cfar,
                                   integer=False, method="pallas",
                                   need_debug=False, scale_map=scale_map)
    np.testing.assert_array_equal(np.asarray(out["det_map"][0]),
                                  np.asarray(det_ref))


def test_sharded_split_magnitude_exact():
    """magnitude_exact must flow through the magnitude-only kernel B
    (regression: the block-scale fall-through dropped exact_mag, silently
    computing alpha-max-beta-min magnitudes on the sharded path while the
    single chip computed hypot)."""
    p = params(nr=256, nd=64, scale_mode="block", scale_block=8)
    mesh = mk_mesh(1, 2)
    proc = sh.make_sharded_processor(mesh, p, mode="float32",
                                     frontend="pallas", include_maps=True,
                                     magnitude_exact=True)
    batch = np.stack([frame(p)])
    out = proc(batch)
    mag_mono = np.asarray(rdm_frontend(batch[0], False,
                                       notch_mode=p.notch_mode,
                                       exact_mag=True, interpret=True))
    np.testing.assert_array_equal(np.asarray(out["mag_map"][0]), mag_mono)
    # Non-vacuous: the exact (hypot) map differs from alpha-max-beta-min.
    approx = np.asarray(rdm_frontend(batch[0], False,
                                     notch_mode=p.notch_mode,
                                     interpret=True))
    assert not np.array_equal(mag_mono, approx)


def test_split_gate_fallback():
    """Shapes the split kernels can't take (n_range/sp not a 128 multiple)
    fall back to the XLA chain under auto and raise under explicit pallas."""
    p = params(nr=256, nd=64)
    mesh = mk_mesh(1, 4)          # nrl = 64
    assert not sh.split_frontend_supported(p, 4)
    with pytest.raises(ValueError, match="pallas"):
        sh.make_sharded_processor(mesh, p, mode="float32",
                                  frontend="pallas")
    # auto still builds and runs (XLA chain)
    proc = sh.make_sharded_processor(mesh, p, mode="float32")
    out = proc(np.stack([frame(p)]))
    assert int(np.asarray(out["n_dets"])[0]) > 0

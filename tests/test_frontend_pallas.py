"""Fused Pallas front-end (ops/frontend_pallas.py) vs the XLA stage chain.

Same matrices, same contraction shapes — agreement is to f32 tolerance (MXU
pass structure may differ between Mosaic and XLA), and the full pipeline
with frontend="pallas" must produce the same detection sets on the golden
frames.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fmcw_tpu import RadarParams, quick
from fmcw_tpu.golden import reference
from fmcw_tpu.models import pipeline as pl
from fmcw_tpu.ops import fft as F, magnitude as M
from fmcw_tpu.ops.frontend_pallas import rdm_frontend

Q = quick()


def _xla_frontend(iq, bypass, p, transient="zero", exact_mag=False):
    re = iq[..., 0].astype(jnp.float32)
    im = iq[..., 1].astype(jnp.float32)
    re, im = F.fft_apply(re, im, axis=1, window=True, method="matmul")
    re, im = F.doppler_apply(re, im, axis=0, bypass=bypass,
                             notch_mode=p.notch_mode, transient=transient)
    return M.magnitude_float(re, im, exact=exact_mag)


@pytest.mark.parametrize("bypass,transient,exact_mag", [
    (False, "zero", False), (True, "zero", False),
    (False, "passthrough", True),
])
def test_fused_frontend_matches_xla(bypass, transient, exact_mag):
    iq = pl.complex_to_iq(reference.two_target_frame(Q))
    byp = jnp.asarray(bypass)
    got = rdm_frontend(jnp.asarray(iq), byp, notch_mode=Q.notch_mode,
                       transient=transient, exact_mag=exact_mag,
                       interpret=True)
    want = _xla_frontend(jnp.asarray(iq), byp, Q, transient, exact_mag)
    assert got.shape == (Q.n_range, Q.n_doppler)
    scale = float(np.abs(np.asarray(want)).max())
    # bf16x3 kernel vs HIGHEST XLA: HIGH-precision error model.
    assert np.max(np.abs(np.asarray(got) - np.asarray(want))) / scale < 2e-4


def test_pipeline_frontend_pallas_detections():
    iq = pl.complex_to_iq(reference.two_target_frame(Q))
    ref_proc = pl.make_processor(Q, mode="float32", include_maps=False)
    new_proc = pl.make_processor(Q, mode="float32", include_maps=False,
                                 frontend="pallas")
    a = jax.tree.map(np.asarray, ref_proc(iq))
    b = jax.tree.map(np.asarray, new_proc(iq))
    da = set(zip(a["range_bin"][a["valid"]].tolist(),
                 a["doppler_bin"][a["valid"]].tolist()))
    db = set(zip(b["range_bin"][b["valid"]].tolist(),
                 b["doppler_bin"][b["valid"]].tolist()))
    assert da == db


def test_frontend_kernel_scale_matches_block_scale_map():
    """The in-kernel clutter-map scale epilogue agrees with the XLA
    block_scale_map evaluated on the kernel's own magnitude output (float
    sum order differs in ulps, so agreement is near-total rather than
    bit-guaranteed; decision edges are validated by the pipeline-level
    detection-set test below)."""
    import dataclasses
    from fmcw_tpu.ops import cfar as C

    p = RadarParams(cfar=dataclasses.replace(RadarParams().cfar,
                                             scale_mode="block"))
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    mag, scale = rdm_frontend(jnp.asarray(iq), jnp.asarray(False),
                              interpret=True, cfar=p.cfar)
    assert scale.shape == (p.n_range, p.n_doppler)
    ref = np.asarray(C.block_scale_map(mag, p.cfar, integer=False))
    got = np.asarray(scale)
    assert set(np.unique(got)) <= {p.cfar.scale_min, p.cfar.scale_nom,
                                   p.cfar.scale_max}
    assert np.mean(got == ref) > 0.995


def test_pipeline_kernel_scale_detections_match():
    import dataclasses

    p = RadarParams(cfar=dataclasses.replace(RadarParams().cfar,
                                             scale_mode="block"))
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    proc = pl.make_processor(p, mode="float32", include_maps=False,
                             frontend="pallas")
    out = jax.tree.map(np.asarray, proc(iq))
    rb = out["range_bin"][out["valid"]]
    assert any(abs(int(r) - 100) <= 2 for r in rb)
    assert any(abs(int(r) - 500) <= 2 for r in rb)
    # Global override still wins over the kernel-emitted scale.
    out5 = jax.tree.map(np.asarray, proc(iq, scale_override=6))
    assert out5["n_dets"] <= out["n_dets"] + 50  # sane, not exploding


def _block_params():
    import dataclasses
    return RadarParams(cfar=dataclasses.replace(RadarParams().cfar,
                                                scale_mode="block"))


@pytest.mark.parametrize("scale_mode", ["block", "cell"])
def test_frontend_detect_bitexact_vs_standalone_kernel(scale_mode):
    """detect=True det map == cfar_2d_pallas_detect on the kernel's own
    mag/scale outputs (same q_min counting formulation, same wrap edges) —
    for both the block-granular and the reference-exact per-cell scale."""
    from fmcw_tpu.ops.cfar_pallas import cfar_2d_pallas_detect

    p = _block_params() if scale_mode == "block" else RadarParams()
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    for so in (0, 6):
        det_s, mag, nf, row_max, n_dets = rdm_frontend(
            jnp.asarray(iq), jnp.asarray(False), interpret=True, cfar=p.cfar,
            detect=True, scale_override=jnp.asarray(so, jnp.int32))
        if scale_mode == "block":
            mag2, scale = rdm_frontend(jnp.asarray(iq), jnp.asarray(False),
                                       interpret=True, cfar=p.cfar)
        else:
            mag2, scale = rdm_frontend(jnp.asarray(iq), jnp.asarray(False),
                                       interpret=True), None
        assert np.array_equal(np.asarray(mag), np.asarray(mag2))
        want, _ = cfar_2d_pallas_detect(mag2, jnp.asarray(so, jnp.int32),
                                        cfar=p.cfar, interpret=True,
                                        scale_map=scale)
        got = np.swapaxes(np.asarray(det_s), 0, 1).reshape(p.n_range,
                                                           p.n_doppler)
        assert np.array_equal(got, np.asarray(want))
        assert int(nf) == 0
        # Top-K epilogue outputs: row maxes in sliced-row order + count.
        ds = np.asarray(det_s)
        assert np.array_equal(np.asarray(row_max),
                              ds.reshape(-1, p.n_doppler).max(axis=1))
        assert int(n_dets) == int((ds > 0).sum())


def test_topk_detections_sliced_matches_deinterleaved():
    from fmcw_tpu.ops import detect as DET

    rng = np.random.default_rng(3)
    n2, n1, D = 8, 128, 128
    det_s = np.where(rng.random((n2, n1, D)) < 0.002,
                     rng.random((n2, n1, D)).astype(np.float32) + 1.0,
                     0.0).astype(np.float32)
    a = jax.tree.map(np.asarray,
                     DET.topk_detections_sliced(jnp.asarray(det_s)))
    det_map = np.swapaxes(det_s, 0, 1).reshape(n2 * n1, D)
    b = jax.tree.map(np.asarray,
                     DET.topk_detections(jnp.asarray(det_map)))
    assert a["n_dets"] == b["n_dets"]
    sa = set(zip(a["range_bin"][a["valid"]].tolist(),
                 a["doppler_bin"][a["valid"]].tolist(),
                 a["mag"][a["valid"]].tolist()))
    sb = set(zip(b["range_bin"][b["valid"]].tolist(),
                 b["doppler_bin"][b["valid"]].tolist(),
                 b["mag"][b["valid"]].tolist()))
    assert sa == sb


@pytest.mark.parametrize("scale_mode", ["block", "cell"])
def test_pipeline_fused_detect_matches_unfused(scale_mode):
    p = _block_params() if scale_mode == "block" else RadarParams()
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    fused = pl.make_processor(p, mode="float32", include_maps=True,
                              frontend="pallas", fuse_detect=True)
    plain = pl.make_processor(p, mode="float32", include_maps=True,
                              frontend="pallas", fuse_detect=False)
    for kw in ({}, {"scale_override": 6}, {"mti_bypass": True}):
        a = jax.tree.map(np.asarray, fused(iq, **kw))
        b = jax.tree.map(np.asarray, plain(iq, **kw))
        assert a["n_dets"] == b["n_dets"]
        da = set(zip(a["range_bin"][a["valid"]].tolist(),
                     a["doppler_bin"][a["valid"]].tolist()))
        db = set(zip(b["range_bin"][b["valid"]].tolist(),
                     b["doppler_bin"][b["valid"]].tolist()))
        assert da == db
        assert np.array_equal(a["det_map"], b["det_map"])


@pytest.mark.parametrize("radius", [1, 2])
def test_peak_group_epilogue_ties_match_xla(radius):
    """Drive _peak_group_epilogue directly (tiny pallas_call harness) on
    integer-valued det slices — dense ties exercise the id tie-break and the
    wrap seams — and compare with ops/cfar.peak_group on the de-interleaved
    map."""
    from jax.experimental import pallas as plx
    from jax.experimental.pallas import tpu as pltpu
    from fmcw_tpu.ops import cfar as C
    from fmcw_tpu.ops.frontend_pallas import (_peak_group_epilogue, _DET_PAD)

    n2, n1, D = 4, 16, 128
    rng = np.random.default_rng(radius)
    det_s = np.where(rng.random((n2, n1, D)) < 0.25,
                     rng.integers(1, 4, (n2, n1, D)), 0).astype(np.float32)

    def harness(det_in_ref, det_ref, rot_ref):
        dets = [det_in_ref[k2] for k2 in range(n2)]
        _peak_group_epilogue(dets, det_ref, rot_ref, n2=n2, radius=radius)

    got = plx.pallas_call(
        harness,
        out_shape=jax.ShapeDtypeStruct((n2, n1, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM(
            (2 * radius + 1, n2, n1 + 2 * _DET_PAD, D), jnp.float32)],
        interpret=True,
    )(jnp.asarray(det_s))
    det_map = np.swapaxes(det_s, 0, 1).reshape(n2 * n1, D)
    want = np.asarray(C.peak_group(jnp.asarray(det_map), radius=radius))
    got_map = np.swapaxes(np.asarray(got), 0, 1).reshape(n2 * n1, D)
    assert (want > 0).sum() > 10          # the scenario is non-trivial
    assert np.array_equal(got_map, want)


def test_pipeline_fused_peak_group_matches_unfused():
    p = _block_params()
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    fused = pl.make_processor(p, mode="float32", include_maps=True,
                              frontend="pallas", peak_group_radius=2,
                              fuse_detect=True)
    plain = pl.make_processor(p, mode="float32", include_maps=True,
                              frontend="pallas", peak_group_radius=2,
                              fuse_detect=False)
    a = jax.tree.map(np.asarray, fused(iq))
    b = jax.tree.map(np.asarray, plain(iq))
    assert a["n_dets"] == b["n_dets"] > 0
    assert np.array_equal(a["det_map"], b["det_map"])
    da = set(zip(a["range_bin"][a["valid"]].tolist(),
                 a["doppler_bin"][a["valid"]].tolist()))
    db = set(zip(b["range_bin"][b["valid"]].tolist(),
                 b["doppler_bin"][b["valid"]].tolist()))
    assert da == db


@pytest.mark.parametrize("n_range", [256, 512])
def test_fused_detect_small_n2(n_range):
    """Fused detect at n2 = 2 and 4 (the slice-interleave addressing has
    non-trivial (k2+dr)//n2 sub-row offsets at small n2): det map matches
    the standalone kernel on the kernel's own mag/scale."""
    import dataclasses
    from fmcw_tpu.ops.cfar_pallas import cfar_2d_pallas_detect

    n2 = n_range // 128
    p = RadarParams(n_range=n_range, cfar=dataclasses.replace(
        RadarParams().cfar, scale_mode="block", scale_block=n2))
    assert pl.fused_detect_supported(p)
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    det_s, mag, nf, row_max, n_dets = rdm_frontend(
        jnp.asarray(iq), jnp.asarray(False), interpret=True, cfar=p.cfar,
        detect=True, scale_override=jnp.asarray(0, jnp.int32))
    mag2, scale = rdm_frontend(jnp.asarray(iq), jnp.asarray(False),
                               interpret=True, cfar=p.cfar)
    assert np.array_equal(np.asarray(mag), np.asarray(mag2))
    want, _ = cfar_2d_pallas_detect(mag2, jnp.asarray(0, jnp.int32),
                                    cfar=p.cfar, interpret=True,
                                    scale_map=scale)
    got = np.swapaxes(np.asarray(det_s), 0, 1).reshape(p.n_range, p.n_doppler)
    assert np.array_equal(got, np.asarray(want))
    assert int(n_dets) == int((got > 0).sum()) > 0


def test_fused_pipeline_256_chirps():
    """BASELINE config 2 shape (256 chirps x 1024 samples): the fused
    pipeline supports the doubled CPI and matches the unfused path."""
    import dataclasses

    p = RadarParams(n_doppler=256, cfar=dataclasses.replace(
        RadarParams().cfar, scale_mode="block"))
    assert pl.fused_detect_supported(p)
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    fused = pl.make_processor(p, mode="float32", include_maps=False,
                              frontend="pallas", fuse_detect=True)
    plain = pl.make_processor(p, mode="float32", include_maps=False,
                              frontend="pallas", fuse_detect=False)
    a = jax.tree.map(np.asarray, fused(iq))
    b = jax.tree.map(np.asarray, plain(iq))
    assert a["n_dets"] == b["n_dets"] > 0
    rb = a["range_bin"][a["valid"]]
    assert any(abs(int(r) - 100) <= 2 for r in rb)
    assert any(abs(int(r) - 500) <= 2 for r in rb)


@pytest.mark.parametrize("variant", ["ca", "go", "so"])
@pytest.mark.parametrize("scale_mode", ["block", "cell"])
def test_fused_detect_variants_match_xla(variant, scale_mode):
    """Fused CA/GO/SO detect epilogues vs the XLA cfar_2d evaluated on the
    kernel's own mag (and, for block mode, the kernel's own scale plane) —
    the accumulation orders mirror ops/cfar._ref_sums, so the decisions
    match on the golden frames."""
    import dataclasses
    from fmcw_tpu.ops import cfar as C

    p = RadarParams(cfar=dataclasses.replace(
        RadarParams().cfar, variant=variant, scale_mode=scale_mode))
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    for so in (0, 6):
        det_s, mag, nf, row_max, n_dets = rdm_frontend(
            jnp.asarray(iq), jnp.asarray(False), interpret=True, cfar=p.cfar,
            detect=True, scale_override=jnp.asarray(so, jnp.int32))
        scale = None
        if scale_mode == "block":
            _, scale = rdm_frontend(jnp.asarray(iq), jnp.asarray(False),
                                    interpret=True, cfar=p.cfar)
        want, _, _ = C.cfar_2d(mag, jnp.asarray(so, jnp.int32), cfar=p.cfar,
                               integer=False, scale_map=scale)
        got = np.swapaxes(np.asarray(det_s), 0, 1).reshape(p.n_range,
                                                           p.n_doppler)
        assert np.array_equal(got, np.asarray(want))
        ds = np.asarray(det_s)
        assert np.array_equal(np.asarray(row_max),
                              ds.reshape(-1, p.n_doppler).max(axis=1))
        assert int(n_dets) == int((ds > 0).sum())


@pytest.mark.parametrize("variant", ["ca", "go"])
def test_pipeline_fused_variant_detections(variant):
    """End to end: the fused-variant pipeline finds the golden targets and
    matches the unfused (XLA-CFAR) pipeline's detection set."""
    import dataclasses

    p = RadarParams(cfar=dataclasses.replace(
        RadarParams().cfar, variant=variant, scale_mode="block"))
    assert pl.fused_detect_supported(p)
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    fused = pl.make_processor(p, mode="float32", include_maps=True,
                              frontend="pallas", fuse_detect=True)
    plain = pl.make_processor(p, mode="float32", include_maps=True,
                              frontend="pallas", fuse_detect=False,
                              cfar_method="xla")
    a = jax.tree.map(np.asarray, fused(iq))
    b = jax.tree.map(np.asarray, plain(iq))
    assert a["n_dets"] == b["n_dets"] > 0
    assert np.array_equal(a["det_map"], b["det_map"])
    rb = a["range_bin"][a["valid"]]
    assert any(abs(int(r) - 100) <= 2 for r in rb)
    assert any(abs(int(r) - 500) <= 2 for r in rb)


def test_outer_fft_matches_direct():
    """The opt-in radix-2 outer-DFT path (outer='fft', kept for A/B —
    docs/PERF_LOG.md) must keep agreeing with the direct outer DFT to f32
    tolerance (float sums reassociate, so not bit-exact)."""
    p = RadarParams()  # n_range=1024 -> n2=8, a power of two
    iq = pl.complex_to_iq(reference.two_target_frame(p))
    direct = rdm_frontend(jnp.asarray(iq), jnp.asarray(False),
                          interpret=True, outer="direct")
    fft = rdm_frontend(jnp.asarray(iq), jnp.asarray(False),
                       interpret=True, outer="fft")
    scale = float(np.abs(np.asarray(direct)).max())
    assert np.max(np.abs(np.asarray(fft) - np.asarray(direct))) / scale < 2e-5


def test_fused_detect_gate_rejects_oversized_halo():
    """A block-mode CfarParams whose range halo exceeds the detect
    scratch pad (8 * n_range/128) must NOT pass the fused-detect gate —
    frontend='auto'/'pallas' has to fall back to the standalone kernels
    instead of hitting rdm_frontend's trace-time ValueError (ADVICE r1)."""
    import dataclasses

    big = RadarParams(
        n_range=256,
        cfar=dataclasses.replace(RadarParams().cfar, scale_mode="block",
                                 scale_block=2, ref_range=12, guard_range=5))
    assert big.cfar.halo_range == 17 > 8 * (big.n_range // 128)
    assert pl.kernel_scale_supported(big)          # scale-only path is fine
    assert not pl.fused_detect_supported(big)      # fused detect is not
    # End to end: the pipeline builds and runs unfused (in-kernel scale +
    # standalone detection kernel — the TPU production fallback).
    iq = pl.complex_to_iq(reference.two_target_frame(big))
    proc = pl.make_processor(big, mode="float32", include_maps=False,
                             frontend="pallas", cfar_method="pallas")
    out = jax.tree.map(np.asarray, proc(iq))
    rb = out["range_bin"][out["valid"]]
    assert any(abs(int(r) - 25) <= 2 for r in rb)  # target at bin 100*256/1024


def test_pipeline_frontend_pallas_batch_vmap():
    iq = pl.complex_to_iq(reference.two_target_frame(Q))
    batch = np.stack([iq, iq])
    proc = pl.make_batch_processor(Q, mode="float32", include_maps=False,
                                   frontend="pallas")
    out = jax.tree.map(np.asarray, proc(batch))
    assert out["n_dets"].shape == (2,)
    assert out["n_dets"][0] == out["n_dets"][1] > 0


def test_fused_detect_random_config_fuzz():
    """Randomized gate-valid CFAR geometries/variants/scale modes with
    random controls: the fused float detect epilogue must match the
    unfused pipeline's detection decisions exactly for every draw."""
    import dataclasses
    from fmcw_tpu import RadarParams, CfarParams

    rng = np.random.default_rng(77)
    for trial in range(5):
        while True:
            cfar = CfarParams(
                ref_range=int(rng.integers(1, 7)),
                ref_doppler=int(rng.integers(1, 6)),
                guard_range=int(rng.integers(0, 3)),
                guard_doppler=int(rng.integers(0, 3)),
                rank_pct=int(rng.integers(50, 95)),
                variant=str(rng.choice(["os", "ca", "go", "so"])),
                scale_mode=str(rng.choice(["cell", "block"])),
                scale_block=2)
            p = RadarParams(n_range=256, n_doppler=64, cfar=cfar)
            if pl.fused_detect_supported(p):
                break
        pg = int(rng.integers(0, 3))
        byp = bool(rng.integers(0, 2))
        so = int(rng.choice([0, 0, 3]))
        frame = pl.complex_to_iq(
            reference.two_target_frame(p, seed=int(rng.integers(1 << 16))))
        kw = dict(mode="float32", include_maps=True, peak_group_radius=pg,
                  frontend="pallas")
        out_f = pl.make_processor(p, fuse_detect=True, **kw)(
            frame, mti_bypass=byp, scale_override=so)
        out_u = pl.make_processor(p, fuse_detect=False, **kw)(
            frame, mti_bypass=byp, scale_override=so)
        tag = (trial, cfar.variant, cfar.scale_mode, pg, byp, so)
        a = np.asarray(out_f["det_map"])
        b = np.asarray(out_u["det_map"])
        assert np.array_equal(a, b), tag
        assert np.asarray(out_f["n_dets"]) == np.asarray(out_u["n_dets"]), tag


# ---------------------------------------------------------------------------
# QUICK_MODE (n2 == 1, 128x32) fused detect — tb_tactical.vhd:28-40 treats
# the quick map as a first-class config, so the fused production path must
# cover it (VERDICT r2 #4).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["float32", "fixed"])
def test_quick_n2_1_fused_detect_bitexact_vs_standalone(mode):
    """At n_range=128 the detect epilogue's window row offsets address the
    rotation scratch's sublane pad directly ((k2+dr)//n2 == dr); the fused
    decision must equal the standalone CFAR run on the kernel's own mag."""
    from fmcw_tpu.ops import cfar as C
    from fmcw_tpu.ops.frontend_pallas import rdm_frontend, rdm_frontend_fixed
    p = Q
    iq = pl.complex_to_iq(reference.two_target_frame(p, seed=3))
    if mode == "fixed":
        det_s, mag, _, rmax, nd_ = rdm_frontend_fixed(
            iq, False, 0, interpret=True, cfar=p.cfar)
        integer = True
    else:
        det_s, mag, _, rmax, nd_ = rdm_frontend(
            iq, False, interpret=True, cfar=p.cfar, detect=True,
            scale_override=0)
        integer = False
    det_map = np.swapaxes(np.asarray(det_s), 0, 1).reshape(128, 32)
    m = np.asarray(mag)
    det_ref, _, _ = C.cfar_2d(m.astype(np.int32) if integer else m, 0,
                              cfar=p.cfar, integer=integer)
    assert np.array_equal(det_map.astype(np.float64),
                          np.asarray(det_ref).astype(np.float64))
    assert int(nd_) == int(np.sum(np.asarray(det_ref) > 0))
    # row maxes (n2=1: sliced row ids == map rows)
    assert np.array_equal(np.asarray(rmax),
                          det_map.max(axis=1).astype(np.float32))


def test_quick_preset_gates_open_for_fused_path():
    assert pl.kernel_percell_supported(Q)
    assert pl.fused_detect_supported(Q)
    assert pl.fused_fixed_detect_supported(Q)


@pytest.mark.parametrize("mode", ["float32", "fixed"])
def test_quick_pipeline_fused_matches_xla_chain(mode):
    """End-to-end quick-preset parity: forced-pallas (fused) pipeline vs the
    XLA chain — detection-SET equality (the fused kernel's contract)."""
    p = Q
    iq = pl.complex_to_iq(reference.two_target_frame(p, seed=3))
    proc_k = pl.make_processor(p, mode=mode, frontend="pallas",
                               include_maps=False)
    proc_x = pl.make_processor(p, mode=mode, frontend="xla",
                               cfar_method="xla" if mode == "float32"
                               else "auto", include_maps=False)

    def dset(o):
        v = np.asarray(o["valid"])
        return set(zip(np.asarray(o["range_bin"])[v].tolist(),
                       np.asarray(o["doppler_bin"])[v].tolist()))

    ok, ox = proc_k(iq), proc_x(iq)
    assert dset(ok) == dset(ox)
    assert len(dset(ok)) > 5
    with_pg = pl.make_processor(p, mode=mode, frontend="pallas",
                                include_maps=False, peak_group_radius=1)
    assert len(dset(with_pg(iq))) <= len(dset(ok))


@pytest.mark.parametrize("so", [0, 3])
def test_percell_onepass_bitequal_twopass(so):
    """The merged one-pass per-cell epilogue (the measured-slower A/B
    alternative kept for the PERF_LOG floor evidence, docs/PERF_LOG.md)
    decides bit-identically to the shipping two-pass form."""
    from fmcw_tpu.ops.frontend_pallas import rdm_frontend
    for p in (RadarParams(), Q):
        iq = pl.complex_to_iq(reference.two_target_frame(p, seed=4))
        a = rdm_frontend(iq, False, interpret=True, cfar=p.cfar, detect=True,
                         scale_override=so, emit_mag=False)
        b = rdm_frontend(iq, False, interpret=True, cfar=p.cfar, detect=True,
                         scale_override=so, emit_mag=False,
                         percell_onepass=True)
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert int(a[4]) == int(b[4])

"""Fused fixed-point front-end kernel (ops/frontend_pallas.rdm_frontend_fixed).

The fixed-mode parity chain has three links:

  golden fixed model  ==  XLA fixed pipeline  ~=  fused fixed kernel

The first link is exact (detection sets) and pinned elsewhere
(tests/test_golden_frame.py).  The fused kernel reproduces the identical
integer semantics per stage but computes the FFTs with a bf16x6 operand
split (the XLA HIGHEST error model), so pre-BFP transform values differ in
f32 ulps and quantized values by a few LSB — the tests here pin the
meaningful contract: *exact detection-set parity* with the XLA fixed chain
(and hence the golden model) plus exact saturation counts, across scale
modes, variants, peak grouping and the runtime controls.

All tests run the Pallas interpreter on CPU with the same bf16 splits the
TPU uses (jnp.astype(bfloat16) rounds identically), so the numerics model
under test is the hardware one.
"""

import numpy as np
import pytest
import jax

from fmcw_tpu import RadarParams, CfarParams
from fmcw_tpu.golden import reference
from fmcw_tpu.models import pipeline as pl


def _params(scale_mode="cell", variant="os", **cfar_kw):
    return RadarParams(
        n_range=256, n_doppler=64,
        cfar=CfarParams(scale_mode=scale_mode, scale_block=2,
                        variant=variant, **cfar_kw))


def _run_pair(p, frame, pg=0, **kw):
    base = dict(mode="fixed", include_maps=True, peak_group_radius=pg)
    out_x = pl.make_processor(p, **base)(frame, **kw)
    out_k = pl.make_processor(p, frontend="pallas", **base)(frame, **kw)
    return (jax.tree.map(np.asarray, out_x), jax.tree.map(np.asarray, out_k))


def _det_set(out):
    return set(zip(*np.nonzero(out["det_map"])))


@pytest.mark.parametrize("scale_mode,variant,pg", [
    ("cell", "os", 0),
    ("block", "os", 0),
    ("block", "os", 2),
    ("cell", "ca", 0),
    ("cell", "so", 0),
    ("block", "go", 0),
])
def test_fixed_fused_matches_xla_chain(scale_mode, variant, pg):
    p = _params(scale_mode, variant)
    frame = pl.complex_to_iq(reference.two_target_frame(p, seed=3))
    out_x, out_k = _run_pair(p, frame, pg=pg)
    # Exact detection-set parity, exact count, integer dtypes.
    assert _det_set(out_x) == _det_set(out_k)
    assert out_x["n_dets"] == out_k["n_dets"]
    assert out_k["mag_map"].dtype == out_x["mag_map"].dtype
    assert out_k["mag"].dtype == out_x["mag"].dtype
    # Quantized magnitudes within the bf16x6-vs-f32 LSB tolerance.
    d = np.abs(out_x["mag_map"].astype(np.int64)
               - out_k["mag_map"].astype(np.int64))
    assert d.max() <= 8, d.max()
    # Extracted top-K agrees as a set (tie order may differ with equal mags).
    v = out_x["valid"]
    assert np.array_equal(v, out_k["valid"])
    sx = set(zip(out_x["range_bin"][v].tolist(),
                 out_x["doppler_bin"][v].tolist()))
    sk = set(zip(out_k["range_bin"][v].tolist(),
                 out_k["doppler_bin"][v].tolist()))
    assert sx == sk


@pytest.mark.parametrize("notch_mode,transient,rounding", [
    (3, "zero", "unbiased"),
    (2, "passthrough", "unbiased"),
    (2, "zero", "biased"),
])
def test_fixed_fused_numeric_options(notch_mode, transient, rounding):
    """3-pulse MTI, hardware passthrough transient, and the hardware's
    biased window rounding follow the XLA fixed chain.  The 3-pulse
    canceller doubles the slow-time gain, so the range-stage <=1 LSB BFP
    quantize differences compound into a few-LSB Doppler-stage spread in
    the target rows — marginal CFAR map cells may flip (the same tolerance
    class as the fixed-vs-golden contract); the extracted top-K detection
    set must still match exactly."""
    p = _params("cell", "os").replace(notch_mode=notch_mode)
    frame = pl.complex_to_iq(reference.two_target_frame(p, seed=11))
    base = dict(mode="fixed", include_maps=True, mti_transient=transient,
                window_rounding=rounding)
    out_x = jax.tree.map(np.asarray, pl.make_processor(p, **base)(frame))
    out_k = jax.tree.map(
        np.asarray, pl.make_processor(p, frontend="pallas", **base)(frame))
    sym = _det_set(out_x) ^ _det_set(out_k)
    assert len(sym) <= max(2, out_x["n_dets"] // 100), sorted(sym)
    assert abs(int(out_x["n_dets"]) - int(out_k["n_dets"])) <= 4
    assert out_x["saturation_count"] == out_k["saturation_count"]
    vx, vk = out_x["valid"], out_k["valid"]
    tx = set(zip(out_x["range_bin"][vx].tolist(),
                 out_x["doppler_bin"][vx].tolist()))
    tk = set(zip(out_k["range_bin"][vk].tolist(),
                 out_k["doppler_bin"][vk].tolist()))
    assert tx == tk


def test_fixed_fused_controls_and_saturation():
    """Runtime controls (mti_bypass, scale_override) and the saturation
    counter (window_multiplier.vhd:151-158 analog) match the XLA chain
    exactly on a saturating stimulus."""
    p = _params("cell", "os")
    hot = np.clip(np.asarray(reference.two_target_frame(p, seed=5)) * 40,
                  -32768, 32767)
    hot = np.stack([hot.real, hot.imag], -1).astype(np.int16)
    for byp, so in ((False, 0), (True, 0), (False, 3)):
        out_x, out_k = _run_pair(p, hot, mti_bypass=byp, scale_override=so)
        assert out_x["saturation_count"] == out_k["saturation_count"]
        assert out_x["saturation_count"] > 0
        assert _det_set(out_x) == _det_set(out_k), (byp, so)


def test_fixed_fused_full_size_golden_frame():
    """Full 1024x128 CPI: the fused fixed kernel reproduces the XLA fixed
    chain's detection set on the golden two-target frame — and therefore
    the golden model's (tests/test_golden_frame.py pins that link)."""
    p = RadarParams()
    frame = pl.complex_to_iq(reference.two_target_frame(p))
    out_x, out_k = _run_pair(p, frame)
    assert _det_set(out_x) == _det_set(out_k)
    assert out_x["n_dets"] == out_k["n_dets"]


def test_fixed_fused_vs_golden_model():
    """Direct link: fused fixed kernel detections == golden numpy fixed
    chain detections (the reference-parity oracle), mid-size frame."""
    from fmcw_tpu.golden import fixed_point as fx

    p = _params("cell", "os")
    z = reference.two_target_frame(p, seed=7)
    frame = pl.complex_to_iq(z)
    out_k = jax.tree.map(
        np.asarray,
        pl.make_processor(p, mode="fixed", frontend="pallas",
                          include_maps=True)(frame))
    _, det_g = reference.process_frame_fixed(z, p)
    assert _det_set(out_k) == set(zip(*np.nonzero(det_g)))


def test_fixed_fused_random_config_fuzz():
    """Randomized gate-valid CFAR geometries, variants, scale modes,
    controls and stimuli: detection-set parity with the XLA fixed chain
    must hold for every draw (2-pulse configs)."""
    rng = np.random.default_rng(2024)
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
            if pl.fused_fixed_detect_supported(p):
                break
        pg = int(rng.integers(0, 3))
        byp = bool(rng.integers(0, 2))
        so = int(rng.choice([0, 0, 2, 5]))
        z = np.asarray(reference.two_target_frame(
            p, seed=int(rng.integers(1 << 16)))) * rng.uniform(0.5, 4.0)
        z = (np.clip(z.real, -32768, 32767)
             + 1j * np.clip(z.imag, -32768, 32767))
        frame = pl.complex_to_iq(z)
        out_x, out_k = _run_pair(p, frame, pg=pg, mti_bypass=byp,
                                 scale_override=so)
        tag = (trial, cfar.variant, cfar.scale_mode, pg, byp, so)
        assert _det_set(out_x) == _det_set(out_k), tag
        assert out_x["n_dets"] == out_k["n_dets"], tag
        assert out_x["saturation_count"] == out_k["saturation_count"], tag


def test_fixed_fused_gate_raises_on_unsupported():
    # reflect edges are outside the fused kernel's wrap layout.
    p = _params("cell", "os", edge_mode="reflect")
    with pytest.raises(ValueError, match="fused fixed-point"):
        pl.make_processor(p, mode="fixed", frontend="pallas")
    # Windows whose full-window sum can exceed 2^24 (not exactly
    # representable in the kernel's integer-in-f32 sums) are gated out for
    # sum-using configs — this geometry passes every other gate (halo 8 <=
    # 8*n2 = 16) so the 2^24 bound is the discriminator: 17x23 = 391 cells
    # * 45056 > 2^24.
    wide = dict(ref_range=6, guard_range=2, ref_doppler=9, guard_doppler=2)
    p_wide = _params("cell", "os", **wide)
    assert not pl.fused_fixed_detect_supported(p_wide)
    with pytest.raises(ValueError, match="fused fixed-point"):
        pl.make_processor(p_wide, mode="fixed", frontend="pallas")
    # The kernel wrapper itself also rejects it (defense in depth).
    from fmcw_tpu.ops.frontend_pallas import rdm_frontend_fixed
    with pytest.raises(ValueError, match="window"):
        rdm_frontend_fixed(
            np.zeros((p_wide.n_doppler, p_wide.n_range, 2), np.int16),
            cfar=p_wide.cfar, interpret=True)
    # ...but OS + block scale decides purely by counting (exact at any
    # window size): the same window stays supported.
    assert pl.fused_fixed_detect_supported(_params("block", "os", **wide))
    # auto never routes fixed mode to the kernel (bit-identical default).
    proc = pl.make_processor(_params(), mode="fixed", frontend="auto")
    assert proc is not None


def test_fixed_fused_large_scale_override_exact():
    """Integer threshold decision with a large non-power-of-two
    scale_override: the ceil-division form stays exact where an f32
    est*scale product would round (products past 2^24)."""
    # The formula itself, over the full regime incl. >2^24 products:
    # est < ceil(cut/scale) <=> cut > est*scale, exactly.
    cuts = np.arange(1, 45057, 97)
    for scale in (373, 3001, 45056):
        q = np.floor((cuts - 1).astype(np.float32)
                     / np.float32(scale)).astype(np.int64) + 1
        assert np.array_equal(q, -(-cuts.astype(np.int64) // scale))
        # decision equivalence at the boundary ests
        for est in (q - 1, q, q + 1):
            lhs = est < q
            rhs = cuts.astype(np.int64) > est * scale
            assert np.array_equal(lhs, rhs)
    # Integration: hot stimulus (ests near the magnitude ceiling) with a
    # non-power-of-two override pushing products past 2^24.
    p = _params("cell", "ca")
    hot = np.clip(np.asarray(reference.two_target_frame(p, seed=13)) * 40,
                  -32768, 32767)
    hot = np.stack([hot.real, hot.imag], -1).astype(np.int16)
    out_x, out_k = _run_pair(p, hot, scale_override=373)
    assert _det_set(out_x) == _det_set(out_k)
    assert out_x["n_dets"] == out_k["n_dets"]

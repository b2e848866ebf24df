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


def test_pipeline_frontend_pallas_batch_vmap():
    iq = pl.complex_to_iq(reference.two_target_frame(Q))
    batch = np.stack([iq, iq])
    proc = pl.make_batch_processor(Q, mode="float32", include_maps=False,
                                   frontend="pallas")
    out = jax.tree.map(np.asarray, proc(batch))
    assert out["n_dets"].shape == (2,)
    assert out["n_dets"][0] == out["n_dets"][1] > 0

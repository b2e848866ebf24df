"""Auxiliary subsystem tests: 1D CFAR, chunked ingest, debug taps,
checkpoint/resume, reference-visualizer log compatibility."""

import importlib.util
import os

import numpy as np
import pytest

from fmcw_tpu import quick, TrackerParams
from fmcw_tpu.golden import fixed_point as fx, reference as ref, tracker as gt
from fmcw_tpu.models import pipeline as pl
from fmcw_tpu.ops import cfar as C
from fmcw_tpu.runtime.stream import FrameAssembler
from fmcw_tpu.utils import checkpoint as ckpt, io as rio

Q = quick()


# --- 1D OS-CFAR (rtl/old/os_cfar.vhd; tb_os_cfar.vhd scenarios) ---

def test_cfar_1d_noise_floor():
    rng = np.random.default_rng(0)
    x = rng.integers(90, 111, 512)
    det = fx.os_cfar_1d(x)
    # Uniform noise with 4x threshold: no false alarms.
    assert np.count_nonzero(det) == 0


def test_cfar_1d_single_target():
    x = np.full(256, 100, dtype=np.int64)
    x[100] = 5000
    det = fx.os_cfar_1d(x)
    assert det[100] == 5000 and np.count_nonzero(det) == 1


def test_cfar_1d_two_close_targets():
    # Masking scenario (tb_os_cfar.vhd:59-80): two strong targets inside each
    # other's training window still both detect with the OS rank.
    x = np.full(256, 100, dtype=np.int64)
    x[100] = 5000
    x[106] = 4800
    det = fx.os_cfar_1d(x)
    assert det[100] > 0 and det[106] > 0


def test_cfar_1d_jax_matches_golden():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 17, 512)
    x[50] = 120000
    got = np.asarray(C.cfar_1d(x.astype(np.int32)))
    want = fx.os_cfar_1d(x)
    assert np.array_equal(got, want)


# --- chunked ingest (the tvalid-gap / backpressure analog) ---

def test_frame_assembler_chunk_invariance():
    rng = np.random.default_rng(2)
    frames = [pl.complex_to_iq(ref.two_target_frame(Q, seed=s))
              for s in range(3)]
    samples = np.concatenate([f.reshape(-1, 2) for f in frames])
    asm = FrameAssembler(Q.n_doppler, Q.n_range)
    out = []
    pos = 0
    while pos < len(samples):
        k = int(rng.integers(1, 5000))
        out.extend(asm.push(samples[pos: pos + k]))
        pos += k
    assert len(out) == 3
    for got, want in zip(out, frames):
        assert np.array_equal(got, want)
    assert asm.pending_samples == 0


# --- debug taps + sanitization counters ---

def test_debug_taps_and_nonfinite():
    proc = pl.make_processor(Q, mode="float32", include_debug=True)
    iq = pl.complex_to_iq(ref.two_target_frame(Q))
    out = proc(iq)
    thr = np.asarray(out["threshold_map"])
    sc = np.asarray(out["scale_map"])
    assert thr.shape == (Q.n_range, Q.n_doppler)
    assert set(np.unique(sc)) <= {2, 4, 6}
    assert int(out["nonfinite_count"]) == 0
    # dbg_scale respects the override (os_cfar_2d.vhd:191-192).
    out7 = proc(iq, scale_override=7)
    assert np.all(np.asarray(out7["scale_map"]) == 7)


# --- checkpoint/resume ---

def test_tracker_checkpoint_roundtrip(tmp_path):
    tp = TrackerParams()
    state = gt.init_state(tp)
    for scan in range(4):
        state, _ = gt.step(state, [100, 600], [40, 80], [5000, 8000], tp)
    path = str(tmp_path / "trk.npz")
    ckpt.save(path, state, scan_index=4, metadata={"prf": 8000})
    loaded, scan, meta, _ = ckpt.load(path)
    assert scan == 4 and meta == {"prf": 8000}
    for k in state:
        assert np.array_equal(loaded[k], state[k])
    # Resume produces the identical trajectory.
    a, _ = gt.step({k: v.copy() for k, v in state.items()},
                   [95, 600], [40, 80], [5000, 8000], tp)
    b, _ = gt.step(loaded, [95, 600], [40, 80], [5000, 8000], tp)
    for k in a:
        assert np.array_equal(a[k], b[k])


# --- reference visualizer compatibility ---

REF_VIZ = "/root/reference/model/visualize_radar_targets.py"


@pytest.mark.skipif(not os.path.exists(REF_VIZ),
                    reason="reference not mounted")
def test_reference_visualizer_parses_our_logs(tmp_path):
    """The reference's own analysis layer must load this framework's logs
    unchanged (SURVEY.md §5 'keep the exact text formats')."""
    det_path = str(tmp_path / "dets.txt")
    trk_path = str(tmp_path / "trks.txt")
    rio.write_detections(det_path, [10, 20], [3, 4], [1234, 5678])
    rio.write_tracks(trk_path, [
        {"id": 2, "range_pos": 400, "dopp_pos": 44, "range_vel": -20,
         "quality": 7, "status": 2}], active_count=3)

    spec = importlib.util.spec_from_file_location("ref_viz", REF_VIZ)
    mod = importlib.util.module_from_spec(spec)
    import matplotlib
    matplotlib.use("Agg")
    spec.loader.exec_module(mod)

    dets = mod.load_detections(det_path)
    assert dets.shape == (2, 3) and dets[1].tolist() == [20, 4, 5678]
    tracks, counts = mod.load_tracks(trk_path)
    assert counts == [3]
    assert tracks[2].range_bins == [400]
    assert tracks[2].qualities == [7]


def test_roofline_models_and_gate(tmp_path):
    """Roofline accounting (round-5 verdict item 3): op/byte models are
    positive and scale with the map, achieved() fractions are consistent,
    and the regression gate records/compares bests."""
    from fmcw_tpu import RadarParams
    from fmcw_tpu.utils import roofline as RL
    p = RadarParams()
    m = RL.fused_detect_model(p)
    assert m["mxu_flops"] > 0 and m["vpu_ops"] > 0 and m["hbm_bytes"] > 0
    m2 = RL.fused_detect_model(RadarParams(n_range=2048))
    assert m2["mxu_flops"] > m["mxu_flops"]
    c = RL.cfar_detect_model(p)
    # ~1000 op-equivalents/cell at the default 13x11 window (PERF_LOG).
    assert 600 <= c["vpu_ops"] / (p.n_range * p.n_doppler) <= 1200
    ach = RL.achieved(c, 15000.0)      # ~2T VPU op/s territory
    assert ach["bound_by"] == "vpu"
    assert 0 < ach["frac_vpu_peak"] < 1
    path = str(tmp_path / "bests.json")
    g1 = RL.gate("cfar_detect", ach, bests_path=path)
    assert g1["ok"] and g1["frac_of_best"] == 1.0
    # Gate threshold sits at the tunnel's measured whole-phase floor (0.5x,
    # see roofline.gate): half-speed is still "ok" (a slow network phase),
    # anything below it is a formulation regression.
    slow = RL.achieved(c, 15000.0 * 0.5)
    g2 = RL.gate("cfar_detect", slow, bests_path=path)
    assert g2["ok"] and g2["frac_of_best"] == 0.5
    slower = RL.achieved(c, 15000.0 * 0.4)
    g2b = RL.gate("cfar_detect", slower, bests_path=path)
    assert not g2b["ok"] and g2b["frac_of_best"] == 0.4
    fast = RL.achieved(c, 15000.0 * 1.2)
    g3 = RL.gate("cfar_detect", fast, bests_path=path)
    assert g3["ok"] and g3["best"] == g3["peak_frac"]

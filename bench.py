"""Benchmark: radar frames/s per chip (range-Doppler + CFAR), single chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference FPGA's design budget of ~1526 frames/s (200 MHz,
fully-streaming 1 sample/clock, 1024x128 CPI — rtl/old/radar_core_v2.vhd:16-19,
BASELINE.md).  vs_baseline = frames/s / 1526.

Methodology: steady-state throughput of the jitted batch pipeline on frames
already resident in HBM (the ingest path overlaps transfers — see
fmcw_tpu/runtime), detections extracted on device, one scalar sync per batch.
Stage-level timings and configuration sweeps go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: compile times through the tunneled
# backend vary wildly (10s-300s); caching makes repeat bench runs start fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

BASELINE_FPS = 1526.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    # Force a device->host readback: on the tunneled TPU backend
    # block_until_ready can return before remote execution finishes, so a
    # small transfer is the only reliable completion barrier.
    return np.asarray(out["n_dets"]).sum()


def bench_config(proc, batch, iters=16, reps=5):
    """Best-of-``reps`` steady-state throughput.  The tunneled TPU's
    effective speed swings ~1.5-2x with external load; the max over a few
    short repetitions reports the machine's capability rather than the
    slowest contention window."""
    out = proc(batch)          # compile + warm
    _sync(out)
    out = proc(batch)
    _sync(out)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = proc(batch)
        _sync(out)
        dt = time.perf_counter() - t0
        best = max(best, batch.shape[0] * iters / dt)
    return best


def main():
    import jax
    from fmcw_tpu import RadarParams
    from fmcw_tpu.golden import reference
    from fmcw_tpu.models import pipeline as pl

    p = RadarParams()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    frame = pl.complex_to_iq(reference.two_target_frame(p))
    # 128 frames in flight amortizes the tunnel's per-dispatch latency
    # (~2-4 ms) the way the FPGA's streaming ingest amortizes its pipeline
    # fill; measured ~30% over batch 32 at identical per-frame compute.
    batch_size = 128
    # Distinct noise per frame so no degenerate constant folding.
    batch = np.stack([frame] * batch_size)
    batch = batch + rng.integers(-8, 8, batch.shape).astype(np.int16)
    batch_dev = jax.device_put(batch)

    import dataclasses
    p_block = p.replace(cfar=dataclasses.replace(p.cfar, scale_mode="block"))

    results = {}
    configs = [
        ("pallas-cfar/matmul-HIGH", p, dict(fft_method="matmul",
                                            frontend="xla",
                                            precision=jax.lax.Precision.HIGH,
                                            cfar_method="auto")),
        # Fused Pallas front-end with the reference-exact per-cell adaptive
        # scale: iq -> detections in ONE VMEM-resident kernel.
        ("pallas-frontend+fused-detect-percell/HIGH", p,
         dict(frontend="pallas", precision=jax.lax.Precision.HIGH,
              cfar_method="auto")),
        # Same fused kernel with the clutter-map (block-granular) adaptive
        # scale (design_notes §8) — the fastest configuration; parity-gated
        # against the per-cell config's detections at runtime below.
        ("pallas-frontend+fused-detect/HIGH", p_block,
         dict(frontend="pallas", precision=jax.lax.Precision.HIGH,
              cfar_method="auto")),
        # Bit-faithful fixed-point mode on its fused kernel (opt-in path;
        # different detector numerics — never headline-eligible, logged so
        # the recorded bench shows the parity-mode speed).
        ("fixed-fused-pallas", p,
         dict(mode="fixed", frontend="pallas", cfar_method="auto",
              _headline=False)),
    ]
    if "--sweep" in sys.argv:
        # The XLA-front-end configs pin frontend="xla": under the "auto"
        # default they would silently resolve to the fused Pallas kernel on
        # TPU and mislabel what they measure.
        p_ca = p.replace(cfar=dataclasses.replace(p.cfar, variant="ca",
                                                  scale_mode="block"))
        configs += [
            # Fused CA-CFAR variant: a DIFFERENT detector — excluded from
            # the headline by the _headline=False flag (the frame-0
            # range_bin parity probe can pass coincidentally on the golden
            # frame); logged for the BASELINE config-4 variant sweep.
            # Measured ~+10-25% over the fused OS config (box-sum estimate,
            # no rank counting pass).
            ("pallas-frontend+fused-detect-ca/HIGH", p_ca,
             dict(frontend="pallas", precision=jax.lax.Precision.HIGH,
                  cfar_method="auto", _headline=False)),
            ("pallas-cfar-blockscale/ct-HIGH", p_block,
             dict(fft_method="ct", precision=jax.lax.Precision.HIGH,
                  frontend="xla", cfar_method="auto")),
            # A/B: same front-end kernel but CFAR as a standalone dispatch
            # (mag map round-trips HBM).
            ("pallas-frontend-unfused/HIGH", p_block,
             dict(frontend="pallas", precision=jax.lax.Precision.HIGH,
                  cfar_method="auto", fuse_detect=False)),
            # cfar_method="xla" materializes the per-cell training windows
            # (~67 MB/frame) — batch 128 overflows the 16 GB HBM, so this
            # reference config runs at batch 32.
            ("xla-cfar/matmul-HIGH@b32", p, dict(
                fft_method="matmul", precision=jax.lax.Precision.HIGH,
                frontend="xla", cfar_method="xla", _batch=32)),
            ("pallas-cfar/matmul-HIGHEST", p, dict(
                fft_method="matmul", precision=jax.lax.Precision.HIGHEST,
                frontend="xla", cfar_method="auto")),
            ("pallas-cfar/xla-fft", p, dict(fft_method="xla",
                                            precision=jax.lax.Precision.HIGH,
                                            frontend="xla",
                                            cfar_method="auto")),
            # Bit-faithful fixed-point XLA chain — the A/B reference for the
            # always-run fixed-fused-pallas config (measured ~+70-85%
            # same-run for the fused kernel).
            ("fixed-xla", p, dict(mode="fixed", frontend="xla",
                                  cfar_method="auto", _headline=False)),
        ]
    def det_set(out, frame=0):
        """Frame-``frame`` detection set {(range_bin, doppler_bin, mag)}."""
        v = out["valid"][frame]
        return set(zip(out["range_bin"][frame][v].tolist(),
                       out["doppler_bin"][frame][v].tolist(),
                       out["mag"][frame][v].tolist()))

    # Documented float tolerance: the fused kernel's bf16x3 FFT error is
    # ABSOLUTE at the scale of the slow-time accumulation — i.e. it scales
    # with the MAP PEAK, not with each cell's own magnitude (measured
    # 8.8e-6 of peak worst-case across the frame-0 top-64 on hardware;
    # docs/PERF_LOG.md r4).  1e-4 of peak gives ~10x margin.
    FLOAT_MAG_PEAK_RTOL = 1e-4

    def float_gate(out, ref):
        """Strict float detection-set gate vs the per-cell reference config
        (frame 0): positions exactly equal — no missing AND no extra
        detections — and every magnitude within FLOAT_MAG_PEAK_RTOL of the
        map peak.  One allowance: the extractor keeps the top-64
        detections of ~750 passing cells, so near-equal noise cells can
        legitimately swap across the rank-64 cutoff under the peak-scaled
        magnitude jitter; positions disagreeing ONLY within that tolerance
        of the cutoff magnitude are accepted (and logged)."""
        gm = {(r, d): m for r, d, m in det_set(out)}
        rm = {(r, d): m for r, d, m in det_set(ref)}
        peak = max(rm.values(), default=1.0)
        tol = FLOAT_MAG_PEAK_RTOL * abs(peak)
        mags_ok = all(abs(gm[k] - rm[k]) <= tol
                      for k in gm.keys() & rm.keys())
        diff = gm.keys() ^ rm.keys()
        if not diff:
            return mags_ok
        cutoff = min(min(gm.values(), default=0.0),
                     min(rm.values(), default=0.0))
        boundary = all(
            abs((gm.get(k) if k in gm else rm[k]) - cutoff) <= tol
            for k in diff)
        if boundary:
            log(f"  float gate: {len(diff)} top-64 boundary swaps within "
                f"{tol:.1f} of cutoff {cutoff:.1f} (accepted)")
        return mags_ok and boundary

    ref_out = None
    fixed_ref = None
    for name, p_cfg, kw in configs:
        try:
            kw = dict(kw)
            sub = kw.pop("_batch", None)
            mode = kw.pop("mode", "float32")
            headline = kw.pop("_headline", True)
            bd = batch_dev if sub is None else jax.device_put(batch[:sub])
            proc = pl.make_batch_processor(p_cfg, mode=mode,
                                           include_maps=False, **kw)
            fps = bench_config(proc, bd)
            out = jax.tree.map(np.asarray, proc(bd))
            if mode == "fixed":
                # The fixed fused kernel's contract is detection-SET parity
                # vs the fixed XLA chain — same positions, magnitudes within
                # the compounded BFP-quantize tolerance (<=1 LSB per FFT
                # stage, a few LSB at the map level after the slow-time
                # gain; tests/test_frontend_fixed.py pins the full
                # contract) — NOT the float per-cell reference config.
                # Detected (strong-cell) magnitudes stay within 2 LSB; gate
                # against the fixed-XLA chain's frame-0 detections,
                # computed once per run.
                if fixed_ref is None:
                    fproc = pl.make_processor(p_cfg, mode="fixed",
                                              frontend="xla",
                                              cfar_method="auto",
                                              include_maps=False)
                    fout = jax.tree.map(np.asarray, fproc(batch[0]))
                    fixed_ref = det_set({k: v[None] for k, v in fout.items()})
                got = det_set(out)
                pos = lambda s: {(r, d) for r, d, _ in s}
                mags = {(r, d): m for r, d, m in got}
                rmags = {(r, d): m for r, d, m in fixed_ref}
                ok = (pos(got) == pos(fixed_ref)
                      and all(abs(mags[k] - rmags[k]) <= 2 for k in mags))
            elif name == "pallas-cfar/matmul-HIGH":
                # The DESIGNATED float parity reference (the XLA chain with
                # the reference-exact per-cell scale) — by name, not "first
                # to succeed": if it fails, later configs must not silently
                # promote themselves to reference and pass ungated.
                ref_out = out
                ok = True
            elif ref_out is None:
                ok = False
                log(f"{name}: parity UNVERIFIED (reference config failed)")
            else:
                ok = float_gate(out, ref_out)
            percell = p_cfg.cfar.scale_mode == "cell" and mode != "fixed"
            results[name] = (fps, ok, headline, percell)
            log(f"{name}: {fps:.1f} frames/s  detection-parity={ok}")
        except Exception as e:  # pragma: no cover
            log(f"{name}: FAILED {type(e).__name__}: {e}")

    best = max((fps for fps, ok, headline, _ in results.values()
                if ok and headline), default=0.0)
    # Reference-semantics figure: fastest per-cell adaptive-scale config
    # (the exact os_cfar_2d.vhd:187-199 classification).  The overall best
    # rides the block-granular clutter-map scale — a framework extension
    # with no VHDL counterpart — so the artifact records both.
    best_percell = max((fps for fps, ok, headline, pc in results.values()
                        if ok and headline and pc), default=0.0)

    # --- Rooflines (BASELINE north star, recorded + regression-gated) ---
    # Achieved op/s and bytes/s from the documented per-frame op models
    # (fmcw_tpu/utils/roofline.py), gated against the recorded best in
    # docs/rooflines.json.  Two kernels: the fused front-end+detect (from
    # its measured frames/s above) and the standalone counting CFAR kernel
    # (its own device-resident micro-bench below — synthetic gamma-noise
    # maps; the kernel's cost is data-independent).
    from fmcw_tpu.utils import roofline as RL
    roofline = {}
    try:
        # Only a PARITY-VERIFIED fused run may feed the persistent record:
        # a faster-but-wrong run would otherwise raise the regression bar
        # with a non-parity number, and substituting another config's fps
        # would mislabel the op/byte model.  Missing/failed fused config ->
        # no fused_detect entry -> roofline_ok False (the right signal).
        fused = results.get("pallas-frontend+fused-detect/HIGH")
        if fused and fused[1]:
            ach = RL.achieved(RL.fused_detect_model(p_block), fused[0])
            roofline["fused_detect"] = {
                **ach, **RL.gate("fused_detect", ach)}

        from fmcw_tpu.ops.cfar_pallas import cfar_2d_pallas_detect
        import jax.numpy as jnp
        cfn = jax.jit(jax.vmap(lambda m: jnp.sum(
            cfar_2d_pallas_detect(m, 0, cfar=p.cfar, integer=False)[0]
            > 0)))
        maps = rng.gamma(2.0, 80.0,
                         (64, p.n_range, p.n_doppler)).astype(np.float32)
        maps_dev = jax.device_put(maps)
        np.asarray(cfn(maps_dev)).sum()            # compile + warm
        best_rate = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                c = cfn(maps_dev)
            np.asarray(c).sum()
            dt = time.perf_counter() - t0
            best_rate = max(best_rate, 64 * 4 / dt)
        log(f"cfar kernel micro-bench: {best_rate:.1f} maps/s (per-cell OS)")
        ach = RL.achieved(RL.cfar_detect_model(p), best_rate)
        roofline["cfar_detect"] = {**ach, **RL.gate("cfar_detect", ach)}
    except Exception as e:  # pragma: no cover
        log(f"roofline: FAILED {type(e).__name__}: {e}")
    roofline_ok = all(v.get("ok", False) for v in roofline.values()) \
        and len(roofline) == 2

    print(json.dumps({
        "metric": "radar frames/s per chip (range-Doppler+CFAR, 1024x128)",
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(best / BASELINE_FPS, 3),
        "value_percell": round(best_percell, 1),
        "vs_baseline_percell": round(best_percell / BASELINE_FPS, 3),
        "roofline": roofline,
        "roofline_ok": roofline_ok,
    }), flush=True)


if __name__ == "__main__":
    main()

"""Roofline accounting for the hot kernels (BASELINE north star:
"kernels HBM-bandwidth/compute-bound").

The bench artifact (BENCH_rN.json) carried only frames/s; this module turns
a measured rate into *achieved op/s and bytes/s against hardware peaks* so
the speed-of-light claim is a regression-gated number instead of prose
(round-5 verdict item 3).  Op/byte models are stated explicitly below and
follow docs/PERF_LOG.md's derivations; peaks are the published TPU v5e
figures.

Two kernels are modeled:

* ``fused_detect`` — the fully-fused front-end+detect kernel
  (ops/frontend_pallas.py, the headline config).  Its MXU work is the
  bf16x3 Cooley-Tukey range FFT + fused slow-time operator; its VPU work
  is dominated by the in-kernel CFAR counting epilogue; its HBM traffic is
  just the int16 frame in and the det slices + row maxes out (everything
  else lives in VMEM).
* ``cfar_detect`` — the standalone counting CFAR kernel
  (ops/cfar_pallas.cfar_2d_pallas_detect): VPU-bound by construction
  (PERF_LOG: ~2T op-equiv/s, tile-size-sweeped); HBM traffic is one map
  read + one det map write.

"Peak" for the VPU is the theoretical 8x128-lane x 4-op/cycle figure; the
counting kernel's own measured ceiling is ~50-55% of that (predicated
compares and rolls don't dual-issue — see PERF_LOG), so ``peak_frac``
against the recorded best (docs/rooflines.json) is the regression gate and
the hardware fraction is context.
"""

from __future__ import annotations

import json
import os

from ..params import RadarParams

# Published TPU v5e per-chip peaks.
PEAK_BF16_FLOPS = 197e12        # MXU, bf16
PEAK_HBM_BYTES = 819e9          # HBM bandwidth
PEAK_VPU_OPS = 8 * 128 * 4 * 0.94e9   # (8,128) VPU, 4 ALU ops/cycle @940MHz


def fused_detect_model(p: RadarParams, emit_mag: bool = False) -> dict:
    """Per-frame op/byte model of the fused front-end+detect kernel
    (float32, block or cell scale).

    MXU MACs (frontend_pallas.py header): 4 real matmuls per complex
    contraction x 3 bf16 passes x (range inner DFT nd*nr*n1 + slow-time
    nr*nd*nd — the long-CPI split caps the second factor at 128).
    VPU op-equivalents: window+outer-DFT+twiddle ~ (4*n2 + 6) mul-adds per
    input sample, magnitude ~4/cell, CFAR counting 2 ops (cmp+add) per
    reference cell per pass (block scale: 1 counting pass + block stats;
    cell scale: mean pass + 2-threshold classify + counting ~ 5x, see
    PERF_LOG).  HBM bytes: int16 I/Q in, f32 det slices + row maxes out
    (+ f32 mag out when emit_mag)."""
    nr, nd = p.n_range, p.n_doppler
    n1 = min(nr, 128)
    n1d = min(nd, 128)
    cells = nr * nd
    macs = 4 * 3 * (nd * nr * n1 + nr * nd * n1d)
    mxu_flops = 2 * macs
    n2 = nr // n1
    front_vpu = cells * (4 * n2 + 6) + 4 * cells
    n_ref = p.cfar.n_ref
    if p.cfar.scale_mode == "block":
        cfar_vpu = cells * (2 * n_ref + 30)
    else:
        sep = 2 * (p.cfar.win_range + 2 * p.cfar.win_doppler)  # box sums
        cfar_vpu = cells * (sep + 4 * n_ref + 2 * n_ref + 20)
    vpu_ops = front_vpu + cfar_vpu
    bytes_ = cells * 2 * 2 + cells * 4 + (nr // n1) * n1 * 4
    if emit_mag:
        bytes_ += cells * 4
    return {"mxu_flops": mxu_flops, "vpu_ops": vpu_ops, "hbm_bytes": bytes_}


def cfar_detect_model(p: RadarParams) -> dict:
    """Per-map op/byte model of the standalone counting CFAR kernel
    (cfar_2d_pallas_detect, per-cell OS): separable mean box sums +
    hi/lo classification (2 passes x cmp+add per ref) + q_min probing +
    detection counting (cmp+add per ref) — PERF_LOG's ~1000
    op-equivalents/cell at the default 13x11 window."""
    cells = p.n_range * p.n_doppler
    n_ref = p.cfar.n_ref
    sep = 2 * (p.cfar.win_range + 2 * p.cfar.win_doppler)
    ops = cells * (sep + 4 * n_ref + 2 * n_ref + 20)
    bytes_ = cells * 4 * 2            # mag in + det out (f32)
    return {"mxu_flops": 0, "vpu_ops": ops, "hbm_bytes": bytes_}


def achieved(model: dict, rate_per_s: float) -> dict:
    """Rates x model -> achieved figures + hardware-peak fractions."""
    out = {
        "mxu_tflops": round(model["mxu_flops"] * rate_per_s / 1e12, 2),
        "vpu_tops": round(model["vpu_ops"] * rate_per_s / 1e12, 3),
        "hbm_gbps": round(model["hbm_bytes"] * rate_per_s / 1e9, 2),
        "frac_mxu_peak": round(model["mxu_flops"] * rate_per_s
                               / PEAK_BF16_FLOPS, 4),
        "frac_vpu_peak": round(model["vpu_ops"] * rate_per_s
                               / PEAK_VPU_OPS, 4),
        "frac_hbm_peak": round(model["hbm_bytes"] * rate_per_s
                               / PEAK_HBM_BYTES, 4),
    }
    out["bound_by"] = max(
        (("mxu", out["frac_mxu_peak"]), ("vpu", out["frac_vpu_peak"]),
         ("hbm", out["frac_hbm_peak"])), key=lambda kv: kv[1])[0]
    return out


_BESTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "docs", "rooflines.json")


def gate(name: str, ach: dict, threshold: float = 0.5,
         bests_path: str | None = None) -> dict:
    """Regression gate vs the recorded best (docs/rooflines.json): compares
    this run's dominant-resource peak fraction against the best ever
    recorded for ``name``; records a new best when exceeded.  Returns
    {"peak_frac", "best", "frac_of_best", "ok"} — ``ok`` False means the
    kernel regressed below ``threshold`` x its recorded capability.

    The threshold is set at the tunnel's measured whole-phase floor, not a
    tight band: even best-of-reps rates on UNCHANGED kernels have measured
    0.55x of the recorded best across runs (PERF_LOG round 5: the same
    monolithic fused kernel at 15.6k fps in tools/split_ab.py's phase vs
    the 28.6k record), so a tighter gate would flag the network phase, not
    the kernel.  A genuine formulation regression (e.g. a kernel silently
    falling off its fused path to an XLA chain, historically a ~2x drop
    compounding with phase) still trips it; ``frac_of_best`` is recorded
    either way so drift inside the band stays visible in BENCH_rN."""
    path = bests_path or _BESTS
    try:
        with open(path) as fh:
            bests = json.load(fh)
    except (OSError, ValueError):
        bests = {}
    rec = bests.get(name, {})
    # Gate on the RECORDED regime's resource: if this run's op/byte model
    # resolves to a different bound_by than the record (params/emit flags
    # changed), comparing the new resource against a never-recorded key
    # would auto-pass and overwrite the record — exactly when the gate
    # should look hardest.  The current run always carries all three
    # fractions, so the recorded resource is always comparable.
    gate_by = rec.get("bound_by", ach["bound_by"])
    key = "frac_" + gate_by + "_peak"
    frac = ach[key]
    best = rec.get(key, 0.0)
    if frac > best:
        entry = {k: v for k, v in ach.items() if k.startswith("frac_")}
        entry["bound_by"] = ach["bound_by"]
        bests[name] = entry
        try:
            with open(path, "w") as fh:
                json.dump(bests, fh, indent=1)
        except OSError:
            pass
        best = frac
    return {"peak_frac": ach["frac_" + ach["bound_by"] + "_peak"],
            "gated_on": gate_by, "best": best,
            "frac_of_best": round(frac / best, 3) if best else 1.0,
            "ok": best == 0.0 or frac >= threshold * best}

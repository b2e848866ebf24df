"""Pd/Pfa detection-quality sweep CLI (BASELINE config 4 flavor).

    python tools/detection_eval.py [--full] [--trials N] [--cpu]
                                   [--variants os,ca,go,so] [--json OUT]

Prints a Pd-vs-SNR / Pfa table per CFAR variant (fmcw_tpu/utils/eval.py).
Quick mode (default, 256x64 map) runs in ~a minute on CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full 1024x128 CPI (default: 256x64)")
    ap.add_argument("--trials", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default="os,ca,go,so")
    ap.add_argument("--scale-mode", default="cell", choices=["cell", "block"])
    ap.add_argument("--json", default=None, metavar="OUT")
    ap.add_argument("--artifact", default=None, metavar="OUT",
                    help="write the canonical pinned eval artifact "
                         "(EVAL.json): 256x64 map, seed 0, both scale "
                         "modes, all variants — the committed detector-"
                         "quality regression baseline "
                         "(tests/test_eval_bounds.py diffs against it)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from fmcw_tpu import RadarParams, CfarParams
    from fmcw_tpu.utils import eval as ev

    if args.artifact:
        import math
        from fmcw_tpu.golden.fixed_point import hw_stream_lag
        spec = dict(n_range=256, n_doppler=64, trials=64, noise_trials=32,
                    seed=0, sigma=64.0, tolerance=1, mti_bypass=True,
                    snr_dbs=[-35, -30, -27, -24, -21, -18])
        art = {"spec": spec, "results": {}}
        for mode in ("cell", "block"):
            cfar = CfarParams(scale_mode=mode, scale_block=2)
            p = RadarParams(n_range=spec["n_range"],
                            n_doppler=spec["n_doppler"], cfar=cfar)
            res = ev.pd_pfa(p, variants=("os", "ca", "go", "so"),
                            trials=spec["trials"],
                            noise_trials=spec["noise_trials"],
                            seed=spec["seed"], sigma=spec["sigma"],
                            tolerance=spec["tolerance"],
                            snr_dbs=tuple(spec["snr_dbs"]))
            art["results"][mode] = {
                v: {"pfa": r["pfa"],
                    "pd": {str(k): pd for k, pd in r["pd"].items()}}
                for v, r in res.items()}
            print(f"--- scale_mode={mode} ---")
            print(ev.format_table(res))
        # The as-built (hw-compat) detector: crossed-axis streaming
        # geometry at label coordinates — truth matching compensates the
        # -3-cell label offset, placement avoids the one-shot framing's
        # never-emitted tail rows (utils/eval.pd_pfa docstring).
        p_hw = RadarParams(n_range=spec["n_range"],
                           n_doppler=spec["n_doppler"], cfar=CfarParams())
        margin = math.ceil(hw_stream_lag(p_hw.cfar, p_hw.n_doppler)
                           / p_hw.n_doppler) + 1
        res = ev.pd_pfa(p_hw, variants=("os",), trials=spec["trials"],
                        noise_trials=spec["noise_trials"],
                        seed=spec["seed"], sigma=spec["sigma"],
                        tolerance=spec["tolerance"],
                        snr_dbs=tuple(spec["snr_dbs"]),
                        processor_kw={"cfar_geometry": "hw_stream"},
                        truth_doppler_offset=-3, range_hi_margin=margin)
        art["results"]["hw_stream"] = {
            v: {"pfa": r["pfa"],
                "pd": {str(k): pd for k, pd in r["pd"].items()}}
            for v, r in res.items()}
        print("--- hw-compat (as-built streaming geometry) ---")
        print(ev.format_table(res))
        # The angle-extended (3D, ref_angle=1) detector: 8-element ULA ->
        # 8 beams, training set spans neighbor beams.  SNRs are
        # PER-ELEMENT and shifted ~9 dB below the 2D spec's (the 8-element
        # array gain), so the curves probe the same detector operating
        # region (utils/eval.pd_pfa_3d docstring).
        spec3d = dict(n_elems=8, n_beams=8, ref_angle=1, guard_angle=0,
                      trials=32, noise_trials=16,
                      snr_dbs=[-44, -40, -36, -33, -30, -27])
        art["spec_3d"] = spec3d
        p3 = RadarParams(n_range=spec["n_range"],
                         n_doppler=spec["n_doppler"], cfar=CfarParams())
        res = ev.pd_pfa_3d(p3, n_elems=spec3d["n_elems"],
                           n_beams=spec3d["n_beams"],
                           ref_angle=spec3d["ref_angle"],
                           guard_angle=spec3d["guard_angle"],
                           trials=spec3d["trials"],
                           noise_trials=spec3d["noise_trials"],
                           seed=spec["seed"], sigma=spec["sigma"],
                           tolerance=spec["tolerance"],
                           snr_dbs=tuple(spec3d["snr_dbs"]))
        art["results"]["angle_ref1"] = {
            v: {"pfa": r["pfa"],
                "pd": {str(k): pd for k, pd in r["pd"].items()}}
            for v, r in res.items()}
        print("--- angle-extended 3D (ref_angle=1, per-element SNR) ---")
        print(ev.format_table(res))
        with open(args.artifact, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {args.artifact}", file=sys.stderr)
        return

    cfar = CfarParams(scale_mode=args.scale_mode,
                      scale_block=8 if args.full else 2)
    p = (RadarParams(cfar=cfar) if args.full
         else RadarParams(n_range=256, n_doppler=64, cfar=cfar))
    res = ev.pd_pfa(p, variants=tuple(args.variants.split(",")),
                    trials=args.trials)
    print(ev.format_table(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({v: {"pfa": r["pfa"],
                           "pd": {str(k): pd for k, pd in r["pd"].items()}}
                       for v, r in res.items()}, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()

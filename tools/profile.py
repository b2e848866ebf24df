#!/usr/bin/env python
"""Profiling harness: capture a jax profiler trace of the radar pipeline.

The reference's observability is waveform dumps + report statements
(SURVEY.md §5); the TPU equivalent is an XLA/TPU profiler trace viewable in
TensorBoard/Perfetto, plus the pipeline's built-in debug taps
(``include_debug=True`` -> threshold/scale maps) and sanitization counters
(saturation_count, nonfinite_count).

Usage:
  python tools/profile.py [--out /tmp/radar_trace] [--batch 32] [--iters 5]
                          [--mode float32|fixed] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/radar_trace")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", default="float32", choices=["float32", "fixed"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    import fmcw_tpu
    from fmcw_tpu.golden import reference
    from fmcw_tpu.models import pipeline as pl

    p = fmcw_tpu.full()
    base = pl.complex_to_iq(reference.two_target_frame(p))
    batch = jax.device_put(np.stack([base] * args.batch))
    proc = pl.make_batch_processor(p, mode=args.mode, include_maps=False)
    out = proc(batch)
    np.asarray(out["n_dets"])  # compile + warm outside the trace

    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = proc(batch)
        np.asarray(out["n_dets"])
    print(f"trace written to {args.out} "
          f"(view: tensorboard --logdir {args.out})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Single-frame latency benchmark.

The throughput bench (bench.py) measures steady-state frames/s with many
frames in flight; this tool measures the other reference headline — pipeline
latency (BASELINE.md: 1 CPI corner-turn fill + pipeline stages + 776-cell
CFAR startup; at 200 MHz that is ~655 us + epsilon from ADC to detections).
Here: wall time from a host-resident int16 frame to detections back on the
host, one frame at a time, nothing overlapped.

Usage: python tools/latency_bench.py [--reps 50] [--cpu] [--mode float32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mode", default="float32", choices=["float32", "fixed"])
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
    proc = pl.make_processor(p, mode=args.mode, include_maps=False)
    frame = pl.complex_to_iq(reference.two_target_frame(p))
    rng = np.random.default_rng(0)

    # Warm (compile) with a couple of frames.
    for _ in range(2):
        out = proc(frame)
        np.asarray(out["n_dets"])

    lat = []
    for _ in range(args.reps):
        f = frame + rng.integers(-4, 4, frame.shape).astype(np.int16)
        t0 = time.perf_counter()
        out = proc(f)                    # host->device + compute dispatch
        n = int(np.asarray(out["n_dets"]))   # detections back on host
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat) * 1e3
    print(f"single-frame latency over {args.reps} reps (ms): "
          f"p50={np.percentile(lat, 50):.2f} p90={np.percentile(lat, 90):.2f} "
          f"min={lat.min():.2f}  [reference budget ~0.66 ms + pipeline; "
          f"tunneled-TPU numbers include ~2-4 ms dispatch RTT]")


if __name__ == "__main__":
    main()

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
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(proc, frame, reps):
    import numpy as np
    rng = np.random.default_rng(0)
    # Warm (compile) with a couple of frames.
    for _ in range(2):
        np.asarray(proc(frame)["n_dets"])
    lat = []
    for _ in range(reps):
        f = frame + rng.integers(-4, 4, frame.shape).astype(np.int16)
        t0 = time.perf_counter()
        out = proc(f)                        # host->device + compute dispatch
        int(np.asarray(out["n_dets"]))       # detections back on host
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat) * 1e3
    return {"p50_ms": round(float(np.percentile(lat, 50)), 3),
            "p90_ms": round(float(np.percentile(lat, 90)), 3),
            "min_ms": round(float(lat.min()), 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mode", default=None, choices=[None, "float32", "fixed"],
                    help="one mode only (default: sweep both)")
    ap.add_argument("--out", default=None,
                    help="write a JSON artifact (e.g. LATENCY.json)")
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
    frame = pl.complex_to_iq(reference.two_target_frame(p))
    modes = [args.mode] if args.mode else ["float32", "fixed"]
    results = {}
    for mode in modes:
        proc = pl.make_processor(p, mode=mode, include_maps=False)
        results[mode] = measure(proc, frame, args.reps)
        r = results[mode]
        print(f"{mode}: single-frame latency over {args.reps} reps (ms): "
              f"p50={r['p50_ms']:.2f} p90={r['p90_ms']:.2f} "
              f"min={r['min_ms']:.2f}")
    print("[reference budget ~0.66 ms CPI fill + pipeline; tunneled-TPU "
          "numbers include ~2-4 ms dispatch RTT — see methodology note]")
    if args.out:
        artifact = {
            "what": "host int16 frame -> detections on host, one frame at a "
                    "time, nothing overlapped (1024x128 CPI)",
            "platform": str(jax.devices()[0]),
            "reps": args.reps,
            "results": results,
            "methodology_caveat": (
                "the axon TPU is reached over a network tunnel with ~2-4 ms "
                "per-dispatch RTT and ~30-60 MB/s H2D, which dominates these "
                "numbers; on-device compute is ~35-70 us/frame (bench.py "
                "steady state).  A locally-attached TPU would measure "
                "~RTT-free: PCIe ingest ~50 us + compute + readback.  The "
                "reference hardware's latency floor is 1 CPI (655 us) of "
                "corner-turn fill + pipeline + 776-cell CFAR startup "
                "(rtl/old/radar_core_v2.vhd:16-20, os_cfar_2d.vhd:66-68): "
                "streaming beats batching on latency; batching wins "
                "~20x on throughput per chip."),
        }
        with open(args.out, "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Long-CPI (BASELINE config 2) same-run A/B on hardware (stderr log).

Measures per-sample throughput of the fused pipeline at the 1024x128
control vs the 1024x256 long-CPI shape in ONE run (the tunnel's phase
swings make cross-run ratios meaningless), with a detection-parity gate
per config (fused vs the XLA chain on frame 0).  The r4 Doppler split
(ops/frontend_pallas._ct_split_rows) activates automatically at 256
chirps and has no opt-out — the dense-operator baseline is the r2
recorded 74% per-sample efficiency (docs/PERF_LOG.md "256-chirp CPI");
the r4 split measured 1.09 (same file).

Run: python tools/longcpi_ab.py [--batch 128] [--batch-long 128]
(both default to 128 — the r4 batch sweep's operating point for BOTH
shapes; note the long shape's frames are 2x the size at the same batch.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import dataclasses

    import jax

    from fmcw_tpu import RadarParams
    from fmcw_tpu.golden import reference
    from fmcw_tpu.models import pipeline as pl

    import argparse
    ap = argparse.ArgumentParser(description="Long-CPI same-run A/B")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batch-long", type=int, default=128)
    args = ap.parse_args()
    b_ctrl, b_long = args.batch, args.batch_long
    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(0)

    def make(nd, batch):
        p = RadarParams(n_doppler=nd)
        p = p.replace(cfar=dataclasses.replace(p.cfar, scale_mode="block"))
        frame = pl.complex_to_iq(reference.two_target_frame(p))
        b = np.stack([frame] * batch)
        b = b + rng.integers(-8, 8, b.shape).astype(np.int16)
        return p, jax.device_put(b), b

    def sync(out):
        return np.asarray(out["n_dets"]).sum()

    def bench(proc, bd, iters=12, reps=4):
        out = proc(bd)
        sync(out)
        sync(proc(bd))
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = proc(bd)
            sync(out)
            best = max(best, bd.shape[0] * iters / (time.perf_counter() - t0))
        return best

    results = {}
    for nd, batch in ((128, b_ctrl), (256, b_long)):
        p, bd, bh = make(nd, batch)
        proc = pl.make_batch_processor(p, mode="float32", include_maps=False,
                                      frontend="pallas")
        t0 = time.perf_counter()
        fps = bench(proc, bd)
        log(f"nd={nd}: measured in {time.perf_counter() - t0:.0f}s")
        gsps = fps * p.n_range * nd / 1e9
        # Parity gate: fused frame-0 detections vs the XLA chain (positions
        # set-equal up to top-64 boundary ties, bench.py's contract).
        xproc = pl.make_processor(p, mode="float32", frontend="xla",
                                  include_maps=False)
        a = jax.tree.map(np.asarray, proc(bd[:1]))
        x = jax.tree.map(np.asarray, xproc(bh[0]))
        da = set(zip(a["range_bin"][0][a["valid"][0]].tolist(),
                     a["doppler_bin"][0][a["valid"][0]].tolist()))
        dx = set(zip(x["range_bin"][x["valid"]].tolist(),
                     x["doppler_bin"][x["valid"]].tolist()))
        flips = len(da ^ dx)
        ok = bool(da and flips <= max(2, len(da) // 8))
        results[nd] = (fps, gsps, ok)
        log(f"1024x{nd} @batch {batch}: {fps:.1f} frames/s = "
            f"{gsps:.3f} Gsamples/s  parity={ok} (set flips {flips})")

    eff = results[256][1] / results[128][1]
    log(f"per-sample efficiency 256-chirp vs 128-chirp: {eff:.3f} "
        f"(r2 dense operator measured 0.74; target >= 0.90)")


if __name__ == "__main__":
    main()

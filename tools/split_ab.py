#!/usr/bin/env python
"""Same-run A/B: split fused pipeline (kernel A + kernel B back-to-back,
sp=1-equivalent) vs the monolithic fused kernel, on the real TPU.

The round-5 acceptance bar for the sp>1 split (ops/split_frontend.py) is
that running kernels A+B back-to-back on one chip lands within ~10-15% of
the monolithic kernel — i.e. the split costs only its extra HBM round trip
(kernel A's output + the de-interleave + kernel B's input, ~4 MB/frame),
not a formulation regression.  An sp-sharded mesh then runs at per-chip
kernel speed instead of the ~2x-slower XLA stage chain.

Also asserts the bit-exactness contract on hardware: the split path's
detection set must equal the monolithic kernel's exactly (positions AND
magnitudes) — the same invariant tests/test_split_frontend.py pins in
interpret mode.

Usage: python tools/split_ab.py [--batch 128] [--iters 12] [--reps 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pgr", type=int, default=2,
                    help="peak_group_radius for both paths")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import fmcw_tpu
    from fmcw_tpu.golden import reference
    from fmcw_tpu.models import pipeline as pl
    from fmcw_tpu.ops import split_frontend as SF
    from fmcw_tpu.ops import detect as DET

    interp = jax.default_backend() != "tpu"
    p = fmcw_tpu.full()                      # per-cell OS, wrap — cell mode
    pgr = args.pgr
    rng = np.random.default_rng(0)
    frame = pl.complex_to_iq(reference.two_target_frame(p))
    batch = np.stack([frame] * args.batch)
    batch = batch + rng.integers(-8, 8, batch.shape).astype(np.int16)
    batch_dev = jax.device_put(batch)
    max_dets = p.tracker.max_dets

    # Monolithic fused (the single-chip production path).
    mono = pl.make_batch_processor(p, mode="float32", frontend="pallas",
                                   include_maps=False,
                                   peak_group_radius=pgr)

    # Split path, sp=1-equivalent: kernel A -> deinterleave -> kernel B
    # with self-halo (exactly the per-chip work of an sp>1 mesh, minus the
    # collective), + the same top-K extraction.
    n2l = p.n_range // 128

    @jax.jit
    def split_proc(iq, byp, so):
        def one(fr):
            det_s, _, nf, rmax, ndets = SF.split_frontend_frame(
                fr, byp, so, cfar=p.cfar, peak_group_radius=pgr,
                notch_mode=p.notch_mode, interpret=interp)
            ndl = det_s.shape[2]
            out = DET.topk_detections(det_s.reshape(-1, ndl),
                                      max_dets=max_dets, row_max=rmax,
                                      n_dets=ndets)
            return SF.split_topk_remap(out, n2l, det_s.shape[0] // n2l)
        return jax.vmap(one)(iq)

    def run_split(b):
        return split_proc(b, jnp.asarray(False), jnp.asarray(0, jnp.int32))

    def sync(out):
        return np.asarray(out["n_dets"]).sum()

    def det_set(out, i=0):
        v = np.asarray(out["valid"][i])
        return set(zip(np.asarray(out["range_bin"][i])[v].tolist(),
                       np.asarray(out["doppler_bin"][i])[v].tolist(),
                       np.asarray(out["mag"][i])[v].tolist()))

    om = mono(batch_dev)
    sync(om)
    os_ = run_split(batch_dev)
    sync(os_)
    om = jax.tree.map(np.asarray, mono(batch_dev))
    os_ = jax.tree.map(np.asarray, run_split(batch_dev))
    exact = all(det_set(om, i) == det_set(os_, i)
                for i in range(min(4, args.batch)))
    print(f"bit-exact detection parity (4 frames): {exact}", file=sys.stderr)
    assert exact, "split path diverged from the monolithic fused kernel"

    def bench(fn):
        best = 0.0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(batch_dev)
            sync(out)
            dt = time.perf_counter() - t0
            best = max(best, args.batch * args.iters / dt)
        return best

    # Interleave A/B reps to share tunnel weather.
    fps_mono = bench(mono)
    fps_split = bench(run_split)
    fps_mono = max(fps_mono, bench(mono))
    fps_split = max(fps_split, bench(run_split))
    ratio = fps_split / fps_mono
    print(f"monolithic fused: {fps_mono:.1f} frames/s", file=sys.stderr)
    print(f"split A+B (sp=1-equivalent): {fps_split:.1f} frames/s",
          file=sys.stderr)
    print(f"split/monolithic = {ratio:.3f} "
          f"(target >= ~0.85)", file=sys.stderr)
    rec = {"fps_monolithic": round(fps_mono, 1),
           "fps_split": round(fps_split, 1),
           "split_over_monolithic": round(ratio, 3),
           "bit_exact_parity": exact,
           "batch": args.batch, "pgr": pgr,
           "platform": str(jax.devices()[0])}
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(rec, fh, indent=1)


if __name__ == "__main__":
    main()

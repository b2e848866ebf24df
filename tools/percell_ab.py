"""A/B: per-cell fused-detect epilogue formulations on real TPU.

Measures the two-pass (classification pass + detection pass) vs merged
one-pass (shared load, 5 compares/ref) per-cell epilogues and the block
reference, same-run (VERDICT r2 #3).  One process, batched measurements.

Usage: python tools/percell_ab.py  (expects the axon TPU; ~3 compiles)
"""

import dataclasses
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from fmcw_tpu import RadarParams  # noqa: E402
from fmcw_tpu.golden import reference  # noqa: E402
from fmcw_tpu.models import pipeline as pl  # noqa: E402
from fmcw_tpu.ops import detect as DET  # noqa: E402
from fmcw_tpu.ops.frontend_pallas import rdm_frontend  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, batch, iters=16, reps=5):
    out = fn(batch)
    np.asarray(out["n_dets"]).sum()
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(batch)
        np.asarray(out["n_dets"]).sum()
        dt = time.perf_counter() - t0
        best = max(best, batch.shape[0] * iters / dt)
    return best


def make(p, onepass):
    max_dets = p.tracker.max_dets

    def one(iq, byp, so):
        det_s, _, nf, rmax, nd_ = rdm_frontend(
            iq, byp, cfar=p.cfar, detect=True, scale_override=so,
            emit_mag=False, percell_onepass=onepass)
        out = DET.topk_detections_sliced(det_s, max_dets=max_dets,
                                         row_max=rmax, n_dets=nd_)
        return out

    batched = jax.jit(jax.vmap(one, in_axes=(0, None, None)))
    return lambda b: batched(b, jnp.asarray(False), jnp.asarray(0, jnp.int32))


def main():
    p = RadarParams()                      # per-cell OS, full geometry
    p_block = p.replace(cfar=dataclasses.replace(p.cfar, scale_mode="block"))
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    frame = pl.complex_to_iq(reference.two_target_frame(p))
    batch = np.stack([frame] * 128)
    batch = batch + rng.integers(-8, 8, batch.shape).astype(np.int16)
    bd = jax.device_put(batch)

    results = {}
    configs = [
        ("percell-twopass", make(p, False)),
        ("percell-onepass", make(p, True)),
        ("block", make(p_block, False)),
    ]
    outs = {}
    for name, fn in configs:
        fps = bench(fn, bd)
        results[name] = fps
        outs[name] = jax.tree.map(np.asarray, fn(bd))
        log(f"{name}: {fps:.1f} frames/s")
    # parity: onepass == twopass detection sets on frame 0
    a, b = outs["percell-twopass"], outs["percell-onepass"]
    va, vb = a["valid"][0], b["valid"][0]
    same = (np.array_equal(a["range_bin"][0][va], b["range_bin"][0][vb])
            and np.array_equal(a["doppler_bin"][0][va],
                               b["doppler_bin"][0][vb]))
    log(f"onepass parity vs twopass: {same}")
    log(f"onepass/twopass: {results['percell-onepass']/results['percell-twopass']:.3f}")
    log(f"twopass/block:   {results['percell-twopass']/results['block']:.3f}")


if __name__ == "__main__":
    main()

"""A/B: hw-compat streaming-CFAR view layouts on real TPU.

The as-built (crossed-axis, flat-stream) CFAR parity mode originally built
its 128 training views as misaligned 1D dynamic_slices over the 131k-cell
stream — measured 10x slower than the named-geometry chain (docs/PERF_LOG.md,
round 3).  The 2D reformulation decomposes each flat shift dr*D + dc into a
row shift + lane shift with row carry (two static row-block slices + one
concat), which is the same shape of work the fast named-geometry slices do.

Measures, same-run on the axon TPU:
  * op-level: cfar_2d_hw_stream layout='flat' vs layout='2d' (batch 32,
    fixed-point maps, need_debug=False) + bit-equality of all outputs;
  * pipeline-level: the full mode='fixed' hw-compat chain (new default
    layout) vs the named-geometry fixed chain.

Usage: python tools/hwstream_ab.py   (expects the axon TPU; ~4 compiles)
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fmcw_tpu import RadarParams  # noqa: E402
from fmcw_tpu.golden import reference  # noqa: E402
from fmcw_tpu.models import pipeline as pl  # noqa: E402
from fmcw_tpu.ops import cfar as C  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, batch, barrier, iters=8, reps=5):
    barrier(fn(batch))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(batch)
        barrier(out)
        dt = time.perf_counter() - t0
        best = max(best, batch.shape[0] * iters / dt)
    return best


def main():
    p = RadarParams()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    frame = pl.complex_to_iq(reference.two_target_frame(p))
    batch = np.stack([frame] * 32)
    batch = batch + rng.integers(-8, 8, batch.shape).astype(np.int16)
    bd = jax.device_put(batch)

    # Realistic int32 magnitude maps for the op-level A/B: run the fixed
    # chain once with maps on.
    proc_maps = pl.make_processor(p, mode="fixed", include_maps=True)
    mags = np.stack([np.asarray(proc_maps(f)["mag_map"])
                     for f in batch[:4]] * 8)
    md = jax.device_put(mags)

    def make_op(method, layout="flat"):
        f = functools.partial(C.cfar_2d_hw_stream, cfar=p.cfar, integer=True,
                              need_debug=False, layout=layout, method=method)
        batched = jax.jit(jax.vmap(lambda m: f(m)[0]))
        # The TIMED variant reduces on device so the completion barrier
        # reads back one int64, not the ~16 MB of batch-32 det maps (the
        # CLAUDE.md small-readback rule — a full-map readback adds ~0.3-0.5s
        # of tunnel transfer per rep and compresses every ratio toward 1x).
        timed = jax.jit(
            lambda mm: jnp.sum(jax.vmap(lambda m: f(m)[0])(mm)
                               .astype(jnp.int32)))  # 0/1 maps: sum < 2^31
        return batched, timed

    results = {}
    outs = {}
    for name, (fn, timed) in (("xla-flat", make_op("xla")),
                              ("xla-2d", make_op("xla", "2d")),
                              ("pallas", make_op("pallas"))):
        fps = bench(timed, md, lambda o: int(np.asarray(o)))
        results[f"op-{name}"] = fps
        outs[name] = np.asarray(fn(md))   # full maps once, untimed (parity)
        log(f"op-{name}: {fps:.1f} maps/s")
    same = all(np.array_equal(outs["xla-flat"], outs[k])
               for k in ("xla-2d", "pallas"))
    log(f"methods bit-equal (det maps, batch 32): {same}")

    # Pipeline-level: full fixed chain, hw-compat vs named geometry.
    def pipe_barrier(o):
        np.asarray(o["n_dets"]).sum()

    for name, kw in (("pipeline-hwstream", dict(cfar_geometry="hw_stream")),
                     ("pipeline-named", dict())):
        proc = pl.make_batch_processor(p, mode="fixed", include_maps=False,
                                       **kw)
        fps = bench(proc, bd, pipe_barrier)
        results[name] = fps
        log(f"{name}: {fps:.1f} frames/s")

    log(f"pallas/xla-flat speedup: "
        f"{results['op-pallas']/results['op-xla-flat']:.2f}x")
    log(f"hwstream/named (fixed): "
        f"{results['pipeline-hwstream']/results['pipeline-named']:.3f}")
    if not same:
        log("ERROR: layouts disagree")
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Detection extraction (JAX) — fixed-capacity top-K with validity mask.

The reference zero-suppresses the CFAR stream and forwards up to 64
detections per scan in stream order (rtl/src/radar_core.vhd:413-418,
tws_tracker.vhd:66-76).  Variable-length outputs don't exist under jit, so
the framework extracts the K strongest detections into fixed arrays with a
validity mask — strictly better under overload (docs/design_notes.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_dets",))
def topk_detections(det_map: jnp.ndarray, max_dets: int = 64):
    """Extract the ``max_dets`` strongest nonzero cells of a (R, D) detection
    map.  Returns dict with range_bin, doppler_bin (int32), mag (map dtype),
    valid (bool) — all length ``max_dets`` — and n_dets (total nonzero count,
    may exceed max_dets; the overflow analog of the 64-det buffer cap)."""
    R, D = det_map.shape
    flat = det_map.ravel()
    vals, idx = jax.lax.top_k(flat, max_dets)
    valid = vals > 0
    return {
        "range_bin": (idx // D).astype(jnp.int32),
        "doppler_bin": (idx % D).astype(jnp.int32),
        "mag": vals,
        "valid": valid,
        "n_dets": jnp.sum(det_map > 0).astype(jnp.int32),
    }

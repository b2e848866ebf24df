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
    may exceed max_dets; the overflow analog of the 64-det buffer cap).

    Large maps use an exact two-stage reduction: per-row top-k over the
    Doppler axis, then top-k over the R*k survivors — every global top-k
    cell is inside its row's top-k, and lax.top_k's stable tie-breaking
    (lower index first) composes to the same (row, col)-lexicographic order
    as the single flat top_k, so results are identical."""
    R, D = det_map.shape
    k1 = min(D, max_dets)
    if R * D > 16384 and R * k1 >= max_dets:
        vals1, col1 = jax.lax.top_k(det_map, k1)          # (R, k1)
        vals2, i2 = jax.lax.top_k(vals1.ravel(), max_dets)
        row = (i2 // k1).astype(jnp.int32)
        col = col1.ravel()[i2].astype(jnp.int32)
        vals, range_bin, doppler_bin = vals2, row, col
    else:
        vals, idx = jax.lax.top_k(det_map.ravel(), max_dets)
        range_bin = (idx // D).astype(jnp.int32)
        doppler_bin = (idx % D).astype(jnp.int32)
    valid = vals > 0
    return {
        "range_bin": range_bin,
        "doppler_bin": doppler_bin,
        "mag": vals,
        "valid": valid,
        "n_dets": jnp.sum(det_map > 0).astype(jnp.int32),
    }

"""Pallas TPU kernel: 2D OS-CFAR via bit-serial radix rank selection.

The XLA formulation (ops/cfar.py) materializes the (R, D, n_ref) training-cell
stack (64 MB per 1024x128 frame) and sorts it — memory-bound and the whole
pipeline's hot spot (the TPU analog of the reference's per-cell bubble sort,
rtl/src/os_cfar_2d.vhd:172-178, SURVEY.md CS-1).  This kernel never builds the
stack:

* the padded map lives in VMEM (0.57 MB); a scratch buffer holds the
  ``win_doppler`` lane-rotated copies so every training-cell read inside the
  hot loop is a cheap sublane (second-minor) slice;
* the rank_idx-th order statistic is found by **bit-serial radix selection**:
  walk the value bits MSB->LSB, keeping per-cell prefix P and testing
  count(refs >= P | bit) >= k where k = n_ref - rank_idx; after all bits
  P *is* the k-th largest reference value.  Per cell that is
  bits x n_ref compare-adds on the VPU — no sort, no gather, no HBM traffic
  beyond one map read and one write;
* float magnitudes are ranked via the monotonic IEEE-754 trick: non-negative
  f32 values compare identically to their bit patterns as int32, so the same
  integer kernel handles both modes bit-exactly (the mean for adaptive
  scaling is accumulated separately in f32).

Adaptive scale, threshold and zero-suppression match ops/cfar.cfar_2d exactly
(verified bit-for-bit in tests/test_cfar_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import CfarParams
from ..golden.fixed_point import _window_offsets


def _boxsum(view, conv, r0, r1, d0, d1):
    """Window sum over dr in [r0, r1] x dd in [d0, d1] of ``conv(view(dr,
    dd))`` — inner sum over dr ascending, outer over dd ascending, the
    association tree of ops/cfar._box2d_sum/_ref_sums.  This order is
    load-bearing: the per-cell adaptive-scale mean must build the identical
    float tree in every kernel (fused front-end epilogue, _kernel_detect,
    _kernel) so their scale decisions are mutually bit-identical."""
    acc = None
    for dd in range(d0, d1 + 1):
        col = None
        for dr in range(r0, r1 + 1):
            v = conv(view(dr, dd))
            col = v if col is None else col + v
        acc = col if acc is None else acc + col
    return acc


def _kernel(mag_ref, padded_ref, so_ref, det_ref, thr_ref, scale_ref,
            rot_ref, refs_ref, *, cfar: CfarParams, integer: bool, bits: int,
            tile_rows: int):
    """One grid step: CFAR over ``tile_rows`` output rows.

    mag_ref:    (tile_rows, D) unpadded map tile (the CUTs)
    padded_ref: full (R + 2*hr, D + 2*hd) padded map in VMEM (same block for
                every grid step)
    rot_ref:    scratch (win_doppler, tile_rows + 2*hr, D) — lane-rotated,
                column-sliced copies of this tile's padded region
    refs_ref:   scratch (n_ref, tile_rows, D) — materialized training-cell
                planes, so the bits x n_ref hot loop reads aligned full tiles
                (the misaligned sublane shifts happen once, not per bit)
    """
    i = pl.program_id(0)
    hr, hd = cfar.halo_range, cfar.halo_doppler
    D = mag_ref.shape[1]
    row0 = i * tile_rows
    k = cfar.n_ref - cfar.rank_idx
    offsets = _window_offsets(cfar)

    # 1. Build the rotated copies: one lane-slice per Doppler offset.
    for j in range(cfar.win_doppler):
        rot_ref[j] = padded_ref[pl.ds(row0, tile_rows + 2 * hr),
                                pl.ds(j, D)].astype(jnp.int32)

    # 2. Materialize the n_ref training planes with aligned layout.
    for idx, (dr, dd) in enumerate(offsets):
        refs_ref[idx] = rot_ref[dd + hd, pl.ds(hr + dr, tile_rows), :]

    def ref_view(dr, dd, idx=None):
        return refs_ref[offsets.index((dr, dd)) if idx is None else idx]

    # 3. Adaptive-scale mean from full-minus-guard window sums in the
    # association order of ops/cfar._ref_sums — the float mean is
    # bit-identical to _kernel_detect's and the fused epilogue's (the XLA
    # OS branch sums the ref stack instead, so XLA-vs-kernel means agree
    # only decision-equivalently, as before).
    def raw_view(dr, dd):
        return rot_ref[dd + hd, pl.ds(hr + dr, tile_rows), :]

    conv = ((lambda v: v) if integer
            else (lambda v: pltpu.bitcast(v, jnp.float32)))
    gr, gd = cfar.guard_range, cfar.guard_doppler
    sum_refs = (_boxsum(raw_view, conv, -hr, hr, -hd, hd)
                - _boxsum(raw_view, conv, -gr, gr, -gd, gd))
    mean = (sum_refs // cfar.n_ref) if integer else (sum_refs / cfar.n_ref)

    # 4. Bit-serial radix selection of the k-th largest training cell
    # (compare-bound: one compare+add per (bit, ref) on the VPU).
    zero = jnp.zeros((tile_rows, D), jnp.int32)
    prefix = zero
    if integer:
        bit_positions = list(reversed(range(bits)))
    else:
        # Float keys scan from bit 30 (sign bit of a non-negative float is
        # 0) down; scanning only the top ``bits`` positions ranks on a
        # truncated key — see cfar_2d_pallas(rank_bits=...).
        bit_positions = list(range(30, 30 - bits, -1))
    for b in bit_positions:
        cand = prefix | (1 << b)
        cnt = zero
        for idx in range(cfar.n_ref):
            v = ref_view(None, None, idx)
            cnt = cnt + (v >= cand).astype(jnp.int32)
        prefix = jnp.where(cnt >= k, cand, prefix)

    # 5. Adaptive scale + threshold + zero-suppressed detection output
    #    (os_cfar_2d.vhd:187-217 semantics, matching ops/cfar.cfar_2d).
    so = so_ref[0]
    if integer:
        est = prefix
        hi = est > mean + (mean >> 1)
        lo = est < (mean >> 1)
    else:
        est = pltpu.bitcast(prefix, jnp.float32)
        hi = est > 1.5 * mean
        lo = est < 0.5 * mean
    scale = jnp.where(hi, cfar.scale_max,
                      jnp.where(lo, cfar.scale_min, cfar.scale_nom))
    scale = jnp.where(so != 0, so, scale)
    if integer:
        cut = mag_ref[...]
        threshold = est * scale
        det_ref[...] = jnp.where(cut > threshold, cut, jnp.zeros_like(cut))
        thr_ref[...] = threshold
    else:
        # The map arrives as bitcast int32; compare and emit in f32 domain,
        # store back as the bitcast pattern.
        cut = pltpu.bitcast(mag_ref[...], jnp.float32)
        threshold = est * scale.astype(jnp.float32)
        det = jnp.where(cut > threshold, cut, jnp.zeros_like(cut))
        det_ref[...] = pltpu.bitcast(det, jnp.int32)
        thr_ref[...] = pltpu.bitcast(threshold, jnp.int32)
    scale_ref[...] = scale.astype(jnp.int32)


def _kernel_detect(mag_ref, padded_ref, so_ref, det_ref, scale_ref,
                   rot_ref, refs_ref, *, cfar: CfarParams, integer: bool,
                   tile_rows: int, exact_div: bool = True):
    """Detect-only variant: decides ``CUT > est*scale`` purely by counting,
    never materializing the order statistic.

    The bit-serial kernel (_kernel) walks ``bits`` candidate prefixes to
    recover est explicitly — needed for the dbg_threshold tap
    (os_cfar_2d.vhd:34).  When only the detection map is consumed, every
    comparison against est collapses to one counting pass, because for the
    k-th largest reference value:

        est >  T  <=>  count(refs >  T) >= k
        est <  T  <=>  count(refs >= T) <  k
        est*scale >= cut  <=>  count(refs*scale >= cut) >= k

    (the last since multiplication by a positive scale is monotone — also in
    float round-to-nearest — so the k-th largest of the scaled multiset IS
    est*scale).  Three counting passes + one mean pass replace the
    ``bits``-pass radix loop: ~4x fewer VPU ops per cell, and the results are
    bit-exact against ops.cfar.cfar_2d in both integer and float modes
    (stronger than the truncated-key rank_bits=16 production rank path).
    """
    i = pl.program_id(0)
    hr, hd = cfar.halo_range, cfar.halo_doppler
    D = mag_ref.shape[1]
    row0 = i * tile_rows
    k = cfar.n_ref - cfar.rank_idx
    offsets = _window_offsets(cfar)

    for j in range(cfar.win_doppler):
        rot_ref[j] = padded_ref[pl.ds(row0, tile_rows + 2 * hr),
                                pl.ds(j, D)].astype(jnp.int32)

    zero = jnp.zeros((tile_rows, D), jnp.int32)

    def fval(v):
        return pltpu.bitcast(v, jnp.float32)

    def view(dr, dd):
        return rot_ref[dd + hd, pl.ds(hr + dr, tile_rows), :]

    # Materialize the training planes for passes B/C.
    for idx, (dr, dd) in enumerate(offsets):
        refs_ref[idx] = view(dr, dd)

    # Pass A: the adaptive-scale mean, from full-minus-guard window sums in
    # the association order of ops/cfar._ref_sums (_box1d over dr ascending,
    # then over dd ascending) — the float mean is bit-identical to _kernel's
    # and the fused front-end epilogue's (the XLA OS branch sums its ref
    # stack instead; agreement with it stays decision-equivalent).
    conv = (lambda v: v) if integer else fval
    gr, gd = cfar.guard_range, cfar.guard_doppler
    sum_refs = (_boxsum(view, conv, -hr, hr, -hd, hd)
                - _boxsum(view, conv, -gr, gr, -gd, gd))
    if integer:
        mean = sum_refs // cfar.n_ref
        t_hi = mean + (mean >> 1)
        t_lo = mean >> 1
    else:
        mean = sum_refs / cfar.n_ref
        t_hi = 1.5 * mean
        t_lo = 0.5 * mean

    # Pass B: hi/lo clutter classification counts (os_cfar_2d.vhd:187-199).
    cnt_hi = zero
    cnt_lo = zero
    for idx in range(cfar.n_ref):
        v = refs_ref[idx] if integer else fval(refs_ref[idx])
        cnt_hi = cnt_hi + (v > t_hi).astype(jnp.int32)
        cnt_lo = cnt_lo + (v >= t_lo).astype(jnp.int32)
    hi = cnt_hi >= k        # est > mean*1.5
    lo = cnt_lo < k         # est < mean*0.5
    so = so_ref[0]
    scale = jnp.where(hi, cfar.scale_max,
                      jnp.where(lo, cfar.scale_min, cfar.scale_nom))
    scale = jnp.where(so != 0, so, scale)

    # Pass C: the threshold decision itself.
    cnt_det = zero
    if integer and exact_div:
        # refs*scale >= cut  <=>  refs >= ceil(cut/scale): one per-cell
        # division replaces n_ref per-ref multiplies.  The f32 quotient is
        # exact only while cut-1 is f32-representable (cut < 2^24 + 1; a
        # non-integer rational p/scale is >= 1/scale away from an integer,
        # far beyond f32 ulp at that width), so floor((cut-1)/scale) + 1 is
        # the exact ceiling.  The wrapper gates this on int_bits <= 24 and
        # falls back to the per-ref multiply loop otherwise.
        cut = mag_ref[...]
        q = jnp.floor((cut - 1).astype(jnp.float32)
                      / scale.astype(jnp.float32)).astype(jnp.int32) + 1
        for idx in range(cfar.n_ref):
            cnt_det = cnt_det + (refs_ref[idx] >= q).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0)
        det_ref[...] = jnp.where(det, cut, jnp.zeros_like(cut))
    elif integer:
        cut = mag_ref[...]
        for idx in range(cfar.n_ref):
            cnt_det = cnt_det + (refs_ref[idx] * scale >= cut).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0)
        det_ref[...] = jnp.where(det, cut, jnp.zeros_like(cut))
    else:
        # Same idea in f32: v*scale >= cut  <=>  v >= q_min where q_min is
        # the smallest float whose rounded product reaches cut (the map
        # v -> RN(v*scale) is monotone, so the threshold is a single float).
        # q_min lies within 2 ulps below RN(cut/scale): probe the 4
        # candidates once per cell instead of multiplying every ref
        # (fuzz-validated over engineered boundary cases in
        # tests/test_cfar_pallas.py::test_detect_float_qmin_fuzz).
        cut = fval(mag_ref[...])
        scale_f = scale.astype(jnp.float32)
        ti = pltpu.bitcast(cut / scale_f, jnp.int32)
        q = pltpu.bitcast(ti + 1, jnp.float32)
        for delta in (0, -1, -2):
            c = pltpu.bitcast(ti + delta, jnp.float32)
            q = jnp.where(c * scale_f >= cut, c, q)
        for idx in range(cfar.n_ref):
            cnt_det = cnt_det + (fval(refs_ref[idx]) >= q).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0.0)
        det_ref[...] = pltpu.bitcast(
            jnp.where(det, cut, jnp.zeros_like(cut)), jnp.int32)
    scale_ref[...] = scale.astype(jnp.int32)


def _kernel_detect_scaled(mag_ref, padded_ref, scale_in_ref, det_ref,
                          scale_ref, rot_ref, *, cfar: CfarParams,
                          integer: bool, tile_rows: int,
                          exact_div: bool = True):
    """Detect-only variant with the adaptive scale precomputed outside the
    kernel (scale_mode="block", ops/cfar.block_scale_map — or any externally
    supplied per-cell scale).  Only pass C of _kernel_detect remains: one
    count(refs >= q) per cell, reading each training plane directly from the
    rotated copies (each plane is consumed exactly once, so materializing an
    aligned refs scratch would cost more than the single offset read).
    ~3.5x fewer VPU slots per cell than _kernel_detect."""
    i = pl.program_id(0)
    hr, hd = cfar.halo_range, cfar.halo_doppler
    D = mag_ref.shape[1]
    row0 = i * tile_rows
    k = cfar.n_ref - cfar.rank_idx
    offsets = _window_offsets(cfar)

    for j in range(cfar.win_doppler):
        rot_ref[j] = padded_ref[pl.ds(row0, tile_rows + 2 * hr),
                                pl.ds(j, D)].astype(jnp.int32)

    def ref_view(dr, dd):
        return rot_ref[dd + hd, pl.ds(hr + dr, tile_rows), :]

    def fval(v):
        return pltpu.bitcast(v, jnp.float32)

    scale = scale_in_ref[...]
    cnt_det = jnp.zeros((tile_rows, D), jnp.int32)
    if integer and exact_div:
        # Same exact-ceiling trick as _kernel_detect pass C.
        cut = mag_ref[...]
        q = jnp.floor((cut - 1).astype(jnp.float32)
                      / scale.astype(jnp.float32)).astype(jnp.int32) + 1
        for dr, dd in offsets:
            cnt_det = cnt_det + (ref_view(dr, dd) >= q).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0)
        det_ref[...] = jnp.where(det, cut, jnp.zeros_like(cut))
    elif integer:
        cut = mag_ref[...]
        for dr, dd in offsets:
            cnt_det = cnt_det + (ref_view(dr, dd) * scale >= cut).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0)
        det_ref[...] = jnp.where(det, cut, jnp.zeros_like(cut))
    else:
        # q_min probing as in _kernel_detect's float pass C.
        cut = fval(mag_ref[...])
        scale_f = scale.astype(jnp.float32)
        ti = pltpu.bitcast(cut / scale_f, jnp.int32)
        q = pltpu.bitcast(ti + 1, jnp.float32)
        for delta in (0, -1, -2):
            c = pltpu.bitcast(ti + delta, jnp.float32)
            q = jnp.where(c * scale_f >= cut, c, q)
        for dr, dd in offsets:
            cnt_det = cnt_det + (fval(ref_view(dr, dd)) >= q).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0.0)
        det_ref[...] = pltpu.bitcast(
            jnp.where(det, cut, jnp.zeros_like(cut)), jnp.int32)
    scale_ref[...] = scale


def _prepare(mag_map, scale_override, cfar: CfarParams, integer: bool,
             prepadded_range, tile_rows: int):
    """Shared wrapper prep for both kernels: variant/dtype validation, the
    int32 (or bitcast-f32) view, halo padding, and the tile-rows fallback.
    Returns (core, padded, so, R, D, tile_rows).

    ``prepadded_range``: False = pad both axes here (edge_mode), True = range
    rows arrive pre-padded (the sharded halo exchange), "both" = the map
    arrives fully padded on both axes — the caller owns the edge semantics
    entirely (the hw-compat flat-stream mode bakes its row-carry columns)."""
    if cfar.variant != "os":
        raise ValueError("pallas kernel implements the os variant; use "
                         "ops.cfar.cfar_2d for ca/go/so")
    hr, hd = cfar.halo_range, cfar.halo_doppler
    m = mag_map
    integer_in = jnp.issubdtype(m.dtype, jnp.integer)
    if integer != integer_in:
        raise ValueError(f"integer={integer} but map dtype {m.dtype}")

    if integer:
        m32 = m.astype(jnp.int32)
    else:
        m32 = jax.lax.bitcast_convert_type(m.astype(jnp.float32), jnp.int32)

    if prepadded_range == "both":
        R = m.shape[0] - 2 * hr
        D = m.shape[1] - 2 * hd
        padded = m32
        # Explicit end indices: with hr or hd == 0 (CfarParams permits
        # ref=guard=0 on an axis) m32[hr:-hr] would be an empty slice.
        core = m32[hr:m.shape[0] - hr, hd:m.shape[1] - hd]
        if R % tile_rows:
            tile_rows = int(np.gcd(R, tile_rows))
        so = jnp.asarray(scale_override, jnp.int32).reshape(1)
        return core, padded, so, R, D, tile_rows
    if prepadded_range:
        R = m.shape[0] - 2 * hr
        padded = jnp.pad(m32, ((0, 0), (hd, hd)), mode=cfar.edge_mode)
        core = m32[hr:m.shape[0] - hr]
    else:
        R = m.shape[0]
        padded = jnp.pad(m32, ((hr, hr), (hd, hd)), mode=cfar.edge_mode)
        core = m32
    D = m.shape[1]
    if R % tile_rows:
        tile_rows = int(np.gcd(R, tile_rows))
    so = jnp.asarray(scale_override, jnp.int32).reshape(1)
    return core, padded, so, R, D, tile_rows


def _specs(R, D, hr, hd, tile_rows, n_out):
    """BlockSpecs shared by both kernels: per-tile map block, the whole
    padded map resident for every grid step, SMEM scale_override; n_out
    per-tile output blocks."""
    block = pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        block,
        pl.BlockSpec((R + 2 * hr, D + 2 * hd), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_specs = [block] * n_out
    out_shape = [jax.ShapeDtypeStruct((R, D), jnp.int32)] * n_out
    return in_specs, out_specs, out_shape


@functools.partial(
    jax.jit,
    static_argnames=("cfar", "integer", "prepadded_range", "tile_rows",
                     "interpret", "int_bits"))
def cfar_2d_pallas_detect(mag_map: jnp.ndarray,
                          scale_override: jnp.ndarray | int = 0,
                          cfar: CfarParams = CfarParams(),
                          integer: bool = False,
                          prepadded_range: bool = False, tile_rows: int = 128,
                          interpret: bool = False, int_bits: int = 17,
                          scale_map: jnp.ndarray | None = None):
    """Fast path for consumers that only need the detection map (and scale):
    returns (det_map, scale) with det_map bit-exact vs ops.cfar.cfar_2d's.
    See _kernel_detect for why this needs no rank selection.

    ``int_bits`` (integer mode): upper bound on the map's value width.  Up
    to 24 bits the threshold decision uses an exact one-division-per-cell
    ceiling; wider maps fall back to a per-reference multiply (still exact,
    ~n_ref extra multiplies per cell).

    ``scale_map`` (block mode): externally computed per-cell scale, shaped
    like the un-padded core map — used by the sharded pipeline, whose block
    statistics need a cross-shard block-grid halo exchange
    (ops.cfar.block_scale_map_sharded).  The scale_override fold is applied
    here either way."""
    m = mag_map
    hr, hd = cfar.halo_range, cfar.halo_doppler
    core, padded, so, R, D, tile_rows = _prepare(
        m, scale_override, cfar, integer, prepadded_range, tile_rows)
    n_tiles = R // tile_rows
    if cfar.scale_mode == "block":
        if scale_map is None:
            if prepadded_range:
                raise ValueError(
                    "scale_mode='block' with a prepadded (sharded) map needs "
                    "the halo-exchanged scale_map from "
                    "ops.cfar.block_scale_map_sharded")
            # The clutter-map scale is a few fused XLA map passes computed
            # on the real-valued map; the kernel then runs only the
            # detection-count pass.
            from .cfar import block_scale_map
            scale_map = block_scale_map(m, cfar, integer)
        scale_map = jnp.where(so[0] != 0, so[0], scale_map.astype(jnp.int32))
        block = pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        det32, scale_out = pl.pallas_call(
            functools.partial(_kernel_detect_scaled, cfar=cfar,
                              integer=integer, tile_rows=tile_rows,
                              exact_div=int_bits <= 24),
            grid=(n_tiles,),
            in_specs=[
                block,
                pl.BlockSpec((R + 2 * hr, D + 2 * hd), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                block,
            ],
            out_specs=[block] * 2,
            out_shape=[jax.ShapeDtypeStruct((R, D), jnp.int32)] * 2,
            scratch_shapes=[
                pltpu.VMEM((cfar.win_doppler, tile_rows + 2 * hr, D),
                           jnp.int32),
            ],
            interpret=interpret,
        )(core, padded, scale_map)
        if integer:
            return det32.astype(m.dtype), scale_out
        return (jax.lax.bitcast_convert_type(det32, jnp.float32),
                scale_out.astype(jnp.float32))
    det32, scale_out = pl.pallas_call(
        functools.partial(_kernel_detect, cfar=cfar, integer=integer,
                          tile_rows=tile_rows,
                          exact_div=int_bits <= 24),
        grid=(n_tiles,),
        in_specs=(sp := _specs(R, D, hr, hd, tile_rows, 2))[0],
        out_specs=sp[1],
        out_shape=sp[2],
        scratch_shapes=[
            pltpu.VMEM((cfar.win_doppler, tile_rows + 2 * hr, D), jnp.int32),
            pltpu.VMEM((cfar.n_ref, tile_rows, D), jnp.int32),
        ],
        interpret=interpret,
    )(core, padded, so)

    if integer:
        det = det32.astype(m.dtype)
    else:
        det = jax.lax.bitcast_convert_type(det32, jnp.float32)
        scale_out = scale_out.astype(jnp.float32)
    return det, scale_out


@functools.partial(
    jax.jit,
    static_argnames=("cfar", "integer", "prepadded_range", "tile_rows",
                     "interpret", "rank_bits", "int_bits"))
def cfar_2d_pallas(mag_map: jnp.ndarray, scale_override: jnp.ndarray | int = 0,
                   cfar: CfarParams = CfarParams(), integer: bool = False,
                   prepadded_range: bool = False, tile_rows: int = 64,
                   interpret: bool = False, rank_bits: int | None = None,
                   int_bits: int = 17):
    """Drop-in replacement for ops.cfar.cfar_2d (OS variant) returning
    (det_map, threshold, scale).  ``interpret=True`` runs the Pallas
    interpreter (CPU tests).

    ``rank_bits`` (float mode only): number of top bitcast-key bits the radix
    selection scans.  None/31 = exact order statistic.  16 (the production
    pipeline default) ranks on a truncated key — the selected threshold is
    the exact k-th largest value truncated to 8-exponent+7-mantissa-bit
    precision, i.e. under the true order statistic by <0.8% — halving the
    kernel's dominant bit-loop cost.  Against threshold scale factors of
    2/4/6 this is far below the detector's operating margin."""
    # int_bits must cover the map's value range (silently wrong ranks
    # otherwise); default 17 = the magnitude op's output width.  The
    # pipelines pass 16: alpha-max-beta-min of int16 is <= 45056 < 2^16.
    # Float mode ranks the IEEE-754 bit patterns (monotonic for
    # non-negative f32): bits = key bits scanned.
    if cfar.scale_mode != "cell":
        raise ValueError(
            "the rank/threshold pallas kernel implements per-cell scale "
            "only; scale_mode='block' debug taps come from ops.cfar.cfar_2d "
            "(cfar_2d_auto routes there), the fast path from "
            "cfar_2d_pallas_detect")
    bits = int_bits if integer else (31 if rank_bits is None else int(rank_bits))
    m = mag_map
    hr, hd = cfar.halo_range, cfar.halo_doppler
    core, padded, so, R, D, tile_rows = _prepare(
        m, scale_override, cfar, integer, prepadded_range, tile_rows)
    n_tiles = R // tile_rows

    det32, thr32, scale_out = pl.pallas_call(
        functools.partial(_kernel, cfar=cfar, integer=integer, bits=bits,
                          tile_rows=tile_rows),
        grid=(n_tiles,),
        in_specs=(sp := _specs(R, D, hr, hd, tile_rows, 3))[0],
        out_specs=sp[1],
        out_shape=sp[2],
        scratch_shapes=[
            pltpu.VMEM((cfar.win_doppler, tile_rows + 2 * hr, D), jnp.int32),
            pltpu.VMEM((cfar.n_ref, tile_rows, D), jnp.int32),
        ],
        interpret=interpret,
    )(core, padded, so)

    if integer:
        det = det32.astype(m.dtype)
        thr = thr32.astype(m.dtype)
    else:
        det = jax.lax.bitcast_convert_type(det32, jnp.float32)
        thr = jax.lax.bitcast_convert_type(thr32, jnp.float32)
        scale_out = scale_out.astype(jnp.float32)  # match the XLA path's dtype
    return det, thr, scale_out


# ---------------------------------------------------------------------------
# Angle-extended (3D) detect kernel: ref_angle > 0 cross-beam training sets
# ---------------------------------------------------------------------------

# Geometry shared with the XLA body: ops.cfar._offsets_3d is the single
# source of the 3D training-offset order (bit-parity depends on it).


def _kernel_detect_3d(cut_ref, padded_ref, so_ref, det_ref, scale_ref,
                      rot_ref, *, cfar: CfarParams, integer: bool,
                      offsets, n_ref: int, rank_idx: int, tile_rows: int,
                      rows_per_plane: int, plane_stride: int, ha: int,
                      guard_angle: int = 0, exact_div: bool = True):
    """cfar_3d's per-cell decision by counting, on a flattened (angle,
    range)-row layout.

    The padded cube arrives as a 2D buffer of (A + 2*ha)*plane_stride rows
    x (D + 2*hd) lanes — each angle plane padded to ``plane_stride`` rows
    (R + 2*hr rounded up to a sublane multiple) so an angle offset ``da``
    is the constant row offset da*plane_stride.  One lane-sliced rotated
    copy per (da, dd) pair makes every training read a static sublane
    slice, exactly like _kernel_detect's per-dd copies.  Decisions follow
    _kernel_detect's counting passes (mean -> hi/lo -> threshold count)
    over the enlarged training set; integer mode is bit-exact vs
    ops.cfar.cfar_3d.
    """
    i = pl.program_id(0)
    hr, hd = cfar.halo_range, cfar.halo_doppler
    D = cut_ref.shape[1]
    k = n_ref - rank_idx
    n_tiles_r = rows_per_plane // tile_rows      # rows_per_plane == R here
    a = i // n_tiles_r
    r0 = (i % n_tiles_r) * tile_rows
    base = (ha + a) * plane_stride + r0          # padded row of cut (a, r0-hr)

    das = sorted({da for da, _, _ in offsets})
    dds = list(range(-hd, hd + 1))

    # One rotated copy per (da, dd): rows [base + da*stride, +tile+2hr) at
    # lane offset dd — all training reads below are static sublane slices.
    for ai, da in enumerate(das):
        for di, dd in enumerate(dds):
            rot_ref[ai * len(dds) + di] = padded_ref[
                pl.ds(base + da * plane_stride, tile_rows + 2 * hr),
                pl.ds(hd + dd, D)].astype(jnp.int32)

    def view(da, dr, dd):
        idx = das.index(da) * len(dds) + dds.index(dd)
        return rot_ref[idx, pl.ds(hr + dr, tile_rows), :]

    def fval(v):
        return pltpu.bitcast(v, jnp.float32)

    conv = (lambda v: v) if integer else fval
    zero = jnp.zeros((tile_rows, D), jnp.int32)

    # Pass A: training-set mean.  Integer sums are association-order-free
    # and float matches cfar_3d only decision-equivalently (the 2D kernels'
    # contract vs the XLA OS branch), so under WRAP edges the sum runs
    # separably — per-plane dr-column sums reused across dd via lane rolls
    # (a roll of the dd=0 column IS the wrap-padded read), full window
    # minus the <=guard_angle planes' guard boxes: ~100 plane-ops instead
    # of n_ref (r4; the 414-offset direct loop was ~17% of the kernel).
    # Reflect edges keep the direct loop (a lane roll is not a reflect
    # read).
    gr, gd = cfar.guard_range, cfar.guard_doppler
    if cfar.edge_mode == "wrap":
        D_ = cut_ref.shape[1]
        sum_refs = None
        for da in das:
            col = None
            for dr in range(-hr, hr + 1):
                v = conv(view(da, dr, 0))
                col = v if col is None else col + v
            for dd in range(-hd, hd + 1):
                t = col if dd == 0 else pltpu.roll(col, (-dd) % D_, axis=1)
                sum_refs = t if sum_refs is None else sum_refs + t
        for da in das:
            if abs(da) > guard_angle:
                continue
            for dd in range(-gd, gd + 1):
                for dr in range(-gr, gr + 1):
                    sum_refs = sum_refs - conv(view(da, dr, dd))
    else:
        sum_refs = None
        for da, dr, dd in offsets:
            v = conv(view(da, dr, dd))
            sum_refs = v if sum_refs is None else sum_refs + v
    if integer:
        mean = sum_refs // n_ref
        t_hi = mean + (mean >> 1)
        t_lo = mean >> 1
    else:
        mean = sum_refs / n_ref
        t_hi = 1.5 * mean
        t_lo = 0.5 * mean

    # Pass B: hi/lo clutter classification counts.
    cnt_hi, cnt_lo = zero, zero
    for da, dr, dd in offsets:
        v = conv(view(da, dr, dd))
        cnt_hi = cnt_hi + (v > t_hi).astype(jnp.int32)
        cnt_lo = cnt_lo + (v >= t_lo).astype(jnp.int32)
    hi = cnt_hi >= k
    lo = cnt_lo < k
    so = so_ref[0]
    scale = jnp.where(hi, cfar.scale_max,
                      jnp.where(lo, cfar.scale_min, cfar.scale_nom))
    scale = jnp.where(so != 0, so, scale)

    # Pass C: the threshold decision (cfar_3d: det where cut > est*scale).
    cnt_det = zero
    if integer and exact_div:
        cut = cut_ref[...]
        q = jnp.floor((cut - 1).astype(jnp.float32)
                      / scale.astype(jnp.float32)).astype(jnp.int32) + 1
        for da, dr, dd in offsets:
            cnt_det = cnt_det + (view(da, dr, dd) >= q).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0)
        det_ref[...] = jnp.where(det, cut, jnp.zeros_like(cut))
    elif integer:
        cut = cut_ref[...]
        for da, dr, dd in offsets:
            cnt_det = cnt_det + (view(da, dr, dd) * scale
                                 >= cut).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0)
        det_ref[...] = jnp.where(det, cut, jnp.zeros_like(cut))
    else:
        cut = fval(cut_ref[...])
        scale_f = scale.astype(jnp.float32)
        ti = pltpu.bitcast(cut / scale_f, jnp.int32)
        q = pltpu.bitcast(ti + 1, jnp.float32)
        for delta in (0, -1, -2):
            c = pltpu.bitcast(ti + delta, jnp.float32)
            q = jnp.where(c * scale_f >= cut, c, q)
        for da, dr, dd in offsets:
            cnt_det = cnt_det + (fval(view(da, dr, dd)) >= q).astype(jnp.int32)
        det = (cnt_det < k) & (cut > 0.0)
        det_ref[...] = pltpu.bitcast(
            jnp.where(det, cut, jnp.zeros_like(cut)), jnp.int32)
    scale_ref[...] = scale.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfar", "integer", "ref_angle", "guard_angle",
                     "prepadded_angle", "tile_rows", "interpret", "int_bits"))
def cfar_3d_pallas_detect(cube: jnp.ndarray,
                          scale_override: jnp.ndarray | int = 0,
                          cfar: CfarParams = CfarParams(),
                          integer: bool = False,
                          ref_angle: int = 1, guard_angle: int = 0,
                          prepadded_angle: bool = False,
                          tile_rows: int = 64, interpret: bool = False,
                          int_bits: int = 17):
    """Fused counting-kernel path for the angle-extended 3D CFAR
    (ops.cfar.cfar_3d with ref_angle > 0): returns (det_cube, scale) with
    integer decisions bit-exact vs cfar_3d (float decision-equivalent, the
    2D kernels' contract).  No threshold taps — cfar_3d serves the debug
    path.  ``prepadded_angle``: the cube carries ref_angle + guard_angle
    halo planes per side on axis 0 (the sharded beam-halo exchange);
    interior planes are the CUTs."""
    if cfar.variant != "os":
        raise ValueError("3D kernel implements the os variant; use "
                         "ops.cfar.cfar_3d for ca/go/so")
    if cfar.scale_mode != "cell":
        raise ValueError("3D kernel implements per-cell scale")
    if ref_angle < 1:
        raise ValueError("use cfar_2d_pallas_detect for ref_angle == 0")
    ha = ref_angle + guard_angle
    hr, hd = cfar.halo_range, cfar.halo_doppler
    integer_in = jnp.issubdtype(cube.dtype, jnp.integer)
    if integer != integer_in:
        raise ValueError(f"integer={integer} but cube dtype {cube.dtype}")
    c32 = (cube.astype(jnp.int32) if integer
           else jax.lax.bitcast_convert_type(cube.astype(jnp.float32),
                                             jnp.int32))
    if prepadded_angle:
        padded3 = jnp.pad(c32, ((0, 0), (hr, hr), (hd, hd)),
                          mode=cfar.edge_mode)
        core3 = c32[ha:-ha]
    else:
        padded3 = jnp.pad(c32, ((ha, ha), (hr, hr), (hd, hd)),
                          mode=cfar.edge_mode)
        core3 = c32
    A, R, D = core3.shape
    from .cfar import _offsets_3d            # single source of gather order
    offsets = _offsets_3d(cfar, ref_angle, guard_angle)
    n_ref = len(offsets)
    rank_idx = min((n_ref * cfar.rank_pct) // 100, n_ref - 1)

    # Flatten (angle, range) into rows, each plane padded to a sublane-
    # aligned stride so da becomes a constant aligned row offset.
    rp = R + 2 * hr
    plane_stride = -(-rp // 8) * 8
    padded2 = jnp.pad(padded3, ((0, 0), (0, plane_stride - rp), (0, 0))
                      ).reshape((A + 2 * ha) * plane_stride, D + 2 * hd)
    core2 = core3.reshape(A * R, D)
    if R % tile_rows:
        tile_rows = int(np.gcd(R, tile_rows))
    so_arr = jnp.asarray(scale_override)
    if so_arr.ndim != 0:
        raise ValueError(
            "cfar_3d_pallas_detect takes a SCALAR scale_override (SMEM); "
            "map-valued overrides run on the XLA body (method='xla')")
    if not jnp.issubdtype(so_arr.dtype, jnp.integer):
        raise ValueError(
            "cfar_3d_pallas_detect takes an integer scale_override "
            "(SMEM int32); float overrides run on the XLA body")
    so = so_arr.astype(jnp.int32).reshape(1)

    block = pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    n_da = 2 * ha + 1
    det32, scale_out = pl.pallas_call(
        functools.partial(
            _kernel_detect_3d, cfar=cfar, integer=integer, offsets=offsets,
            n_ref=n_ref, rank_idx=rank_idx, tile_rows=tile_rows,
            rows_per_plane=R, plane_stride=plane_stride, ha=ha,
            guard_angle=guard_angle, exact_div=int_bits <= 24),
        grid=(A * R // tile_rows,),
        in_specs=[
            block,
            pl.BlockSpec(((A + 2 * ha) * plane_stride, D + 2 * hd),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[block] * 2,
        out_shape=[jax.ShapeDtypeStruct((A * R, D), jnp.int32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((n_da * cfar.win_doppler, tile_rows + 2 * hr, D),
                       jnp.int32),
        ],
        # The resident padded cube + rotated copies exceed the 16 MB
        # default scoped-vmem budget at full size (same situation as the
        # fused front-end, docs/PERF_LOG.md); scale the limit with the
        # cube so large beam counts fit too (v5e VMEM is 128 MB).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                128 * 1024 * 1024,
                max(64 * 1024 * 1024,
                    (A + 2 * ha) * plane_stride * (D + 2 * hd) * 4
                    + 32 * 1024 * 1024))),
        interpret=interpret,
    )(core2, padded2, so)

    det32 = det32.reshape(A, R, D)
    scale_out = scale_out.reshape(A, R, D)
    if integer:
        # Match the XLA body's dtypes: scale in the cube's dtype, except
        # narrow integer inputs where both paths compute (and return
        # scale) in int32 — see cfar_2d's overflow note.
        sdt = cube.dtype if cube.dtype.itemsize >= 4 else jnp.int32
        return det32.astype(cube.dtype), scale_out.astype(sdt)
    return (jax.lax.bitcast_convert_type(det32, jnp.float32),
            scale_out.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Beam-axis peak-grouping kernel (array model, contiguous beam ids)
# ---------------------------------------------------------------------------


def _kernel_beam_group(*refs, n_beams: int, radius: int):
    """Cross-beam peak grouping (ops/cfar.peak_group_beams fast-path
    semantics) as ONE kernel pass per beam: inputs are the 2*radius+1
    beam-neighbor views of the det stack (index maps clamped at the
    edges; clamped-out neighbors are masked to zero in-kernel — a missing
    neighbor never beats a detection), outputs the grouped plane PLUS the
    per-row maxes and per-row nonzero counts the top-K extraction needs —
    so XLA never re-reads the grouped stack (the r4 XLA formulation's
    ~3x map-sized materializations collapse to one read + one write,
    docs/PERF_LOG.md)."""
    b = pl.program_id(0)
    nb_refs = refs[:2 * radius + 1]
    det_ref, rmax_ref, cnt_ref = refs[2 * radius + 1:]
    m = nb_refs[radius][0]
    keep = m > 0.0
    for o in range(1, radius + 1):
        up = nb_refs[radius + o][0]
        dn = nb_refs[radius - o][0]
        zero = jnp.zeros_like(m)
        # Clamped edge neighbors read the edge beam itself — mask them out.
        up = jnp.where(b + o <= n_beams - 1, up, zero)
        dn = jnp.where(b - o >= 0, dn, zero)
        # Tie toward the lower beam: a lower-index neighbor wins equals.
        keep &= (m >= up) & (m > dn)
    g = jnp.where(keep, m, jnp.zeros_like(m))
    det_ref[0] = g
    rmax_ref[0] = jnp.max(g, axis=1, keepdims=True)
    cnt_ref[0] = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def peak_group_beams_pallas(det: jnp.ndarray, radius: int = 1,
                            interpret: bool = False):
    """Kernel twin of ops/cfar.peak_group_beams (beam_ids=None fast path)
    over a (n_beams, rows, lanes) det stack — bit-identical grouping, plus
    the extraction epilogues: returns ``(det_g, row_max (n_beams*rows,),
    n_dets int32)`` ready for ops/detect.topk_detections(row_max=...,
    n_dets=...).  Layout-agnostic (rows may be map rows or the fused
    kernel's sliced rows — grouping only compares the SAME cell across
    beams)."""
    B, R, D = det.shape
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def nb_spec(o):
        return pl.BlockSpec(
            (1, R, D),
            lambda b, o=o: (jnp.clip(b + o, 0, B - 1), 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [nb_spec(o) for o in range(-radius, radius + 1)]
    out_specs = [
        vmem((1, R, D), lambda b: (b, 0, 0)),
        vmem((1, R, 1), lambda b: (b, 0, 0)),
        vmem((1, R, 1), lambda b: (b, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, R, D), det.dtype),
        jax.ShapeDtypeStruct((B, R, 1), det.dtype),
        jax.ShapeDtypeStruct((B, R, 1), jnp.int32),
    ]
    det_g, rmax, cnt = pl.pallas_call(
        functools.partial(_kernel_beam_group, n_beams=B, radius=radius),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*([det] * (2 * radius + 1)))
    return det_g, rmax.reshape(B * R), jnp.sum(cnt)

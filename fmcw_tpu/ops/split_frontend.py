"""Split fused front-end: the monolithic Pallas kernel of
ops/frontend_pallas.py factored around the corner-turn all-to-all so an
sp>1 (sequence-parallel) mesh runs at kernel speed.

The monolithic kernel (rdm_frontend / rdm_frontend_fixed) keeps the whole
frame in VMEM and therefore needs every chirp AND every range bin on one
chip — exactly what a sequence-parallel mesh does not have.  This module
splits it at the frame barrier (SURVEY.md CS-2, the ping-pong bank flip of
rtl/src/corner_turner.vhd:79-117):

* **Kernel A** (``range_frontend``): Hamming window + Cooley-Tukey range
  FFT on the local chirp block (nd/sp, nr) — all range bins, a chirp
  shard.  Fixed mode adds the integer window (saturation-counted) and the
  per-chirp-row BFP quantization, both of which only need the local rows.
* ``lax.all_to_all`` over sp — the corner turn (parallel/sharded.py).
* **Kernel B** (``slowtime_detect``): fused slow-time operator (MTI +
  Doppler window + Doppler DFT, contracted over the chirp axis), magnitude
  and the full CFAR decision + peak grouping on the local range-bin block
  (nd, nr/sp) — all chirps, a range shard.  The CFAR training window spans
  ``halo_range`` (+ ``peak_group_radius``) neighbor range bins: the caller
  ring-exchanges that many *complex post-range-FFT columns* (ppermute, a
  few KB) and the kernel computes the halo rows' slow-time/magnitude (and,
  for grouping, their CFAR decisions) locally — the magnitude map never
  leaves VMEM, same as the monolithic kernel.

Numerics contract (the load-bearing property): every per-column operation
— window, outer/inner DFT passes, bf16x3/bf16x6 MXU dots, BFP, MTI,
magnitude, CFAR counting — is evaluated with the identical instruction
sequence and association order as the monolithic kernel, and none of them
mixes data across range columns except the CFAR window (whose halo columns
carry exact copies of the neighbor's values).  The split pipeline is
therefore **bit-exact** against the monolithic fused kernel at any sp,
including sp == 1 (tests/test_split_frontend.py pins this), so the sharded
fused path inherits the single-chip kernel's parity contracts verbatim.

Layout difference vs the monolithic kernel: kernel B's slices are
*contiguous* range blocks (slice j holds map rows [128j, 128(j+1)) of the
local shard) instead of the monolithic kernel's n2-interleave — the range
FFT interleave is undone once, host of the all-to-all, by one cheap XLA
transpose on kernel A's output.  A row offset dr then addresses the SAME
slice at sublane offset dr (spilling into pad rows replicated from the
adjacent slice or the exchanged halo), which is strictly simpler than the
interleaved (slice, carry) addressing.  The long-CPI Doppler split's
parity-plane lane addressing (_lane_carry) is unchanged.

Capabilities cited for parity: corner turn rtl/src/corner_turner.vhd:79-117
(the all-to-all seam), CFAR window os_cfar_2d.vhd:41-47 (the halo width),
plus everything frontend_pallas.py cites for the per-stage math.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import dft_matrices, doppler_matrices
from .window import hamming_float, hamming_q15
from ..golden.fixed_point import _window_offsets
from .frontend_pallas import (_split_matrix, _split_matrix3, _ct_split,
                              _ct_split_rows, _lane_carry, _c_range,
                              _bfp_scale)


# ---------------------------------------------------------------------------
# Kernel A: window + Cooley-Tukey range FFT on a chirp shard
# ---------------------------------------------------------------------------

def _kernel_range(re_ref, im_ref, win_ref, twr_ref, twi_ref,
                  c1h_ref, c1l_ref, s1h_ref, s1l_ref,
                  re_out, im_out, *, n1: int, n2: int, c2r, c2i):
    """Float kernel A: the range-FFT stages 1-4 of frontend_pallas._kernel,
    verbatim, emitting the transformed slices instead of continuing."""
    def mm3(x, ch_ref, cl_ref, dn):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)
        return d(xh, ch_ref[...]) + (d(xl, ch_ref[...]) + d(xh, cl_ref[...]))

    dn1 = (((1,), (0,)), ((), ()))
    xr_s, xi_s = [], []
    for j2 in range(n2):
        w = win_ref[j2, :]
        xr_s.append(re_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.float32) * w)
        xi_s.append(im_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.float32) * w)
    for k2 in range(n2):
        if n2 == 1:
            br, bi = xr_s[0], xi_s[0]
        else:
            br = bi = None
            for j2 in range(n2):
                cr_, ci_ = float(c2r[j2, k2]), float(c2i[j2, k2])
                tr = xr_s[j2] * cr_ - xi_s[j2] * ci_
                ti = xr_s[j2] * ci_ + xi_s[j2] * cr_
                br = tr if br is None else br + tr
                bi = ti if bi is None else bi + ti
            twr = twr_ref[k2, :]
            twi = twi_ref[k2, :]
            br, bi = br * twr - bi * twi, br * twi + bi * twr
        re_out[k2] = mm3(br, c1h_ref, c1l_ref, dn1) - mm3(bi, s1h_ref,
                                                          s1l_ref, dn1)
        im_out[k2] = mm3(br, s1h_ref, s1l_ref, dn1) + mm3(bi, c1h_ref,
                                                          c1l_ref, dn1)


def _kernel_range_fixed(re_ref, im_ref, win_ref, twr_ref, twi_ref,
                        c1h_ref, c1m_ref, c1l_ref, s1h_ref, s1m_ref, s1l_ref,
                        re_out, im_out, stats_ref, *,
                        n1: int, n2: int, c2r, c2i, rnd: int, shift: int):
    """Fixed kernel A: integer window (saturation-counted) + bf16x6 CT FFT
    + per-chirp-row BFP quantize — stages 1-5 of _kernel_fixed, verbatim."""
    def mm6(x, h_ref, m_ref, l_ref, dn):
        xh = x.astype(jnp.bfloat16)
        r = x - xh.astype(jnp.float32)
        xm = r.astype(jnp.bfloat16)
        xl = (r - xm.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)
        return ((d(xl, h_ref[...]) + d(xm, m_ref[...]) + d(xh, l_ref[...]))
                + (d(xm, h_ref[...]) + d(xh, m_ref[...])) + d(xh, h_ref[...]))

    dn1 = (((1,), (0,)), ((), ()))
    sat = jnp.zeros((), jnp.int32)

    def iwin(x_i32, w):
        p = x_i32 * w
        sh = (p + rnd) >> shift
        s_ = jnp.sum(((sh > 32767) | (sh < -32768)).astype(jnp.int32))
        return jnp.clip(sh, -32768, 32767).astype(jnp.float32), s_

    xr_s, xi_s = [], []
    for j2 in range(n2):
        w = win_ref[j2, :]
        vr, s1 = iwin(re_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.int32), w)
        vi, s2 = iwin(im_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.int32), w)
        sat = sat + s1 + s2
        xr_s.append(vr)
        xi_s.append(vi)
    rr_s, ri_s = [], []
    for k2 in range(n2):
        if n2 == 1:
            br, bi = xr_s[0], xi_s[0]
        else:
            br = bi = None
            for j2 in range(n2):
                cr_, ci_ = float(c2r[j2, k2]), float(c2i[j2, k2])
                tr = xr_s[j2] * cr_ - xi_s[j2] * ci_
                ti = xr_s[j2] * ci_ + xi_s[j2] * cr_
                br = tr if br is None else br + tr
                bi = ti if bi is None else bi + ti
            twr = twr_ref[k2, :]
            twi = twi_ref[k2, :]
            br, bi = br * twr - bi * twi, br * twi + bi * twr
        rr_s.append(mm6(br, c1h_ref, c1m_ref, c1l_ref, dn1)
                    - mm6(bi, s1h_ref, s1m_ref, s1l_ref, dn1))
        ri_s.append(mm6(br, s1h_ref, s1m_ref, s1l_ref, dn1)
                    + mm6(bi, c1h_ref, c1m_ref, c1l_ref, dn1))
    # BFP quantize per chirp row across the whole range transform — the
    # same per-row peak/scale as _kernel_fixed stage 5 (local: the peak
    # spans range bins, all of which this kernel holds).
    pk = None
    for k2 in range(n2):
        m_ = jnp.maximum(jnp.abs(rr_s[k2]), jnp.abs(ri_s[k2]))
        row = jnp.max(m_, axis=1, keepdims=True)
        pk = row if pk is None else jnp.maximum(pk, row)
    bsc = _bfp_scale(pk)

    def qz(x):
        return jnp.clip(jnp.round(x * bsc), -32768.0, 32767.0)

    for k2 in range(n2):
        re_out[k2] = qz(rr_s[k2])
        im_out[k2] = qz(ri_s[k2])
    stats_ref[0, 0] = sat


@functools.partial(jax.jit, static_argnames=("fixed", "coef_width",
                                             "window_rounding", "interpret"))
def range_frontend(iq: jnp.ndarray, *, fixed: bool = False,
                   coef_width: int = 16, window_rounding: str = "unbiased",
                   interpret: bool = False):
    """Kernel A wrapper: iq (ndc, nr, 2) int16 (or f32) chirp shard ->
    (re, im) f32 (ndc, nr) in NATURAL range-bin order (the Cooley-Tukey
    interleave is undone by one XLA transpose), ready for the corner-turn
    all-to-all.  ``fixed=True`` additionally returns the window saturation
    count and emits BFP-quantized int16-valued f32 (the XFFT
    block-floating-point barrier, per chirp row).

    nr must be 128*n2 with n2 <= 16 (or nr == 128) — the same shape gate as
    the monolithic kernel (pipeline.frontend_kernel_supported)."""
    ndc, nr, _ = iq.shape
    n1, n2, c2r, c2i, twr, twi = _ct_split(nr)
    if n2 > 16:
        raise ValueError(f"n_range={nr}: outer radix {n2} > 16")
    c1r, c1i = dft_matrices(n1)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    planes = jax.ShapeDtypeStruct((n2, ndc, n1), jnp.float32)
    if fixed:
        win = np.asarray(hamming_q15(nr, coef_width),
                         np.int32).reshape(n2, n1)
        shift = coef_width - 2
        rnd = (1 << shift) if window_rounding == "biased" else (1 << (shift - 1))
        mats = [jnp.asarray(x) for c in (c1r, c1i) for x in _split_matrix3(c)]
        out = pl.pallas_call(
            functools.partial(_kernel_range_fixed, n1=n1, n2=n2, c2r=c2r,
                              c2i=c2i, rnd=rnd, shift=shift),
            in_specs=[vmem()] * 11,
            out_specs=[vmem(), vmem(),
                       pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=[planes, planes,
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)],
            interpret=interpret, **kwargs,
        )(iq[..., 0], iq[..., 1], jnp.asarray(win), jnp.asarray(twr),
          jnp.asarray(twi), *mats)
        re_p, im_p, stats = out
    else:
        win = np.asarray(hamming_float(nr, coef_width),
                         np.float32).reshape(n2, n1)
        c1h, c1l = _split_matrix(c1r)
        s1h, s1l = _split_matrix(c1i)
        out = pl.pallas_call(
            functools.partial(_kernel_range, n1=n1, n2=n2, c2r=c2r, c2i=c2i),
            in_specs=[vmem()] * 9,
            out_specs=[vmem(), vmem()],
            out_shape=[planes, planes],
            interpret=interpret, **kwargs,
        )(iq[..., 0], iq[..., 1], jnp.asarray(win), jnp.asarray(twr),
          jnp.asarray(twi), jnp.asarray(c1h), jnp.asarray(c1l),
          jnp.asarray(s1h), jnp.asarray(s1l))
        re_p, im_p = out

    def dein(p):
        # plane k2 lane q = range bin n2*q + k2 -> natural (ndc, nr).
        return jnp.transpose(p, (1, 2, 0)).reshape(ndc, nr)

    if fixed:
        return dein(re_p), dein(im_p), stats[0, 0]
    return dein(re_p), dein(im_p)


# ---------------------------------------------------------------------------
# Kernel B: slow-time operator + magnitude + CFAR decision on a range shard
# ---------------------------------------------------------------------------

def _fill_rot(planes, lo, hi, rot_ref, *, n2l: int, n2d: int, n1: int,
              P: int, h: int, cmin: int, cmax: int):
    """Load the lane-rolled copies of the contiguous slices into the padded
    rotation scratch.  Plane index j*n2d + ps; sublane rows [P, P+n1) hold
    slice j, the P-row pads replicate the ADJACENT slice's edge rows (or the
    ``h`` exchanged halo rows at the shard edges).  ``lo``/``hi`` are
    per-parity lists of (h, ndl) halo planes (may be None when h == 0)."""
    ndl = planes[0].shape[1]
    for j in range(n2l):
        for ps in range(n2d):
            idx = j * n2d + ps
            for ci, c in enumerate(range(cmin, cmax + 1)):
                sh = (-c) % ndl
                r = pltpu.roll(planes[idx], sh, axis=1)
                rot_ref[ci, idx, pl.ds(P, n1)] = r
                if j > 0:
                    rp = pltpu.roll(planes[(j - 1) * n2d + ps], sh, axis=1)
                    rot_ref[ci, idx, pl.ds(P - h, h)] = rp[n1 - h:, :]
                elif h:
                    rot_ref[ci, idx, pl.ds(P - h, h)] = pltpu.roll(
                        lo[ps], sh, axis=1)
                if j < n2l - 1:
                    rn = pltpu.roll(planes[(j + 1) * n2d + ps], sh, axis=1)
                    rot_ref[ci, idx, pl.ds(P + n1, h)] = rn[:h, :]
                elif h:
                    rot_ref[ci, idx, pl.ds(P + n1, h)] = pltpu.roll(
                        hi[ps], sh, axis=1)


def _detect_epilogue_contig(mags, halo_lo, halo_hi, so, row_off, det_ref,
                            rot_ref, *, n2l: int, cfar, peak_radius: int,
                            integer: bool, n2d: int, n_range_total: int,
                            P: int):
    """CFAR decision + peak grouping on contiguous range slices: the variant
    logic of frontend_pallas._detect_epilogue (per-cell adaptive scale,
    os/ca/go/so estimates, integer/float thresholds — identical association
    order, so bit-exact against it per cell) with the contiguous row
    addressing: a row offset dr is the same slice at sublane offset dr,
    spilling into pad rows replicated from the adjacent slice / halo.

    When ``peak_radius > 0`` the decisions are also evaluated on the
    ``peak_radius`` halo rows beyond each shard edge (their full training
    windows are covered by the ``halo_range + peak_radius``-wide exchanged
    halo), so grouping sees the same neighbor decisions the adjacent shard
    computes for itself — bit-identical, since the halo columns are exact
    copies.  Tie-breaking uses GLOBAL row ids (``row_off`` = the shard's
    first global range bin, traced) so the semantics match single-chip
    ops/cfar.peak_group across the global wrap seam."""
    n1, ndl = mags[0].shape
    hr, hd = cfar.halo_range, cfar.halo_doppler
    h = hr + peak_radius
    k = cfar.n_ref - cfar.rank_idx
    cmin, cmax = _c_range(hd, n2d)
    _fill_rot(mags, halo_lo, halo_hi, rot_ref, n2l=n2l, n2d=n2d, n1=n1,
              P=P, h=h, cmin=cmin, cmax=cmax)
    offsets = _window_offsets(cfar)

    def decide(j, pd, b0, bn):
        """CFAR decision for rows [b0, b0+bn) of slice j (b0 relative to the
        slice start; the interior uses (0, n1), halo blocks spill into the
        pads)."""
        base = P + b0

        def ref(dr, dd):
            ps, c = _lane_carry(pd, dd, n2d)
            return rot_ref[c - cmin, j * n2d + ps, pl.ds(base + dr, bn)]

        cut = rot_ref[-cmin, j * n2d + pd, pl.ds(base, bn)]

        def box(r0, r1, d0, d1):
            # Same association order as frontend_pallas (_box2d_sum): inner
            # over dr ascending, outer over dd ascending, separable.
            cols = []
            for ps in range(n2d):
                col = None
                for dr in range(r0, r1 + 1):
                    v = rot_ref[-cmin, j * n2d + ps, pl.ds(base + dr, bn)]
                    col = v if col is None else col + v
                cols.append(col)
            acc = None
            for dd in range(d0, d1 + 1):
                ps, c = _lane_carry(pd, dd, n2d)
                t = (cols[ps] if c == 0
                     else pltpu.roll(cols[ps], (-c) % ndl, axis=1))
                acc = t if acc is None else acc + t
            return acc

        def half(r0, r1):
            acc = None
            for dr in range(r0, r1 + 1):
                row = None
                for dd in range(-hd, hd + 1):
                    v = ref(dr, dd)
                    row = v if row is None else row + v
                acc = row if acc is None else acc + row
            return acc

        def fdiv(s, n):
            return jnp.floor(s / np.float32(n)) if integer else s / n

        if cfar.variant != "os":
            gr, gd = cfar.guard_range, cfar.guard_doppler
            sum_refs = (box(-hr, hr, -hd, hd) - box(-gr, gr, -gd, gd)
                        if cfar.variant == "ca" else None)
            if cfar.variant == "ca":
                est = fdiv(sum_refs, cfar.n_ref)
            else:
                n_half = cfar.ref_range * cfar.win_doppler
                ml = fdiv(half(-hr, -gr - 1), n_half)
                mg = fdiv(half(gr + 1, hr), n_half)
                est = (jnp.maximum(ml, mg) if cfar.variant == "go"
                       else jnp.minimum(ml, mg))
            if sum_refs is None:
                sum_refs = box(-hr, hr, -hd, hd) - box(-gr, gr, -gd, gd)
            mean = fdiv(sum_refs, cfar.n_ref)
            if integer:
                halfm = jnp.floor(mean * 0.5)
                sc = jnp.where(est > mean + halfm, cfar.scale_max,
                               jnp.where(est < halfm, cfar.scale_min,
                                         cfar.scale_nom))
            else:
                sc = jnp.where(est > 1.5 * mean, cfar.scale_max,
                               jnp.where(est < 0.5 * mean, cfar.scale_min,
                                         cfar.scale_nom))
            scale_f = jnp.where(so != 0, so, sc).astype(jnp.float32)
            if integer:
                q = jnp.floor((cut - 1.0) / scale_f) + 1.0
                keep = est < q
            else:
                keep = cut > est * scale_f
            return jnp.where(keep, cut, jnp.zeros_like(cut))

        # OS variant, per-cell adaptive scale (os_cfar_2d.vhd:187-199):
        # mean pass + hi/lo classification + q_min counting — the two-pass
        # form of frontend_pallas._detect_epilogue, association order
        # preserved.
        gr, gd = cfar.guard_range, cfar.guard_doppler
        sum_refs = box(-hr, hr, -hd, hd) - box(-gr, gr, -gd, gd)
        mean = fdiv(sum_refs, cfar.n_ref)
        if integer:
            halfm = jnp.floor(mean * 0.5)
            t_hi = mean + halfm
            t_lo = halfm
        else:
            t_hi = 1.5 * mean
            t_lo = 0.5 * mean
        cnt_hi = jnp.zeros((bn, ndl), jnp.int32)
        cnt_lo = jnp.zeros((bn, ndl), jnp.int32)
        for dr, dd in offsets:
            v = ref(dr, dd)
            cnt_hi = cnt_hi + (v > t_hi).astype(jnp.int32)
            cnt_lo = cnt_lo + (v >= t_lo).astype(jnp.int32)
        sc = jnp.where(cnt_hi >= k, cfar.scale_max,
                       jnp.where(cnt_lo < k, cfar.scale_min,
                                 cfar.scale_nom))
        scale_f = jnp.where(so != 0, so, sc).astype(jnp.float32)
        if integer:
            q = jnp.floor((cut - 1.0) / scale_f) + 1.0
        else:
            ti = pltpu.bitcast(cut / scale_f, jnp.int32)
            q = pltpu.bitcast(ti + 1, jnp.float32)
            for delta in (0, -1, -2):
                c = pltpu.bitcast(ti + delta, jnp.float32)
                q = jnp.where(c * scale_f >= cut, c, q)
        cnt = jnp.zeros((bn, ndl), jnp.int32)
        for dr, dd in offsets:
            cnt = cnt + (ref(dr, dd) >= q).astype(jnp.int32)
        det = (cnt < k) & (cut > 0.0)
        return jnp.where(det, cut, jnp.zeros_like(cut))

    dets = []
    for j in range(n2l):
        for pd in range(n2d):
            dets.append(decide(j, pd, 0, n1))
    if peak_radius <= 0:
        for idx, d in enumerate(dets):
            det_ref[idx] = d
        return

    pr = peak_radius
    det_lo = [decide(0, pd, -pr, pr) for pd in range(n2d)]
    det_hi = [decide(n2l - 1, pd, n1, pr) for pd in range(n2d)]

    # Grouping pass: refill the scratch with det values (+ halo decisions in
    # the pads) and keep only strict (2r+1)^2 neighborhood maxima, ties
    # broken toward the lower GLOBAL linear id (ops/cfar.peak_group with
    # global row_ids — the sharded XLA path's exact semantics).
    gmin, gmax = _c_range(pr, n2d)
    _fill_rot(dets, det_lo, det_hi, rot_ref, n2l=n2l, n2d=n2d, n1=n1,
              P=P, h=pr, cmin=gmin, cmax=gmax)
    R = n_range_total
    ND = ndl * n2d
    dcol = jax.lax.broadcasted_iota(jnp.int32, (n1, ndl), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (n1, ndl), 0)
    for j in range(n2l):
        grow = row_off + j * n1 + qrow          # global row ids (traced)
        for pd in range(n2d):
            m = dets[j * n2d + pd]
            bad = None
            for dr in range(-pr, pr + 1):
                # neighbor id < mine for dr != 0 <=> its global row wraps
                # below mine (rows are distinct mod R).
                rowlt = (grow >= -dr) if dr < 0 else (grow >= R - dr)
                for dd in range(-pr, pr + 1):
                    if dr == 0 and dd == 0:
                        continue
                    ps, c = _lane_carry(pd, dd, n2d)
                    v = rot_ref[c - gmin, j * n2d + ps, pl.ds(P + dr, n1)]
                    if dr == 0:
                        if dd < 0:
                            thr = (-dd - pd + n2d - 1) // n2d
                        else:
                            thr = (ND - dd - pd + n2d - 1) // n2d
                        pred = dcol >= thr
                    else:
                        pred = rowlt
                    b = (v > m) | ((v == m) & pred)
                    bad = b if bad is None else bad | b
            keep = (m > 0.0) & ~bad
            det_ref[j * n2d + pd] = jnp.where(keep, m, jnp.zeros_like(m))


def _epilogue_outputs(mags, halo_lo, halo_hi, so, row_off, nonf_or_sat,
                      det_ref, mag_ref, stats_ref, rmax_ref, rot_ref, *,
                      n2l, cfar, detect, emit_topk, peak_radius, integer,
                      n2d, n_range_total, P):
    """Shared kernel-B tail: optional mag emission, detect epilogue, top-K
    candidate reduction, stats."""
    if mag_ref is not None:
        for idx, m in enumerate(mags):
            mag_ref[idx] = m
    if not detect:
        stats_ref[0, 0] = nonf_or_sat
        stats_ref[0, 1] = jnp.int32(0)
        return
    _detect_epilogue_contig(mags, halo_lo, halo_hi, so, row_off, det_ref,
                            rot_ref, n2l=n2l, cfar=cfar,
                            peak_radius=peak_radius, integer=integer,
                            n2d=n2d, n_range_total=n_range_total, P=P)
    ndet = jnp.zeros((), jnp.int32)
    if emit_topk:
        for idx in range(n2l * n2d):
            d = det_ref[idx]
            rmax_ref[idx] = jnp.max(d, axis=1, keepdims=True)
            ndet = ndet + jnp.sum((d > 0.0).astype(jnp.int32))
    stats_ref[0, 0] = nonf_or_sat
    stats_ref[0, 1] = ndet


def _pop_outputs(rest, detect, emit_mag, emit_topk):
    rest = list(rest)
    if detect:
        det_ref = rest.pop(0)
        mag_ref = rest.pop(0) if emit_mag else None
        stats_ref = rest.pop(0)
        rmax_ref = rest.pop(0) if emit_topk else None
        rot_ref = rest.pop(0)
    else:
        det_ref = rmax_ref = rot_ref = None
        mag_ref = rest.pop(0)
        stats_ref = rest.pop(0)
    return det_ref, mag_ref, stats_ref, rmax_ref, rot_ref


def _kernel_slowtime(re_ref, im_ref, hre_ref, him_ref,
                     mrh_ref, mrl_ref, mih_ref, mil_ref, *rest,
                     n2l: int, h: int, cfar, detect: bool, emit_mag: bool,
                     peak_radius: int, emit_topk: bool, exact_mag: bool,
                     n2d: int, P: int, d2r=None, d2i=None,
                     notch_mode: int = 2, transient: str = "zero",
                     n_range_total: int = 0):
    """Float kernel B body: fused slow-time contraction (step 5 / 5' of
    frontend_pallas._kernel, identical arithmetic) + magnitude + the
    contiguous detect epilogue.  For n2d == 1 the mr*/mi* refs carry the
    bypass-selected fused slow-time operator (doppler_matrices); for the
    long-CPI split they carry the DFT_128 splits and MTI/window run
    in-kernel (wd + ctl)."""
    rest = list(rest)
    wd_ref = rest.pop(0) if n2d > 1 else None
    if n2d > 1:
        dtwr_ref = rest.pop(0)
        dtwi_ref = rest.pop(0)
    ctl_ref = rest.pop(0)
    det_ref, mag_ref, stats_ref, rmax_ref, rot_ref = _pop_outputs(
        rest, detect, emit_mag, emit_topk)
    byp = ctl_ref[0]
    so = ctl_ref[1]
    row_off = ctl_ref[2]
    nd = re_ref.shape[0]
    n1 = 128

    def mm3(x, ch_ref, cl_ref, dn):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)
        return d(xh, ch_ref[...]) + (d(xl, ch_ref[...]) + d(xh, cl_ref[...]))

    dn0 = (((0,), (0,)), ((), ()))

    def mag_of(yr, yi):
        if exact_mag:
            return jnp.sqrt(yr * yr + yi * yi)
        ar = jnp.abs(yr)
        ai = jnp.abs(yi)
        return jnp.maximum(ar, ai) + 0.375 * jnp.minimum(ar, ai)

    def contract(br, bi):
        yr = mm3(br, mrh_ref, mrl_ref, dn0) - mm3(bi, mih_ref, mil_ref, dn0)
        yi = mm3(br, mih_ref, mil_ref, dn0) + mm3(bi, mrh_ref, mrl_ref, dn0)
        return yr, yi

    def slowtime_block(xr, xi):
        """(nd, W) post-range-FFT columns -> n2d (W, ndl) magnitude planes."""
        if n2d == 1:
            return [mag_of(*contract(xr, xi))]
        rows = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 0)

        def mti_f(x):
            d1 = jnp.where(rows >= 1, pltpu.roll(x, 1, 0), 0.0)
            if notch_mode == 2:
                y = x - d1
            else:
                d2 = jnp.where(rows >= 2, pltpu.roll(x, 2, 0), 0.0)
                y = x - 2.0 * d1 + d2
            if transient == "zero":
                y = jnp.where(rows >= notch_mode - 1, y, 0.0)
            return jnp.where(byp != 0, x, y)

        zr = mti_f(xr) * wd_ref[...]
        zi = mti_f(xi) * wd_ref[...]
        n1d = nd // n2d
        outs = []
        for k2d in range(n2d):
            br = bi = None
            for j2 in range(n2d):
                xbr = zr[j2 * n1d:(j2 + 1) * n1d, :]
                xbi = zi[j2 * n1d:(j2 + 1) * n1d, :]
                cr_, ci_ = float(d2r[j2, k2d]), float(d2i[j2, k2d])
                tr = xbr * cr_ - xbi * ci_
                ti = xbr * ci_ + xbi * cr_
                br = tr if br is None else br + tr
                bi = ti if bi is None else bi + ti
            if k2d > 0:
                twc_r = dtwr_ref[pl.ds(k2d * n1d, n1d)]
                twc_i = dtwi_ref[pl.ds(k2d * n1d, n1d)]
                br, bi = (br * twc_r - bi * twc_i,
                          br * twc_i + bi * twc_r)
            outs.append(mag_of(*contract(br, bi)))
        return outs

    mags, nonf = [], jnp.zeros((), jnp.int32)
    for j in range(n2l):
        planes = slowtime_block(re_ref[:, pl.ds(j * n1, n1)],
                                im_ref[:, pl.ds(j * n1, n1)])
        for m in planes:
            nonf = nonf + jnp.sum((~jnp.isfinite(m)).astype(jnp.int32))
        mags.extend(planes)
    halo_lo = halo_hi = None
    if h:
        hp = slowtime_block(hre_ref[...], him_ref[...])   # n2d x (2h, ndl)
        halo_lo = [m[:h, :] for m in hp]
        halo_hi = [m[h:, :] for m in hp]
    _epilogue_outputs(mags, halo_lo, halo_hi, so, row_off, nonf,
                      det_ref, mag_ref, stats_ref, rmax_ref, rot_ref,
                      n2l=n2l, cfar=cfar, detect=detect,
                      emit_topk=emit_topk, peak_radius=peak_radius,
                      integer=False, n2d=n2d,
                      n_range_total=n_range_total, P=P)


def _kernel_slowtime_fixed(re_ref, im_ref, hre_ref, him_ref,
                           cdh_ref, cdm_ref, cdl_ref,
                           sdh_ref, sdm_ref, sdl_ref, wind_ref, *rest,
                           n2l: int, h: int, cfar, detect: bool,
                           emit_mag: bool, peak_radius: int,
                           emit_topk: bool, n2d: int, P: int,
                           d2r=None, d2i=None, notch_mode: int = 2,
                           transient: str = "zero", rnd: int = 0,
                           shift: int = 14, n_range_total: int = 0):
    """Fixed kernel B body: saturating MTI + integer Doppler window + bf16x6
    Doppler DFT + per-range-row BFP + integer magnitude + integer detect —
    stages 6-10 of frontend_pallas._kernel_fixed, identical arithmetic, on
    contiguous range slices (input = kernel A's BFP-quantized int16-valued
    f32, post all-to-all)."""
    rest = list(rest)
    if n2d > 1:
        dtwr_ref = rest.pop(0)
        dtwi_ref = rest.pop(0)
    ctl_ref = rest.pop(0)
    det_ref, mag_ref, stats_ref, rmax_ref, rot_ref = _pop_outputs(
        rest, detect, emit_mag, emit_topk)
    byp = ctl_ref[0]
    so = ctl_ref[1]
    row_off = ctl_ref[2]
    nd = re_ref.shape[0]
    n1 = 128

    def mm6(x, h_ref, m_ref, l_ref, dn):
        xh = x.astype(jnp.bfloat16)
        r = x - xh.astype(jnp.float32)
        xm = r.astype(jnp.bfloat16)
        xl = (r - xm.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)
        return ((d(xl, h_ref[...]) + d(xm, m_ref[...]) + d(xh, l_ref[...]))
                + (d(xm, h_ref[...]) + d(xh, m_ref[...])) + d(xh, h_ref[...]))

    dn0 = (((0,), (0,)), ((), ()))
    sat_box = [jnp.zeros((), jnp.int32)]

    def int_mag(yr, yi):
        ar = jnp.abs(yr)
        ai = jnp.abs(yi)
        mx = jnp.maximum(ar, ai)
        mn = jnp.minimum(ar, ai)
        return mx + jnp.floor(mn * 0.25) + jnp.floor(mn * 0.125)

    def contract(br, bi):
        yr = (mm6(br, cdh_ref, cdm_ref, cdl_ref, dn0)
              - mm6(bi, sdh_ref, sdm_ref, sdl_ref, dn0))
        yi = (mm6(br, sdh_ref, sdm_ref, sdl_ref, dn0)
              + mm6(bi, cdh_ref, cdm_ref, cdl_ref, dn0))
        return yr, yi

    def slowtime_block(xr, xi):
        rows = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 0)

        def mti(x):
            d1 = jnp.where(rows >= 1, pltpu.roll(x, 1, 0), 0.0)
            if notch_mode == 2:
                y = x - d1
            else:
                d2 = jnp.where(rows >= 2, pltpu.roll(x, 2, 0), 0.0)
                y = x - 2.0 * d1 + d2
            y = jnp.clip(y, -32768.0, 32767.0)
            if transient == "zero":
                y = jnp.where(rows >= notch_mode - 1, y, 0.0)
            return jnp.where(byp != 0, x, y)

        def iwin(x_i32):
            p = x_i32 * wind_ref[...]
            sh = (p + rnd) >> shift
            sat_box[0] = sat_box[0] + jnp.sum(
                ((sh > 32767) | (sh < -32768)).astype(jnp.int32))
            return jnp.clip(sh, -32768, 32767).astype(jnp.float32)

        zr = iwin(mti(xr).astype(jnp.int32))
        zi = iwin(mti(xi).astype(jnp.int32))
        if n2d == 1:
            yr, yi = contract(zr, zi)
            pkd = jnp.max(jnp.maximum(jnp.abs(yr), jnp.abs(yi)),
                          axis=1, keepdims=True)
            scd = _bfp_scale(pkd)
            qz = lambda x: jnp.clip(jnp.round(x * scd), -32768.0, 32767.0)
            return [int_mag(qz(yr), qz(yi))]
        n1d = nd // n2d
        planes = []
        for k2d in range(n2d):
            br = bi = None
            for j2 in range(n2d):
                xbr = zr[j2 * n1d:(j2 + 1) * n1d, :]
                xbi = zi[j2 * n1d:(j2 + 1) * n1d, :]
                cr_, ci_ = float(d2r[j2, k2d]), float(d2i[j2, k2d])
                tr = xbr * cr_ - xbi * ci_
                ti = xbr * ci_ + xbi * cr_
                br = tr if br is None else br + tr
                bi = ti if bi is None else bi + ti
            if k2d > 0:
                twc_r = dtwr_ref[pl.ds(k2d * n1d, n1d)]
                twc_i = dtwi_ref[pl.ds(k2d * n1d, n1d)]
                br, bi = (br * twc_r - bi * twc_i,
                          br * twc_i + bi * twc_r)
            planes.append(contract(br, bi))
        pkd = None
        for yr, yi in planes:
            pm = jnp.max(jnp.maximum(jnp.abs(yr), jnp.abs(yi)), axis=1,
                         keepdims=True)
            pkd = pm if pkd is None else jnp.maximum(pkd, pm)
        scd = _bfp_scale(pkd)
        qz = lambda x: jnp.clip(jnp.round(x * scd), -32768.0, 32767.0)
        return [int_mag(qz(yr), qz(yi)) for yr, yi in planes]

    mags = []
    for j in range(n2l):
        mags.extend(slowtime_block(re_ref[:, pl.ds(j * n1, n1)],
                                   im_ref[:, pl.ds(j * n1, n1)]))
    # Snapshot the saturation count BEFORE the halo block: halo columns are
    # exact copies of columns the owning shard already counts, so including
    # their iwin() saturations would double-count every event within
    # halo_range of a shard seam vs the monolithic kernel (which counts
    # each column exactly once).  Mirrors the float kernel's nonf handling.
    sat_main = sat_box[0]
    halo_lo = halo_hi = None
    if h:
        hp = slowtime_block(hre_ref[...], him_ref[...])
        halo_lo = [m[:h, :] for m in hp]
        halo_hi = [m[h:, :] for m in hp]
    _epilogue_outputs(mags, halo_lo, halo_hi, so, row_off, sat_main,
                      det_ref, mag_ref, stats_ref, rmax_ref, rot_ref,
                      n2l=n2l, cfar=cfar, detect=detect,
                      emit_topk=emit_topk, peak_radius=peak_radius,
                      integer=True, n2d=n2d,
                      n_range_total=n_range_total, P=P)


@functools.partial(
    jax.jit,
    static_argnames=("cfar", "detect", "emit_mag", "emit_topk",
                     "peak_group_radius", "exact_mag", "fixed",
                     "notch_mode", "transient", "coef_width",
                     "window_rounding", "n_range_total", "interpret"))
def slowtime_detect(re: jnp.ndarray, im: jnp.ndarray,
                    halo_lo=None, halo_hi=None,
                    mti_bypass=False, scale_override=0, row_offset=0, *,
                    cfar=None, detect: bool = True, emit_mag: bool = False,
                    emit_topk: bool = True, peak_group_radius: int = 0,
                    exact_mag: bool = False, fixed: bool = False,
                    notch_mode: int = 2, transient: str = "zero",
                    coef_width: int = 16, window_rounding: str = "unbiased",
                    n_range_total: int = 0, interpret: bool = False):
    """Kernel B wrapper: post-corner-turn complex range shard (nd, nrl) ->
    CFAR detections (or magnitude) with everything after the all-to-all in
    ONE VMEM-resident kernel.

    ``halo_lo``/``halo_hi``: (re, im) pairs of (nd, h) complex columns —
    the ``h = cfar.halo_range + peak_group_radius`` range bins just below /
    above this shard's block (ring-exchanged by the caller; the RANGE-seam
    columns are the caller's choice, but the in-kernel decision itself is
    wrap-only — ``cfar.edge_mode == 'wrap'`` is validated, since the
    Doppler axis wraps by lane rolls).  The kernel
    computes their slow-time/magnitude (and, when grouping, their CFAR
    decisions) locally — bit-identical to what the owning shard computes,
    since they are exact copies of its columns.

    ``row_offset``: this shard's first global range bin (traced), for the
    peak-grouping global tie-break; ``n_range_total``: the global map's
    range extent (static).

    detect=True returns ``(det_planes (n2l*n2d, 128, ndl), mag | None,
    stat, row_max (n2l*n2d*128,), n_dets)`` where plane j*n2d + pd row q
    holds LOCAL map row 128*j + q, Doppler bin n2d*q_d + pd; ``stat`` is
    the nonfinite count (float) or the Doppler-window saturation count
    (fixed).  detect=False returns ``(mag (nrl, nd) natural, stat)`` — the
    block-scale sharded path's front-end.

    Constraints: nrl a multiple of 128 with nrl/128 <= 16; wrap-edge
    os/ca/go/so CfarParams with scale_mode='cell' for detect=True (block
    scale runs as detect=False + ops/cfar.block_scale_map_sharded + the
    standalone detect kernel); n_doppler <= 128 or a multiple of 128
    (long-CPI parity-plane split, radix <= 16)."""
    nd, nrl = re.shape
    if nrl % 128 or nrl // 128 > 16:
        raise ValueError(f"local range extent {nrl} must be a multiple of "
                         f"128 with nrl/128 <= 16")
    n2l = nrl // 128
    if nd > 128 and nd % 128 == 0:
        n1d, n2d, d2r, d2i, dtwr, dtwi = _ct_split_rows(nd)
        if n2d > 16:
            raise ValueError(f"n_doppler={nd}: outer radix {n2d} > 16")
    else:
        n1d, n2d, d2r, d2i, dtwr, dtwi = nd, 1, None, None, None, None
    ndl = nd // n2d
    pr = peak_group_radius
    if detect:
        if (cfar is None or cfar.variant not in ("os", "ca", "go", "so")
                or cfar.edge_mode != "wrap" or cfar.scale_mode != "cell"):
            raise ValueError(
                "slowtime_detect(detect=True) needs a wrap-edge CfarParams "
                "with variant os/ca/go/so and scale_mode='cell' (block "
                "scale uses detect=False + the standalone kernel)")
        h = cfar.halo_range + pr
        if pr > 0 and n_range_total <= 0:
            # The grouping tie-break compares GLOBAL wrap distances; with
            # the default n_range_total=0 the predicate degenerates (every
            # plateau cell sees its twin as the keeper) and tied targets
            # vanish instead of keeping one peak.
            raise ValueError(
                "peak_group_radius > 0 needs n_range_total (the GLOBAL "
                "range extent) for the wrap tie-break")
        if halo_lo is None or halo_hi is None:
            raise ValueError("detect=True needs halo_lo/halo_hi column "
                             "pairs (halo_range + peak_group_radius wide)")
        if halo_lo[0].shape != (nd, h):
            raise ValueError(f"halo shape {halo_lo[0].shape} != ({nd}, {h})"
                             f" (halo_range + peak_group_radius)")
    elif pr:
        raise ValueError("peak_group_radius needs detect=True")
    else:
        h = 0
    P = max(8, ((h + 7) // 8) * 8)
    if detect and cfar.halo_range > P:
        raise ValueError(f"halo_range {cfar.halo_range} exceeds the "
                         f"scratch row pad")
    if h:
        hre = jnp.concatenate([halo_lo[0], halo_hi[0]], axis=1)
        him = jnp.concatenate([halo_lo[1], halo_hi[1]], axis=1)
    else:
        hre = jnp.zeros((nd, 2), re.dtype)
        him = jnp.zeros((nd, 2), re.dtype)

    ctl = jnp.stack([jnp.asarray(mti_bypass).astype(jnp.int32),
                     jnp.asarray(scale_override).astype(jnp.int32),
                     jnp.asarray(row_offset).astype(jnp.int32)])
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)

    if fixed:
        cdr, cdi = dft_matrices(n1d if n2d > 1 else nd)
        mats = [jnp.asarray(x) for c in (cdr, cdi)
                for x in _split_matrix3(c)]
        wind = np.asarray(hamming_q15(nd, coef_width),
                          np.int32).reshape(nd, 1)
        shift = coef_width - 2
        rnd = ((1 << shift) if window_rounding == "biased"
               else (1 << (shift - 1)))
        operands = [re, im, hre, him, *mats, jnp.asarray(wind)]
        in_specs = [vmem()] * 11
        body = functools.partial(
            _kernel_slowtime_fixed, n2l=n2l, h=h, cfar=cfar, detect=detect,
            emit_mag=emit_mag or not detect, peak_radius=pr,
            emit_topk=emit_topk, n2d=n2d, P=P, d2r=d2r, d2i=d2i,
            notch_mode=notch_mode, transient=transient, rnd=rnd,
            shift=shift, n_range_total=n_range_total)
    else:
        if n2d == 1:
            m1r, m1i, m0r, m0i = doppler_matrices(nd, notch_mode, transient,
                                                  coef_width)
            m1 = [jnp.asarray(x) for m in (m1r, m1i)
                  for x in _split_matrix(m)]
            m0 = [jnp.asarray(x) for m in (m0r, m0i)
                  for x in _split_matrix(m)]
            byp = jnp.asarray(mti_bypass)
            mrh, mrl, mih, mil = [jnp.where(byp, a, b)
                                  for a, b in zip(m0, m1)]
        else:
            cdr, cdi = dft_matrices(n1d)
            mrh, mrl = [jnp.asarray(x) for x in _split_matrix(cdr)]
            mih, mil = [jnp.asarray(x) for x in _split_matrix(cdi)]
        operands = [re, im, hre, him, mrh, mrl, mih, mil]
        in_specs = [vmem()] * 8
        if n2d > 1:
            wd = np.asarray(hamming_float(nd, coef_width),
                            np.float32).reshape(nd, 1)
            operands += [jnp.asarray(wd)]
            in_specs += [vmem()]
        body = functools.partial(
            _kernel_slowtime, n2l=n2l, h=h, cfar=cfar, detect=detect,
            emit_mag=emit_mag or not detect, peak_radius=pr,
            emit_topk=emit_topk, exact_mag=exact_mag, n2d=n2d, P=P,
            d2r=d2r, d2i=d2i, notch_mode=notch_mode, transient=transient,
            n_range_total=n_range_total)
    if n2d > 1:
        operands += [jnp.asarray(dtwr), jnp.asarray(dtwi)]
        in_specs += [vmem(), vmem()]
    operands += [ctl]
    in_specs += [smem()]

    planes = jax.ShapeDtypeStruct((n2l * n2d, 128, ndl), jnp.float32)
    scratch = []
    if detect:
        out_shape = [planes]                                # det
        out_specs = [vmem()]
        if emit_mag:
            out_shape.append(planes)
            out_specs.append(vmem())
        out_shape.append(jax.ShapeDtypeStruct((1, 2), jnp.int32))
        out_specs.append(smem())
        if emit_topk:
            out_shape.append(jax.ShapeDtypeStruct((n2l * n2d, 128, 1),
                                                  jnp.float32))
            out_specs.append(vmem())
        wmin, wmax = _c_range(cfar.halo_doppler, n2d)
        gmin, gmax = _c_range(pr, n2d)
        n_rot = max(wmax - wmin + 1, gmax - gmin + 1)
        scratch = [pltpu.VMEM((n_rot, n2l * n2d, 128 + 2 * P, ndl),
                              jnp.float32)]
    else:
        out_shape = [planes, jax.ShapeDtypeStruct((1, 2), jnp.int32)]
        out_specs = [vmem(), smem()]

    out = pl.pallas_call(
        body, in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch, interpret=interpret, **kwargs,
    )(*operands)

    def dein(p):
        # plane j*n2d + pd, cell [q, q_d] -> map[128*j + q, n2d*q_d + pd].
        x = p.reshape(n2l, n2d, 128, ndl)
        return jnp.transpose(x, (0, 2, 3, 1)).reshape(nrl, nd)

    if not detect:
        return dein(out[0]), out[1][0, 0]
    det_s = out[0]
    mag = dein(out[1]) if emit_mag else None
    if not emit_topk:
        return det_s, mag, out[-1][0, 0], None, None
    stats = out[-2]
    rmax = out[-1].reshape(n2l * n2d * 128)
    return det_s, mag, stats[0, 0], rmax, stats[0, 1]


def split_topk_remap(local, n2l: int, n2d: int):
    """Map topk_detections row ids over the flattened contiguous det planes
    ((n2l*n2d*128, ndl) order) back to LOCAL (range_bin, doppler_bin):
    plane p = j*n2d + pd at sublane q is local row 128*j + q, Doppler bin
    n2d*q_d + pd.  Mutates and returns ``local``."""
    r = local["range_bin"]
    plane = r // 128
    local["range_bin"] = (plane // n2d) * 128 + r % 128
    if n2d > 1:
        local["doppler_bin"] = local["doppler_bin"] * n2d + plane % n2d
    return local


def split_frontend_frame(iq, mti_bypass=False, scale_override=0, *,
                         cfar, fixed: bool = False,
                         peak_group_radius: int = 0,
                         notch_mode: int = 2, transient: str = "zero",
                         coef_width: int = 16,
                         window_rounding: str = "unbiased",
                         exact_mag: bool = False, emit_mag: bool = False,
                         edge_mode: str = "wrap",
                         interpret: bool = False):
    """Single-chip (sp == 1 equivalent) composition of kernel A + kernel B
    with a self-halo: the A/B reference for the split pipeline and the
    parity anchor of the sharded fused path (runs both kernels
    back-to-back with the same dataflow an sp>1 mesh has, minus the
    collective).  Bit-exact against the monolithic fused kernel
    (tests/test_split_frontend.py)."""
    out_a = range_frontend(iq, fixed=fixed, coef_width=coef_width,
                           window_rounding=window_rounding,
                           interpret=interpret)
    if fixed:
        re, im, sat_r = out_a
    else:
        re, im = out_a
    h = cfar.halo_range + peak_group_radius
    if edge_mode != "wrap":
        # Kernel B's in-kernel decision wraps the Doppler axis by lane
        # rolls and validates cfar.edge_mode == 'wrap'; feeding it reflect
        # range halos would produce a range-reflect/Doppler-wrap hybrid
        # matching neither golden edge mode.  Reflect-edge configs run the
        # sharded kernel-B magnitude-only path + the standalone CFAR
        # kernel on reflect-padded maps (parallel/sharded.py) instead.
        raise ValueError(
            "split_frontend_frame's fused decision supports edge_mode="
            "'wrap' only (got %r); reflect configs take the kernel-B "
            "magnitude-only + standalone-CFAR composition" % (edge_mode,))
    lo = (re[:, -h:], im[:, -h:])
    hi = (re[:, :h], im[:, :h])
    det_s, mag, stat, rmax, ndets = slowtime_detect(
        re, im, lo, hi, mti_bypass, scale_override, 0,
        cfar=cfar, detect=True, emit_mag=emit_mag,
        peak_group_radius=peak_group_radius, exact_mag=exact_mag,
        fixed=fixed, notch_mode=notch_mode, transient=transient,
        coef_width=coef_width, window_rounding=window_rounding,
        n_range_total=iq.shape[1], interpret=interpret)
    if fixed:
        stat = stat + sat_r
    return det_s, mag, stat, rmax, ndets

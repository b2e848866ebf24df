"""Pallas TPU kernel: fused radar front-end (I/Q frame -> magnitude map).

The XLA float front-end (range window+FFT matmuls -> fused Doppler operator
-> magnitude) measures ~28 us/frame and is *MXU-bound at bf16x3*: the dense
(nr, nr) DFT matmul costs 4*nd*nr^2 MACs x3 passes (~17 us/frame of pure
MACs at nr=1024) and a lane-friendly Cooley-Tukey restructure in XLA loses
its MAC savings to HBM relayouts (docs/PERF_LOG.md).  In VMEM those
relayouts are free.  This kernel runs the whole front-end per frame with
every intermediate in VMEM and the FFT in Cooley-Tukey form:

    int16 I/Q (nd, nr) x2, viewed as n2 contiguous lane slices of width
    n1 = 128 (s = n1*j2 + j1):
      1. Hamming window (elementwise, Q15 float weights)
      2. outer DFT_n2 over the slices: n2^2 scalar-weighted (nd, n1) adds
         on the VPU (full f32 — better than the MXU's bf16x3)
      3. twiddle W_nr^(j1*k2): one (1, n1) row broadcast per slice
      4. inner DFT_n1: per-slice (nd, n1) @ (n1, n1) MXU dots
      5. fused slow-time operator (window + MTI + Doppler DFT + corner
         turn, ops/fft.doppler_matrices): per-slice contraction over the
         chirp axis -> (n1, nd) range-major
      6. alpha-max-beta-min (or exact) magnitude
    -> f32 magnitude (n2, n1, nd); row 8q+k2 of the map is [k2, q] — the
       caller de-interleaves with one cheap XLA transpose+reshape.

    MAC count: 4*3*(nd*nr*n1 + nr*nd*nd) ~ 0.4 G for 1024x128 — 4x less
    than the dense XLA path.

Mosaic in-kernel dots only support DEFAULT (1-pass bf16 — fails detection
parity, docs/PERF_LOG.md) and HIGHEST (bf16x6 — 2x the passes of XLA's
HIGH, measured slower).  The kernel therefore implements **bf16x3
manually**: each f32 operand splits exactly into bf16 hi + lo residual and
each real matmul is three DEFAULT-precision MXU passes
``xh@Ch + (xl@Ch + xh@Cl)`` — the same decomposition XLA's Precision.HIGH
uses — with the matrices pre-split host-side.  Numerics match the XLA HIGH
path's error model; agreement is to f32 tolerance, not bit-exact —
bench.py's runtime detection-parity gate and
tests/test_frontend_pallas.py bound the difference.

Capabilities cited for parity: window_multiplier + xfft chain
(rtl/src/radar_core.vhd:267-390), doppler_notch.vhd:72-94,
magnitude_calc.vhd:70-88.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import dft_matrices, doppler_matrices
from ..golden.fixed_point import _window_offsets


def _split_matrix(c: np.ndarray):
    """f32 matrix -> (bf16 hi, bf16 lo) with hi + lo == c to ~2^-17 rel."""
    c = np.asarray(c, np.float32)
    hi = c.astype(jnp.bfloat16)
    lo = (c - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _split_matrix3(c: np.ndarray):
    """f32 matrix -> (bf16 hi, mid, lo) with hi+mid+lo == c to ~2^-25 rel —
    the 3-term operand split of XLA's Precision.HIGHEST (bf16x6)."""
    c = np.asarray(c, np.float32)
    hi = c.astype(jnp.bfloat16)
    r = c - np.asarray(hi, np.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - np.asarray(mid, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(mid), np.asarray(lo)


@functools.lru_cache(maxsize=8)
def _ct_split(nr: int):
    """(n1, n2, W_n2 (n2, n2) re/im, twiddle (n2, n1) re/im) for the
    n2-major split s = n1*j2 + j1 with n1 = 128."""
    n1 = min(nr, 128)
    assert nr % n1 == 0
    n2 = nr // n1
    j2 = np.arange(n2)[:, None].astype(np.float64)
    k2 = np.arange(n2)[None, :].astype(np.float64)
    a2 = -2.0 * np.pi * j2 * k2 / n2
    j1 = np.arange(n1)[None, :].astype(np.float64)
    at = -2.0 * np.pi * k2.T * j1 / nr               # W_nr^(j1*k2)
    return (n1, n2, np.cos(a2).astype(np.float32), np.sin(a2).astype(np.float32),
            np.cos(at).astype(np.float32), np.sin(at).astype(np.float32))


@functools.lru_cache(maxsize=8)
def _ct_split_rows(nd: int):
    """Row-block Cooley-Tukey split of the chirp (sublane) axis for long
    CPIs: j = n1d*j2 + j1 with n1d = 128 (contiguous row blocks).

    Returns (n1d, n2d, W_n2d (n2d, n2d) re/im, twiddle (n2d*n1d, 1) re/im
    with row k2d*n1d + j1 = W_nd^(j1*k2d)).  Output Doppler bins come out
    interleaved across the n2d "parity" planes: plane k2d row q_d holds
    bin n2d*q_d + k2d — the row-axis mirror of _ct_split's range
    interleave, handled by the same (plane, carry) addressing in the
    detect/grouping epilogues."""
    n1d = min(nd, 128)
    assert nd % n1d == 0
    n2d = nd // n1d
    j2 = np.arange(n2d)[:, None].astype(np.float64)
    k2 = np.arange(n2d)[None, :].astype(np.float64)
    a2 = -2.0 * np.pi * j2 * k2 / n2d
    j1 = np.arange(n1d)[None, :].astype(np.float64)
    at = -2.0 * np.pi * k2.T * j1 / nd               # (n2d, n1d)
    return (n1d, n2d,
            np.cos(a2).astype(np.float32), np.sin(a2).astype(np.float32),
            np.cos(at).astype(np.float32).reshape(n2d * n1d, 1),
            np.sin(at).astype(np.float32).reshape(n2d * n1d, 1))


def _lane_carry(pd: int, dd: int, n2d: int):
    """Doppler offset ``dd`` from a cell on parity plane ``pd``: source
    parity and lane carry.  bin = n2d*q_d + pd; bin + dd = n2d*(q_d + c)
    + ps, so the neighbor lives on parity plane ps at lane q_d + c (lane
    rolls implement the mod-n1d wrap, which IS the mod-nd Doppler wrap —
    parity is preserved under it)."""
    ps = (pd + dd) % n2d
    return ps, (pd + dd - ps) // n2d


def _c_range(h: int, n2d: int):
    """Lane-carry range [cmin, cmax] needed for Doppler offsets |dd| <= h
    from any parity: cmin = floor(-h/n2d), cmax = floor((n2d-1+h)/n2d).
    n2d == 1 degenerates to [-h, h] (one rotated copy per dd, the original
    layout)."""
    return -((h + n2d - 1) // n2d), (n2d - 1 + h) // n2d


def _block_scale(mags, *, n2: int, cfar, integer: bool = False,
                 n2d: int = 1):
    """Clutter-map scale (CfarParams.scale_mode='block', design_notes §8)
    computed from the in-VMEM mag slices when scale_block == n2 == nd//16...

    Exploits the sliced layout: map rows n2*q + k2 for fixed q are exactly
    one 8-row block, so block-ROW sums are just sum over the n2 slices —
    and the resulting scale plane (block-constant over rows within q) is a
    single (n1, nd) output valid for every k2.  Doppler-axis block sums and
    the 3x3 neighborhood run as lane rolls; counts stay exact int32 on the
    VPU.  Same own-block-threshold semantics as ops/cfar.block_scale_map
    (float sum order differs in ulps — the fused frontend's mag already
    differs from the XLA path's by more).

    ``n2d > 1`` (long-CPI Doppler split): ``mags`` holds n2*n2d planes of
    (n1, nd/n2d), index k2*n2d + pd, Doppler bins interleaved as
    n2d*q_d + pd.  A Doppler block of B consecutive bins is then lanes
    [g*B/n2d, (g+1)*B/n2d) of EVERY parity — summing parities first (block
    sums are linear) reduces the lane grouping to width B/n2d, and the one
    (n1, nd/n2d) scale plane stays valid for every plane (parity does not
    change a cell's block).  Needs B % n2d == 0 (wrapper-checked).
    """
    B = cfar.scale_block
    Bl = B // n2d                     # block width in LANES per parity
    N = 9 * B * B
    rank_idx = min((N * cfar.rank_pct) // 100, N - 1)
    k = N - rank_idx

    def roll(x, sh, axis):
        # pltpu.roll requires a non-negative shift; jnp.roll semantics.
        return pltpu.roll(x, sh % x.shape[axis], axis)

    def rows3(x):
        return x + roll(x, 1, 0) + roll(x, -1, 0)

    def lane_group_bcast(x):
        """Sum lanes in groups of Bl, value broadcast to every lane of its
        group: sliding sum (valid at group leaders) + log leader-bcast."""
        s = x
        for j in range(1, Bl):
            s = s + roll(x, -j, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        v = s
        step = 1
        while step < Bl:
            v = jnp.where((lane % Bl) & step != 0, roll(v, step, 1), v)
            step *= 2
        return v

    def groups3(x):
        return x + roll(x, Bl, 1) + roll(x, -Bl, 1)

    if integer:
        # ops/cfar.block_scale_map integer semantics: int32 block sums (the
        # 9-block neighborhood sum can exceed 2^24, so f32 accumulation is
        # not exact), floor-divided mean, shift-based thresholds.  The mag
        # planes hold int16-magnitude values in f32; sums stay exact int32.
        r = mags[0].astype(jnp.int32)
        for k2 in range(1, len(mags)):
            r = r + mags[k2].astype(jnp.int32)
        nsum = groups3(lane_group_bcast(rows3(r)))
        # Exact floor(nsum / N): the f32 quotient of a (possibly >2^24)
        # int32 is within +-1 of the true floor; one multiply-back
        # correction fixes it.
        q0 = jnp.floor(nsum.astype(jnp.float32)
                       / np.float32(N)).astype(jnp.int32)
        rem = nsum - q0 * N
        mean = q0 + (rem >= N).astype(jnp.int32) - (rem < 0).astype(jnp.int32)
        t_hi = mean + (mean >> 1)
        t_lo = mean >> 1
        ind = None
        for k2 in range(len(mags)):
            mi = mags[k2].astype(jnp.int32)
            t = ((mi > t_hi).astype(jnp.int32)
                 + ((mi >= t_lo).astype(jnp.int32) << 12))
            ind = t if ind is None else ind + t
        packed = groups3(lane_group_bcast(rows3(ind)))
        cnt_hi = packed & 4095
        cnt_lo = packed >> 12
        return jnp.where(
            cnt_hi >= k, cfar.scale_max,
            jnp.where(cnt_lo < k, cfar.scale_min, cfar.scale_nom)).astype(
                jnp.int32)
    r = mags[0]
    for k2 in range(1, len(mags)):
        r = r + mags[k2]                      # block-row sums (q, kd) f32
    nsum = groups3(lane_group_bcast(rows3(r)))
    mean = nsum * (1.0 / N)
    t_hi = 1.5 * mean
    t_lo = 0.5 * mean
    ind = ((mags[0] > t_hi).astype(jnp.int32)
           + ((mags[0] >= t_lo).astype(jnp.int32) << 12))
    for k2 in range(1, len(mags)):
        ind = ind + ((mags[k2] > t_hi).astype(jnp.int32)
                     + ((mags[k2] >= t_lo).astype(jnp.int32) << 12))
    packed = groups3(lane_group_bcast(rows3(ind)))
    cnt_hi = packed & 4095
    cnt_lo = packed >> 12
    return jnp.where(
        cnt_hi >= k, cfar.scale_max,
        jnp.where(cnt_lo < k, cfar.scale_min, cfar.scale_nom)).astype(
            jnp.int32)


def _outer_fft_planes(xr_s, xi_s, n2: int):
    """Radix-2 outer DFT over the n2 slice *planes* (each a (nd, n1) f32
    pair): iterative DIT Cooley-Tukey with bit-reversed input, natural-order
    output — identical to the direct outer DFT in exact arithmetic, ~8x
    fewer elementwise plane-ops at n2 = 8 (~63 vs 512; trivial twiddles
    w = 1 / w = -i cost no multiplies).  n2 must be a power of two."""
    import math
    nb = n2.bit_length() - 1
    def rev(i):
        r = 0
        for b in range(nb):
            if i >> b & 1:
                r |= 1 << (nb - 1 - b)
        return r
    re = [xr_s[rev(j)] for j in range(n2)]
    im = [xi_s[rev(j)] for j in range(n2)]
    m = 2
    while m <= n2:
        half = m // 2
        for start in range(0, n2, m):
            for t in range(half):
                i0, i1 = start + t, start + t + half
                br, bi = re[i1], im[i1]
                if t == 0:                        # w = 1
                    tr, ti = br, bi
                elif 4 * t == m:                  # w = -i
                    tr, ti = bi, -br
                else:
                    ang = -2.0 * math.pi * t / m
                    wr, wi = math.cos(ang), math.sin(ang)
                    tr = br * wr - bi * wi
                    ti = br * wi + bi * wr
                re[i1], im[i1] = re[i0] - tr, im[i0] - ti
                re[i0], im[i0] = re[i0] + tr, im[i0] + ti
        m *= 2
    return re, im


_DET_PAD = 8  # sublane pad rows in the detect scratch (8-aligned stores)


def _rotate_into(m, rot_ref, j, k2, shift):
    """Store the lane-rolled copy of ``m`` (roll by ``shift``) into rotation
    plane ``j`` of the padded scratch, replicating _DET_PAD wrap rows on each
    sublane edge (the row-wrap counterpart of the lane roll)."""
    n1 = m.shape[0]
    P = _DET_PAD
    r = pltpu.roll(m, shift, axis=1)
    rot_ref[j, k2, pl.ds(P, n1)] = r
    rot_ref[j, k2, pl.ds(0, P)] = r[n1 - P:, :]
    rot_ref[j, k2, pl.ds(P + n1, P)] = r[:P, :]


def _peak_group_epilogue(dets, det_ref, rot_ref, *, n2: int, radius: int,
                         n2d: int = 1):
    """Peak grouping fused into the front-end kernel: keep a detection only
    if it is the max of its (2r+1)^2 wrap-padded neighborhood, ties broken
    toward the lower linear index — identical semantics to ops/cfar.peak_group
    (and golden fixed_point.peak_group), evaluated on the in-VMEM det slices.

    In the interleaved slice layout (true map row n2*q + k2 at dets[k2][q]) a
    neighbor at true-row offset dr is a static sub-row of slice (k2+dr) mod n2
    (same addressing as _detect_epilogue).  The tie predicate "neighbor linear
    id < mine" needs no id planes: for dr != 0 it collapses to a row-wrap test
    (true rows are distinct mod n_range), for dr == 0 to a column-wrap test —
    both static iota compares.

    ``n2d > 1`` (long-CPI Doppler split): Doppler bins are additionally
    interleaved across parity planes (plane index k2*n2d + pd, bin =
    n2d*q_d + pd); a Doppler offset dd resolves to (parity, lane-carry) via
    _lane_carry, and the dr == 0 tie test becomes a parity-adjusted
    lane-wrap threshold.
    """
    n1, ndl = dets[0].shape
    R = n1 * n2
    ND = ndl * n2d
    P = _DET_PAD
    gmin, gmax = _c_range(radius, n2d)
    for idx in range(n2 * n2d):
        for j, c in enumerate(range(gmin, gmax + 1)):
            # rot[j][:, l] = det[:, (l + c) mod ndl]
            _rotate_into(dets[idx], rot_ref, j, idx, (-c) % ndl)
    dcol = jax.lax.broadcasted_iota(jnp.int32, (n1, ndl), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (n1, ndl), 0)
    for k2 in range(n2):
      for pd in range(n2d):
        m = dets[k2 * n2d + pd]
        row = qrow * n2 + k2
        bad = None
        for dr in range(-radius, radius + 1):
            # nid < id for dr != 0 <=> neighbor's true row wraps below mine.
            rowlt = (row >= -dr) if dr < 0 else (row >= R - dr)
            for dd in range(-radius, radius + 1):
                if dr == 0 and dd == 0:
                    continue
                ps, c = _lane_carry(pd, dd, n2d)
                v = rot_ref[c - gmin, ((k2 + dr) % n2) * n2d + ps,
                            pl.ds(P + (k2 + dr) // n2, n1)]
                if dr == 0:
                    # neighbor bin < mine <=> bin + dd crossed 0 / ND:
                    # bin = n2d*q_d + pd, so the threshold on q_d carries
                    # the parity (exact ceil; degenerates to the n2d == 1
                    # -dd / nd-dd forms).
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
        det_ref[k2 * n2d + pd] = jnp.where(keep, m, jnp.zeros_like(m))


def _detect_epilogue(mags, scale, so, det_ref, rot_ref, *, n2: int, cfar,
                     peak_radius: int = 0, integer: bool = False,
                     percell_onepass: bool = False, n2d: int = 1):
    """CFAR detection pass fused into the front-end kernel: the exact
    counting formulation of ops/cfar_pallas._kernel_detect_scaled (float
    mode, q_min probing), evaluated on the in-VMEM mag slices so the
    magnitude map never round-trips HBM before the decision.

    ``scale=None`` selects the reference-exact *per-cell* adaptive scale
    (scale_mode='cell'): the mean + hi/lo classification counting passes of
    ops/cfar_pallas._kernel_detect run per slice on the same rotated copies
    (identical accumulation order, so bit-exact against that kernel).
    Otherwise ``scale`` is the shared block-mode (n1, nd) plane — valid for
    every slice because scale_block == n2 makes true row n2*q + k2 fall in
    block row q regardless of k2.

    Non-OS variants (cfar.variant in 'ca'/'go'/'so'): the threshold estimate
    comes straight from training-window sums instead of the rank counting —
    full-window-minus-guard mean for CA, greater/smaller-of the lead/lag
    half-window means for GO/SO (ops/cfar._ref_sums semantics) — accumulated
    in the same separable association order as the XLA path so the fused and
    standalone decisions agree on the golden frames.

    ``integer=True`` (the fixed-point fused kernel): the mag planes hold
    int16-magnitude values in f32; all divisions become exact floors (the
    operands stay < 2^24 so the f32 quotient's floor is the true integer
    floor — the argument of ops/cfar_pallas._kernel_detect's exact_div) and
    the threshold decision uses the integer semantics of ops/cfar.cfar_2d
    (est*scale threshold; ceil-division counting for OS).

    The map rows are interleaved across the n2 slices (true row
    r = n2*q + k2 lives at mags[k2][q]), so a window offset of dr true rows
    from slice k2 is slice (k2+dr) mod n2 at a sublane offset of
    floor((k2+dr)/n2) — a *static* sub-row load once each slice's
    win_doppler lane-rotated copies sit in the padded ``rot_ref`` scratch
    (lane rolls implement the wrap edge_mode; the sublane pads replicate the
    row wrap).  Per reference cell the hot loop is one load + compare + add,
    identical op structure to the standalone kernel, with the XLA-side pad,
    the mag HBM round trip and the separate dispatch all gone.

    ``n2d > 1`` (long-CPI Doppler split): Doppler bins are additionally
    interleaved across parity planes (plane index k2*n2d + pd, bin =
    n2d*q_d + pd) — a Doppler offset dd resolves to a (parity, lane-carry)
    pair via _lane_carry exactly as a range offset resolves to a
    (slice, row-carry) pair, and the rotation scratch holds one lane-carry
    copy per (carry, plane) instead of one per (dd, slice).  Every
    per-cell association tree (box sums, counting passes) is unchanged, so
    the bit-exactness contracts above carry over verbatim.
    """
    n1, ndl = mags[0].shape
    hr, hd = cfar.halo_range, cfar.halo_doppler
    k = cfar.n_ref - cfar.rank_idx
    P = _DET_PAD
    cmin, cmax = _c_range(hd, n2d)
    for idx in range(n2 * n2d):
        for j, c in enumerate(range(cmin, cmax + 1)):
            # rot[j][:, l] = m[:, (l + c) mod ndl] (the lane-slice-of-
            # padded-map layout of the standalone kernel's rot_ref).
            _rotate_into(mags[idx], rot_ref, j, idx, (-c) % ndl)
    if scale is not None:
        scale = jnp.where(so != 0, so, scale)
        scale_f = scale.astype(jnp.float32)
    offsets = _window_offsets(cfar)
    dets = []
    for k2 in range(n2):
      for pd in range(n2d):
        cut = mags[k2 * n2d + pd]

        def ref(dr, dd):
            ps, c = _lane_carry(pd, dd, n2d)
            return rot_ref[c - cmin, ((k2 + dr) % n2) * n2d + ps,
                           pl.ds(P + (k2 + dr) // n2, n1)]

        def box(r0, r1, d0, d1):
            """Window sum over dr in [r0, r1] x dd in [d0, d1], inner sum
            over dr ascending then outer over dd ascending — the association
            order of ops/cfar._box2d_sum.  Separable: the dr column sum is
            computed once per parity (on the un-rotated planes) and reused
            for every dd via lane rolls — each output cell's addition tree
            is identical to the direct double loop (sum_dd of sum_dr), so
            this is bit-exact with it, at ~(W_r + 2*W_d) plane-ops instead
            of W_r*W_d."""
            cols = []
            for ps in range(n2d):
                col = None
                for dr in range(r0, r1 + 1):
                    v = rot_ref[-cmin, ((k2 + dr) % n2) * n2d + ps,
                                pl.ds(P + (k2 + dr) // n2, n1)]
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
            """Lead/lag half-window sum: inner over dd ascending, outer over
            dr ascending (ops/cfar._ref_sums' cols-then-rows order)."""
            acc = None
            for dr in range(r0, r1 + 1):
                row = None
                for dd in range(-hd, hd + 1):
                    v = ref(dr, dd)
                    row = v if row is None else row + v
                acc = row if acc is None else acc + row
            return acc

        def fdiv(s, n):
            # Exact integer floor(s / n) on int-valued f32 (s < 2^24).
            return jnp.floor(s / np.float32(n)) if integer else s / n

        if cfar.variant != "os":
            # CA/GO/SO: the estimate is a training-window mean, computed
            # directly from the rotated slices (no rank counting pass).
            # sum_refs is only needed for CA's estimate and the per-cell
            # scale classification — GO/SO in block mode skip it entirely.
            gr, gd = cfar.guard_range, cfar.guard_doppler
            sum_refs = (box(-hr, hr, -hd, hd) - box(-gr, gr, -gd, gd)
                        if cfar.variant == "ca" or scale is None else None)
            if cfar.variant == "ca":
                est = fdiv(sum_refs, cfar.n_ref)
            else:
                n_half = cfar.ref_range * cfar.win_doppler
                ml = fdiv(half(-hr, -gr - 1), n_half)
                mg = fdiv(half(gr + 1, hr), n_half)
                est = (jnp.maximum(ml, mg) if cfar.variant == "go"
                       else jnp.minimum(ml, mg))
            if scale is None:
                # Per-cell adaptive scale: est vs the full training mean
                # (os_cfar_2d.vhd:187-199 rule applied to this variant).
                mean = fdiv(sum_refs, cfar.n_ref)
                if integer:
                    halfm = jnp.floor(mean * 0.5)        # mean >> 1
                    sc = jnp.where(est > mean + halfm, cfar.scale_max,
                                   jnp.where(est < halfm, cfar.scale_min,
                                             cfar.scale_nom))
                else:
                    sc = jnp.where(est > 1.5 * mean, cfar.scale_max,
                                   jnp.where(est < 0.5 * mean, cfar.scale_min,
                                             cfar.scale_nom))
                scale_f = jnp.where(so != 0, so, sc).astype(jnp.float32)
            if integer:
                # Exact integer threshold: cut > est*scale <=> est < q with
                # q = ceil(cut/scale) — avoids the f32 est*scale product,
                # which loses exactness past 2^24 (large scale_override).
                q = jnp.floor((cut - 1.0) / scale_f) + 1.0
                keep = est < q
            else:
                keep = cut > est * scale_f
            det = jnp.where(keep, cut, jnp.zeros_like(cut))
            if peak_radius > 0:
                dets.append(det)
            else:
                det_ref[k2 * n2d + pd] = det
            continue

        if scale is None and percell_onepass:
            # MERGED one-pass per-cell variant (A/B alternative to the
            # two-pass form below — see docs/PERF_LOG.md): the hi/lo
            # classification compares and the detection counting share ONE
            # loop over the rotated planes (one load per reference cell
            # instead of two), at the cost of counting the detection
            # decision against all three scale candidates (5 compares+adds
            # per ref vs the split form's 3).  A non-zero scale_override
            # folds into the three candidates (all equal), so the
            # hi/lo-based pick is then trivially correct.
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

            def qmin(sc_scalar):
                sf = sc_scalar.astype(jnp.float32)
                if integer:
                    return jnp.floor((cut - 1.0) / sf) + 1.0
                ti = pltpu.bitcast(cut / sf, jnp.int32)
                qq = pltpu.bitcast(ti + 1, jnp.float32)
                for delta in (0, -1, -2):
                    c = pltpu.bitcast(ti + delta, jnp.float32)
                    qq = jnp.where(c * sf >= cut, c, qq)
                return qq

            q_lo = qmin(jnp.where(so != 0, so, cfar.scale_min))
            q_nom = qmin(jnp.where(so != 0, so, cfar.scale_nom))
            q_hi = qmin(jnp.where(so != 0, so, cfar.scale_max))
            z = jnp.zeros((n1, ndl), jnp.int32)
            c_hi, c_lo, n_lo, n_nom, n_hi = z, z, z, z, z
            for dr, dd in offsets:
                v = ref(dr, dd)
                c_hi = c_hi + (v > t_hi).astype(jnp.int32)
                c_lo = c_lo + (v >= t_lo).astype(jnp.int32)
                n_lo = n_lo + (v >= q_lo).astype(jnp.int32)
                n_nom = n_nom + (v >= q_nom).astype(jnp.int32)
                n_hi = n_hi + (v >= q_hi).astype(jnp.int32)
            cnt = jnp.where(c_hi >= k, n_hi,
                            jnp.where(c_lo < k, n_lo, n_nom))
            det = (cnt < k) & (cut > 0.0)
            det = jnp.where(det, cut, jnp.zeros_like(cut))
            if peak_radius > 0:
                dets.append(det)
            else:
                det_ref[k2 * n2d + pd] = det
            continue

        if scale is None:
            # Per-cell adaptive scale (os_cfar_2d.vhd:187-199): mean pass A
            # + hi/lo classification pass B of _kernel_detect.  The mean
            # comes from separable full-minus-guard box sums in the
            # association order of ops/cfar._ref_sums — bit-identical to
            # _kernel_detect's (same tree; the XLA OS branch sums its ref
            # stack instead, so agreement with it is decision-equivalent),
            # at ~35 plane-ops instead of n_ref=128 direct adds.
            gr, gd = cfar.guard_range, cfar.guard_doppler
            sum_refs = box(-hr, hr, -hd, hd) - box(-gr, gr, -gd, gd)
            mean = fdiv(sum_refs, cfar.n_ref)
            if integer:
                halfm = jnp.floor(mean * 0.5)            # mean >> 1
                t_hi = mean + halfm
                t_lo = halfm
            else:
                t_hi = 1.5 * mean
                t_lo = 0.5 * mean
            cnt_hi = jnp.zeros((n1, ndl), jnp.int32)
            cnt_lo = jnp.zeros((n1, ndl), jnp.int32)
            for dr, dd in offsets:
                v = ref(dr, dd)
                cnt_hi = cnt_hi + (v > t_hi).astype(jnp.int32)
                cnt_lo = cnt_lo + (v >= t_lo).astype(jnp.int32)
            sc = jnp.where(cnt_hi >= k, cfar.scale_max,
                           jnp.where(cnt_lo < k, cfar.scale_min,
                                     cfar.scale_nom))
            scale_f = jnp.where(so != 0, so, sc).astype(jnp.float32)
        if integer:
            # Integer threshold semantics (cfar_2d / _kernel_detect
            # exact_div): refs*scale >= cut  <=>  refs >= ceil(cut/scale).
            q = jnp.floor((cut - 1.0) / scale_f) + 1.0
        else:
            # Exact q_min: smallest float whose rounded product with scale
            # reaches cut (see ops/cfar_pallas._kernel_detect float pass C).
            ti = pltpu.bitcast(cut / scale_f, jnp.int32)
            q = pltpu.bitcast(ti + 1, jnp.float32)
            for delta in (0, -1, -2):
                c = pltpu.bitcast(ti + delta, jnp.float32)
                q = jnp.where(c * scale_f >= cut, c, q)
        cnt = jnp.zeros((n1, ndl), jnp.int32)
        for dr, dd in offsets:
            cnt = cnt + (ref(dr, dd) >= q).astype(jnp.int32)
        det = (cnt < k) & (cut > 0.0)
        det = jnp.where(det, cut, jnp.zeros_like(cut))
        if peak_radius > 0:
            dets.append(det)       # group once all slices are decided
        else:
            det_ref[k2 * n2d + pd] = det
    if peak_radius > 0:
        _peak_group_epilogue(dets, det_ref, rot_ref, n2=n2,
                             radius=peak_radius, n2d=n2d)


def _kernel(re_ref, im_ref, win_ref, twr_ref, twi_ref,
            c1h_ref, c1l_ref, s1h_ref, s1l_ref,
            mrh_ref, mrl_ref, mih_ref, mil_ref, *rest,
            n1: int, n2: int, c2r, c2i, exact_mag: bool, cfar=None,
            detect: bool = False, emit_mag: bool = True,
            peak_radius: int = 0, emit_topk: bool = True,
            outer: str = "direct", percell_onepass: bool = False,
            n2d: int = 1, d2r=None, d2i=None, notch_mode: int = 2,
            transient: str = "zero"):
    rest = list(rest)
    if n2d > 1:
        # Long-CPI Doppler split (n_doppler = n2d*128): the mrh..mil slots
        # carry the split DFT_128 cos/sin matrices instead of the fused
        # slow-time operator; MTI + Doppler window run elementwise in-kernel
        # (wd_ref, byp from ctl SMEM), then a row-block Cooley-Tukey
        # (_ct_split_rows) — MACs per sample drop from nd to 128 + eps.
        wd_ref = rest.pop(0)
        dtwr_ref = rest.pop(0)
        dtwi_ref = rest.pop(0)
        ctl_ref = rest.pop(0)
    if detect:
        # Ref order: so (SMEM input) | det, [mag], stats, [rmax] (outputs) |
        # rot scratch.
        so_ref = rest.pop(0)
        det_ref = rest.pop(0)
        mag_ref = rest.pop(0) if emit_mag else None
        stats_ref = rest.pop(0)
        rmax_ref = rest.pop(0) if emit_topk else None
        rot_ref = rest.pop(0)
    else:
        mag_ref = rest.pop(0)
        scale_ref = rest
    def mm3(x, ch_ref, cl_ref, dn):
        """bf16x3 real matmul: exact bf16 hi/lo split of x, three 1-pass
        MXU dots against the pre-split matrix halves."""
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)
        return d(xh, ch_ref[...]) + (d(xl, ch_ref[...]) + d(xh, cl_ref[...]))

    dn1 = (((1,), (0,)), ((), ()))                   # contract j1 / samples
    dn0 = (((0,), (0,)), ((), ()))                   # contract chirp axis

    # 1. Window the n2 contiguous lane slices (w passed pre-reshaped
    #    (n2, n1): slice j2 uses row j2).
    xr_s, xi_s, mags = [], [], []
    for j2 in range(n2):
        w = win_ref[j2, :]
        xr_s.append(re_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.float32) * w)
        xi_s.append(im_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.float32) * w)

    # 2. Outer DFT_n2 over the slice planes (VPU, f32): radix-2 butterfly
    #    network when n2 is a power of two (~8x fewer plane-ops than the
    #    direct sum at n2=8; float sums reassociate — agreement with the
    #    direct path is to f32 tolerance, same contract as vs XLA);
    #    direct scalar-weighted sums otherwise (outer="direct" for A/B).
    use_fft = outer == "fft" and n2 > 1 and (n2 & (n2 - 1)) == 0
    if use_fft:
        fr_s, fi_s = _outer_fft_planes(xr_s, xi_s, n2)
    for k2 in range(n2):
        if n2 == 1:
            br, bi = xr_s[0], xi_s[0]
        else:
            if use_fft:
                br, bi = fr_s[k2], fi_s[k2]
            else:
                br = bi = None
                for j2 in range(n2):
                    cr_, ci_ = float(c2r[j2, k2]), float(c2i[j2, k2])
                    tr = xr_s[j2] * cr_ - xi_s[j2] * ci_
                    ti = xr_s[j2] * ci_ + xi_s[j2] * cr_
                    br = tr if br is None else br + tr
                    bi = ti if bi is None else bi + ti
            # 3. Twiddle W_nr^(j1*k2): one (1, n1) row per k2.
            twr = twr_ref[k2, :]
            twi = twi_ref[k2, :]
            br, bi = br * twr - bi * twi, br * twi + bi * twr

        # 4. Inner DFT_n1 on the MXU: (nd, n1) @ (n1, n1).
        rr = mm3(br, c1h_ref, c1l_ref, dn1) - mm3(bi, s1h_ref, s1l_ref, dn1)
        ri = mm3(br, s1h_ref, s1l_ref, dn1) + mm3(bi, c1h_ref, c1l_ref, dn1)

        def emit(plane_idx, yr, yi):
            # Magnitude; map row n2*q + k2 lands at [k2, q] (and Doppler
            # bin n2d*q_d + k2d at plane k2*n2d + k2d, lane q_d).
            if exact_mag:
                m = jnp.sqrt(yr * yr + yi * yi)
            else:
                ar = jnp.abs(yr)
                ai = jnp.abs(yi)
                m = jnp.maximum(ar, ai) + 0.375 * jnp.minimum(ar, ai)
            if mag_ref is not None:
                mag_ref[plane_idx] = m
            mags.append(m)

        if n2d == 1:
            # 5. Fused slow-time operator: contract chirps -> (n1, nd).
            yr = mm3(rr, mrh_ref, mrl_ref, dn0) - mm3(ri, mih_ref, mil_ref,
                                                      dn0)
            yi = mm3(rr, mih_ref, mil_ref, dn0) + mm3(ri, mrh_ref, mrl_ref,
                                                      dn0)
            emit(k2, yr, yi)
        else:
            # 5'. Long-CPI split: elementwise MTI + Doppler window (the
            # H / diag(w) factors of ops/fft.doppler_matrices, applied
            # directly), then the row-block Cooley-Tukey Doppler DFT —
            # outer DFT_n2d over contiguous chirp blocks (VPU plane sums),
            # per-row twiddle column, inner DFT_128 contraction per block
            # (also the corner turn).  Doppler bins land interleaved
            # n2d*q_d + k2d across the parity planes.
            nd_ = rr.shape[0]
            n1d = nd_ // n2d
            rowsd = jax.lax.broadcasted_iota(jnp.int32, (nd_, n1), 0)
            byp = ctl_ref[0]

            def mti_f(x):
                d1 = jnp.where(rowsd >= 1, pltpu.roll(x, 1, 0), 0.0)
                if notch_mode == 2:
                    y = x - d1
                else:
                    d2 = jnp.where(rowsd >= 2, pltpu.roll(x, 2, 0), 0.0)
                    y = x - 2.0 * d1 + d2
                if transient == "zero":
                    y = jnp.where(rowsd >= notch_mode - 1, y, 0.0)
                return jnp.where(byp != 0, x, y)

            wd = wd_ref[...]                        # (nd, 1) f32
            zr = mti_f(rr) * wd
            zi = mti_f(ri) * wd
            for k2d in range(n2d):
                br2 = bi2 = None
                for j2 in range(n2d):
                    xbr = zr[j2 * n1d:(j2 + 1) * n1d, :]
                    xbi = zi[j2 * n1d:(j2 + 1) * n1d, :]
                    cr_, ci_ = float(d2r[j2, k2d]), float(d2i[j2, k2d])
                    tr = xbr * cr_ - xbi * ci_
                    ti = xbr * ci_ + xbi * cr_
                    br2 = tr if br2 is None else br2 + tr
                    bi2 = ti if bi2 is None else bi2 + ti
                if k2d > 0:
                    # Twiddle W_nd^(j1*k2d): one (n1d, 1) column per block.
                    twc_r = dtwr_ref[pl.ds(k2d * n1d, n1d)]
                    twc_i = dtwi_ref[pl.ds(k2d * n1d, n1d)]
                    br2, bi2 = (br2 * twc_r - bi2 * twc_i,
                                br2 * twc_i + bi2 * twc_r)
                yr = (mm3(br2, mrh_ref, mrl_ref, dn0)
                      - mm3(bi2, mih_ref, mil_ref, dn0))
                yi = (mm3(br2, mih_ref, mil_ref, dn0)
                      + mm3(bi2, mrh_ref, mrl_ref, dn0))
                emit(k2 * n2d + k2d, yr, yi)

    if detect:
        scale = (_block_scale(mags, n2=n2, cfar=cfar, n2d=n2d)
                 if cfar.scale_mode == "block" else None)
        _detect_epilogue(mags, scale, so_ref[0], det_ref, rot_ref,
                         n2=n2, cfar=cfar, peak_radius=peak_radius,
                         percell_onepass=percell_onepass, n2d=n2d)
        nf = jnp.zeros((), jnp.int32)
        for m in mags:
            nf = nf + jnp.sum((~jnp.isfinite(m)).astype(jnp.int32))
        # Top-K candidate reduction + detection count as kernel epilogues:
        # per-row det maxes (the row-select stage of ops/detect) and the
        # total nonzero count come out of VMEM directly, so XLA never reads
        # the full det map again (only the 64 winning rows are gathered).
        ndet = jnp.zeros((), jnp.int32)
        if emit_topk:
            for k2 in range(n2 * n2d):
                d = det_ref[k2]
                rmax_ref[k2] = jnp.max(d, axis=1, keepdims=True)
                ndet = ndet + jnp.sum((d > 0.0).astype(jnp.int32))
        stats_ref[0, 0] = nf
        stats_ref[0, 1] = ndet
    elif cfar is not None:
        scale_ref[0][...] = _block_scale(mags, n2=n2, cfar=cfar, n2d=n2d)


def _bfp_scale(pk):
    """2^-s with s = max(0, ceil(log2(max(pk, 1)/2^15))) — the BFP exponent
    of ops/fft.bfp_quantize / golden.fixed_point.bfp_fft, computed exactly
    from the f32 exponent bits (no transcendentals): for p >= 1,
    ceil(log2 p) = biased_exp - 127 + (mantissa != 0)."""
    p = jnp.maximum(pk, 1.0)
    bits = pltpu.bitcast(p, jnp.int32)
    e = (bits >> 23) - 127
    cl2 = e + ((bits & 0x7fffff) != 0).astype(jnp.int32)
    s = jnp.maximum(cl2 - 15, 0)
    return pltpu.bitcast((127 - s) << 23, jnp.float32)


def _kernel_fixed(re_ref, im_ref, winr_ref, wind_ref, twr_ref, twi_ref,
                  c1h_ref, c1m_ref, c1l_ref, s1h_ref, s1m_ref, s1l_ref,
                  cdh_ref, cdm_ref, cdl_ref, sdh_ref, sdm_ref, sdl_ref,
                  ctl_ref, *rest,
                  n1: int, n2: int, c2r, c2i, cfar, notch_mode: int,
                  transient: str, rnd: int, shift: int,
                  emit_mag: bool, peak_radius: int, emit_topk: bool,
                  n2d: int = 1, d2r=None, d2i=None):
    """Fixed-point (bit-faithful) fused front-end: the integer semantics of
    models/pipeline.fixed_path — int Q15 windows with saturation counting
    (window_multiplier.vhd:119-163), FFTs at bf16x6 (== XLA
    Precision.HIGHEST's operand split) with per-transform BFP quantization
    (xfft block-floating-point, design_notes §3), saturating MTI
    (doppler_notch.vhd:75-93), integer alpha-max-beta-min magnitude, and the
    integer CFAR decision — all in one VMEM-resident kernel.

    Values travel as int16/int17-ranged *integers held in f32* (exact) except
    the Q15 window products, which need int32; the FFT stages are the only
    non-integer arithmetic and are re-quantized by the BFP barriers, exactly
    like the XLA fixed chain.
    """
    rest = list(rest)
    if n2d > 1:
        # Long-CPI split (mirrors _kernel): the cd*/sd* slots carry the
        # DFT_128 3-way splits; per-row twiddle columns arrive as extra
        # VMEM operands.  MTI/window were always elementwise here, so only
        # the Doppler DFT contraction changes — the BFP barrier's per-range
        # exponent is taken across all parity planes, exactly the dense
        # formulation's per-row peak.
        dtwr_ref = rest.pop(0)
        dtwi_ref = rest.pop(0)
    det_ref = rest.pop(0)
    mag_ref = rest.pop(0) if emit_mag else None
    stats_ref = rest.pop(0)
    rmax_ref = rest.pop(0) if emit_topk else None
    rot_ref = rest.pop(0)
    byp = ctl_ref[0]
    so = ctl_ref[1]

    def mm6(x, h_ref, m_ref, l_ref, dn):
        """bf16x6 real matmul: 3-term bf16 split of x (x == xh+xm+xl to
        ~2^-25 rel) against the pre-split 3-term matrix; the 6 significant
        cross terms — XLA Precision.HIGHEST's error model."""
        xh = x.astype(jnp.bfloat16)
        r = x - xh.astype(jnp.float32)
        xm = r.astype(jnp.bfloat16)
        xl = (r - xm.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=dn, preferred_element_type=jnp.float32)
        return ((d(xl, h_ref[...]) + d(xm, m_ref[...]) + d(xh, l_ref[...]))
                + (d(xm, h_ref[...]) + d(xh, m_ref[...])) + d(xh, h_ref[...]))

    dn1 = (((1,), (0,)), ((), ()))                   # contract j1 / samples
    dn0 = (((0,), (0,)), ((), ()))                   # contract chirp axis
    nd = re_ref.shape[0]
    sat = jnp.zeros((), jnp.int32)

    def iwin(x_i32, w):
        """Q15 window multiply + round + int16 saturate
        (ops/window.window_apply_fixed)."""
        p = x_i32 * w
        sh = (p + rnd) >> shift
        s_ = jnp.sum(((sh > 32767) | (sh < -32768)).astype(jnp.int32))
        return jnp.clip(sh, -32768, 32767).astype(jnp.float32), s_

    # 1. Integer range window on the n2 lane slices.
    xr_s, xi_s = [], []
    for j2 in range(n2):
        w = winr_ref[j2, :]
        vr, s1 = iwin(re_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.int32), w)
        vi, s2 = iwin(im_ref[:, pl.ds(j2 * n1, n1)].astype(jnp.int32), w)
        sat = sat + s1 + s2
        xr_s.append(vr)
        xi_s.append(vi)

    # 2-4. Range FFT: outer DFT_n2 (f32 VPU) + twiddle + inner DFT_n1 at
    # bf16x6 on the MXU.
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

    # 5. BFP quantize over the range transform (per chirp row, spanning all
    # slices — ops/fft.bfp_quantize axis=1 on the (nd, nr) map).
    pk = None
    for k2 in range(n2):
        m_ = jnp.maximum(jnp.abs(rr_s[k2]), jnp.abs(ri_s[k2]))
        row = jnp.max(m_, axis=1, keepdims=True)
        pk = row if pk is None else jnp.maximum(pk, row)
    bsc = _bfp_scale(pk)                               # (nd, 1)

    def qz(x, sc):
        return jnp.clip(jnp.round(x * sc), -32768.0, 32767.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (nd, n1), 0)

    def mti(x):
        """Saturating MTI along the chirp (sublane) axis
        (ops/notch.mti_notch_fixed: zero-padded delays, int16 clip,
        transient chirps zeroed unless 'passthrough', traced bypass)."""
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

    wd = wind_ref[...]                                 # (nd, 1) int32
    mags = []
    sat_d = jnp.zeros((), jnp.int32)

    def int_mag(yr, yi, plane_idx):
        # 9. Integer alpha-max-beta-min: max + (min>>2) + (min>>3)
        # (ops/magnitude.magnitude_fixed; exact floors on int-valued f32).
        ar = jnp.abs(yr)
        ai = jnp.abs(yi)
        mx = jnp.maximum(ar, ai)
        mn = jnp.minimum(ar, ai)
        m = mx + jnp.floor(mn * 0.25) + jnp.floor(mn * 0.125)
        if mag_ref is not None:
            mag_ref[plane_idx] = m
        mags.append(m)

    for k2 in range(n2):
        # 6. quantize + MTI + integer Doppler window.
        xr, s1 = iwin(mti(qz(rr_s[k2], bsc)).astype(jnp.int32), wd)
        xi, s2 = iwin(mti(qz(ri_s[k2], bsc)).astype(jnp.int32), wd)
        sat_d = sat_d + s1 + s2
        if n2d == 1:
            # 7. Doppler DFT (contract chirps, bf16x6) -> (n1, nd)
            # range-major.
            yr = (mm6(xr, cdh_ref, cdm_ref, cdl_ref, dn0)
                  - mm6(xi, sdh_ref, sdm_ref, sdl_ref, dn0))
            yi = (mm6(xr, sdh_ref, sdm_ref, sdl_ref, dn0)
                  + mm6(xi, cdh_ref, cdm_ref, cdl_ref, dn0))
            # 8. BFP quantize per range bin (axis=1 over Doppler).
            pkd = jnp.max(jnp.maximum(jnp.abs(yr), jnp.abs(yi)), axis=1,
                          keepdims=True)
            scd = _bfp_scale(pkd)
            int_mag(qz(yr, scd), qz(yi, scd), k2)
        else:
            # 7'. Row-block Cooley-Tukey Doppler DFT at bf16x6 (the float
            # kernel's split; Doppler bins land on parity planes).
            n1d = nd // n2d
            planes = []
            for k2d in range(n2d):
                br = bi = None
                for j2 in range(n2d):
                    xbr = xr[j2 * n1d:(j2 + 1) * n1d, :]
                    xbi = xi[j2 * n1d:(j2 + 1) * n1d, :]
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
                yr = (mm6(br, cdh_ref, cdm_ref, cdl_ref, dn0)
                      - mm6(bi, sdh_ref, sdm_ref, sdl_ref, dn0))
                yi = (mm6(br, sdh_ref, sdm_ref, sdl_ref, dn0)
                      + mm6(bi, cdh_ref, cdm_ref, cdl_ref, dn0))
                planes.append((yr, yi))
            # 8'. BFP per range bin: the per-row peak spans the FULL
            # Doppler spectrum = max across all parity planes' rows.
            pkd = None
            for yr, yi in planes:
                pm = jnp.max(jnp.maximum(jnp.abs(yr), jnp.abs(yi)), axis=1,
                             keepdims=True)
                pkd = pm if pkd is None else jnp.maximum(pkd, pm)
            scd = _bfp_scale(pkd)
            for k2d, (yr, yi) in enumerate(planes):
                int_mag(qz(yr, scd), qz(yi, scd), k2 * n2d + k2d)

    # 10. Integer CFAR decision (+ peak grouping) on the VMEM slices.
    scale = (_block_scale(mags, n2=n2, cfar=cfar, integer=True, n2d=n2d)
             if cfar.scale_mode == "block" else None)
    _detect_epilogue(mags, scale, so, det_ref, rot_ref, n2=n2, cfar=cfar,
                     peak_radius=peak_radius, integer=True, n2d=n2d)
    ndet = jnp.zeros((), jnp.int32)
    if emit_topk:
        for k2 in range(n2 * n2d):
            d = det_ref[k2]
            rmax_ref[k2] = jnp.max(d, axis=1, keepdims=True)
            ndet = ndet + jnp.sum((d > 0.0).astype(jnp.int32))
    stats_ref[0, 0] = sat + sat_d
    stats_ref[0, 1] = ndet


@functools.partial(
    jax.jit,
    static_argnames=("notch_mode", "transient", "coef_width",
                     "window_rounding", "interpret", "cfar", "emit_mag",
                     "peak_group_radius", "emit_topk"))
def rdm_frontend_fixed(iq: jnp.ndarray, mti_bypass=False,
                       scale_override=0, notch_mode: int = 2,
                       transient: str = "zero", coef_width: int = 16,
                       window_rounding: str = "unbiased",
                       interpret: bool = False, cfar=None,
                       emit_mag: bool = True, peak_group_radius: int = 0,
                       emit_topk: bool = True):
    """Fixed-point fused front-end+detect for one frame: iq int16
    (nd, nr, 2) -> the bit-faithful integer chain of
    models/pipeline.fixed_path in ONE Pallas kernel (see _kernel_fixed).
    Same shape/geometry constraints and return convention as
    ``rdm_frontend(detect=True)`` — ``(det_slices, mag | None,
    saturation_count, row_max, n_dets)``, all integer-valued (det/mag in
    f32 carriers; the 3rd element is the window saturation count, the
    fixed chain's status_saturation analog — fixed mode has no nonfinite
    concept).

    Numerics contract: identical integer semantics per stage; the FFTs run
    at bf16x6 (the same operand split XLA Precision.HIGHEST uses on the
    MXU), so pre-BFP transform values may differ from the XLA chain in f32
    ulps and quantized values by <=1 LSB — the same tolerance class as the
    existing fixed-vs-golden contract (CLAUDE.md parity invariants).
    Detection-set parity vs the XLA fixed chain is pinned by
    tests/test_frontend_fixed.py.
    """
    nd, nr, _ = iq.shape
    n1, n2, c2r, c2i, twr, twi = _ct_split(nr)
    if n2 > 16:
        raise ValueError(f"n_range={nr}: outer radix {n2} > 16")
    if nd > 128 and nd % 128 == 0:
        n1d, n2d, d2r, d2i, dtwr, dtwi = _ct_split_rows(nd)
        if n2d > 16:
            raise ValueError(f"n_doppler={nd}: outer radix {n2d} > 16")
    else:
        n1d, n2d, d2r, d2i, dtwr, dtwi = nd, 1, None, None, None, None
    ndl = nd // n2d
    if cfar is None or cfar.variant not in ("os", "ca", "go", "so") \
            or cfar.edge_mode != "wrap":
        raise ValueError("rdm_frontend_fixed needs a wrap-edge CfarParams "
                         "with variant os/ca/go/so")
    if cfar.scale_mode == "block" and (
            cfar.scale_block != n2 or nd % cfar.scale_block
            or cfar.scale_block % n2d):
        raise ValueError(
            f"in-kernel block scale needs scale_block == n_range/128 == "
            f"{n2} (divisible by n_doppler/128 = {n2d}) and "
            f"n_doppler % scale_block == 0; got {cfar}")
    if (cfar.halo_range + n2 - 1) // n2 > _DET_PAD:
        raise ValueError(f"halo_range {cfar.halo_range} exceeds the "
                         f"detect scratch row pad ({_DET_PAD} x n2)")
    if (peak_group_radius + n2 - 1) // n2 > _DET_PAD:
        raise ValueError(f"peak_group_radius {peak_group_radius} exceeds "
                         f"the detect scratch row pad ({_DET_PAD} x n2)")
    if (cfar.variant != "os" or cfar.scale_mode == "cell") and (
            cfar.win_range * cfar.win_doppler * 45056 >= 2 ** 24):
        # CA/GO/SO estimates and the per-cell scale mean carry the training
        # window sums as integers in f32, exact only below 2^24 (max fixed
        # magnitude 45056); wider windows must use the XLA fixed chain
        # (exact int32 sums).  OS + block scale only counts — no bound.
        raise ValueError(
            f"CFAR window {cfar.win_range}x{cfar.win_doppler} too large for "
            f"exact f32 integer window sums (need win cells <= 372)")

    from .window import hamming_q15
    winr = np.asarray(hamming_q15(nr, coef_width),
                      np.int32).reshape(n2, n1)
    wind = np.asarray(hamming_q15(nd, coef_width), np.int32).reshape(nd, 1)
    shift = coef_width - 2
    rnd = (1 << shift) if window_rounding == "biased" else (1 << (shift - 1))
    c1r, c1i = dft_matrices(n1)
    cdr, cdi = dft_matrices(n1d if n2d > 1 else nd)
    mats = [jnp.asarray(x) for c in (c1r, c1i, cdr, cdi)
            for x in _split_matrix3(c)]

    ctl = jnp.stack([jnp.asarray(mti_bypass).astype(jnp.int32),
                     jnp.asarray(scale_override).astype(jnp.int32)])

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    slices = jax.ShapeDtypeStruct((n2 * n2d, n1, ndl), jnp.float32)
    operands = [iq[..., 0], iq[..., 1], jnp.asarray(winr), jnp.asarray(wind),
                jnp.asarray(twr), jnp.asarray(twi), *mats, ctl]
    in_specs = [vmem()] * 18 + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if n2d > 1:
        operands += [jnp.asarray(dtwr), jnp.asarray(dtwi)]
        in_specs += [vmem(), vmem()]
    out_shape = [slices]                                    # det
    if emit_mag:
        out_shape.append(slices)                            # mag
    out_specs = [vmem()] * len(out_shape)
    out_shape.append(jax.ShapeDtypeStruct((1, 2), jnp.int32))  # sat, ndet
    out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if emit_topk:
        out_shape.append(jax.ShapeDtypeStruct((n2 * n2d, n1, 1),
                                              jnp.float32))
        out_specs.append(vmem())                            # row maxes
    wmin, wmax = _c_range(cfar.halo_doppler, n2d)
    gmin, gmax = _c_range(peak_group_radius, n2d)
    n_rot = max(wmax - wmin + 1, gmax - gmin + 1)
    scratch = [pltpu.VMEM((n_rot, n2 * n2d, n1 + 2 * _DET_PAD, ndl),
                          jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_kernel_fixed, n1=n1, n2=n2, c2r=c2r, c2i=c2i,
                          cfar=cfar, notch_mode=notch_mode,
                          transient=transient, rnd=rnd, shift=shift,
                          emit_mag=emit_mag, peak_radius=peak_group_radius,
                          emit_topk=emit_topk, n2d=n2d, d2r=d2r, d2i=d2i),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*operands)
    det_s = out[0]
    if emit_mag:
        mag = jnp.transpose(out[1].reshape(n2, n2d, n1, ndl),
                            (2, 0, 3, 1)).reshape(nr, nd)
    else:
        mag = None
    if not emit_topk:
        return det_s, mag, out[-1][0, 0], None, None
    stats = out[-2]
    rmax = out[-1].reshape(n2 * n2d * n1)
    return det_s, mag, stats[0, 0], rmax, stats[0, 1]


@functools.partial(
    jax.jit,
    static_argnames=("notch_mode", "transient", "coef_width", "exact_mag",
                     "interpret", "cfar", "detect", "emit_mag",
                     "peak_group_radius", "emit_topk", "outer",
                     "percell_onepass"))
def rdm_frontend(iq: jnp.ndarray, mti_bypass=False, notch_mode: int = 2,
                 transient: str = "zero", coef_width: int = 16,
                 exact_mag: bool = False,
                 interpret: bool = False, cfar=None,
                 detect: bool = False, scale_override=0,
                 emit_mag: bool = True, peak_group_radius: int = 0,
                 emit_topk: bool = True, outer: str = "direct",
                 percell_onepass: bool = False):
    """Fused front-end for one frame: iq (nd, nr, 2) -> magnitude
    f32 (nr, nd), nr a multiple-of-128 with nr/128 <= 16 (or nr <= 128).
    ``iq`` is int16 for the radar ingest path, or float32 for upstream
    float producers (e.g. beamformed element data,
    models/pipeline.make_array_processor) — the kernel's first stage works
    in f32 either way.  Batch by vmapping (the batch dim becomes the Pallas
    grid, as with the CFAR kernels); matrices stay VMEM-resident across
    grid steps.

    ``cfar`` (a CfarParams with scale_mode='block', scale_block == nr/128,
    edge_mode='wrap'): also emit the clutter-map scale from the in-VMEM mag
    slices (_block_scale) and return (mag, scale int32 (nr, nd)).

    ``detect=True`` (requires a wrap-edge ``cfar`` of any variant —
    os/ca/go/so; both scale_mode='block' — grid constraints as above — and
    the reference-exact scale_mode='cell' are supported): additionally
    run the whole CFAR detection pass in-kernel (_detect_epilogue) — the
    magnitude map never leaves VMEM.  Returns
    ``(det_slices f32 (n2, n1, nd), mag (nr, nd) | None, nonfinite int32,
    row_max f32 (n2*n1,), n_dets int32)`` — row_max (per-det-row maxes in
    sliced-row order) and n_dets are computed as kernel epilogues so the
    top-K extraction never re-reads the full det map —
    where det_slices row [k2, q] is true map row n2*q + k2
    (ops/detect.topk_detections_sliced consumes it directly; de-interleave
    with swapaxes+reshape for a (nr, nd) det map).  ``emit_mag=False`` skips
    the magnitude HBM write entirely.  Bit-exact vs running
    ops/cfar_pallas.cfar_2d_pallas_detect on this kernel's own mag/scale
    outputs (tests/test_frontend_pallas.py).

    ``peak_group_radius`` (detect=True only): also run peak grouping on the
    in-VMEM det slices (_peak_group_epilogue) — same semantics as
    ops/cfar.peak_group with wrap edges.

    Long CPIs (n_doppler = n2d*128, n2d > 1): the fused slow-time operator
    would cost nd MACs/sample, so the kernel switches to the split form —
    elementwise MTI + Doppler window, then a row-block Cooley-Tukey
    Doppler DFT (128 MACs/sample; docs/PERF_LOG.md round 4).  Doppler bins
    come out interleaved across n2d parity planes: det/mag slices have
    shape (n2*n2d, n1, nd/n2d) with plane k2*n2d + pd holding map row
    n2*q + k2 / Doppler bin n2d*q_d + pd (the returned ``mag`` map is
    de-interleaved here; ops/detect.topk_detections_sliced(n2d=...) maps
    detection rows/lanes back).  row_max ids follow the flattened plane
    order."""
    nd, nr, _ = iq.shape
    n1, n2, c2r, c2i, twr, twi = _ct_split(nr)
    if n2 > 16:
        raise ValueError(f"n_range={nr}: outer radix {n2} > 16")
    if nd > 128 and nd % 128 == 0:
        n1d, n2d, d2r, d2i, dtwr, dtwi = _ct_split_rows(nd)
        if n2d > 16:
            raise ValueError(f"n_doppler={nd}: outer radix {n2d} > 16")
    else:
        n1d, n2d, d2r, d2i, dtwr, dtwi = nd, 1, None, None, None, None
    ndl = nd // n2d
    percell = detect and cfar is not None and cfar.scale_mode == "cell"
    if cfar is not None and not percell and (
            cfar.scale_mode != "block" or cfar.scale_block != n2
            or nd % cfar.scale_block or cfar.edge_mode != "wrap"
            or cfar.scale_block % n2d):
        raise ValueError(
            f"in-kernel scale needs scale_mode='block', scale_block == "
            f"n_range/128 == {n2} (divisible by n_doppler/128 = {n2d}), "
            f"wrap edges; got {cfar}")
    if detect:
        if (cfar is None or cfar.variant not in ("os", "ca", "go", "so")
                or cfar.edge_mode != "wrap"):
            raise ValueError("detect=True needs a wrap-edge CfarParams with "
                             "variant os/ca/go/so (see the cfar argument)")
        if (cfar.halo_range + n2 - 1) // n2 > _DET_PAD:
            raise ValueError(f"halo_range {cfar.halo_range} exceeds the "
                             f"detect scratch row pad ({_DET_PAD} x n2)")
        if (peak_group_radius + n2 - 1) // n2 > _DET_PAD:
            raise ValueError(f"peak_group_radius {peak_group_radius} exceeds "
                             f"the detect scratch row pad ({_DET_PAD} x n2)")
    elif peak_group_radius:
        raise ValueError("peak_group_radius needs detect=True")
    from .window import hamming_float
    win = np.asarray(hamming_float(nr, coef_width),
                     np.float32).reshape(n2, n1)
    c1r, c1i = dft_matrices(n1)
    c1h, c1l = _split_matrix(c1r)
    s1h, s1l = _split_matrix(c1i)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    if n2d == 1:
        m1r, m1i, m0r, m0i = doppler_matrices(nd, notch_mode, transient,
                                              coef_width)
        m1 = [jnp.asarray(x) for m in (m1r, m1i) for x in _split_matrix(m)]
        m0 = [jnp.asarray(x) for m in (m0r, m0i) for x in _split_matrix(m)]
        byp = jnp.asarray(mti_bypass)
        mrh, mrl, mih, mil = [jnp.where(byp, a, b) for a, b in zip(m0, m1)]
        extra_ops, extra_specs = [], []
    else:
        # Split slow-time: the mrh..mil slots carry the DFT_128 cos/sin
        # splits; MTI/window/bypass move in-kernel (wd + ctl SMEM).
        cdr, cdi = dft_matrices(n1d)
        mrh, mrl = [jnp.asarray(x) for x in _split_matrix(cdr)]
        mih, mil = [jnp.asarray(x) for x in _split_matrix(cdi)]
        wd = np.asarray(hamming_float(nd, coef_width),
                        np.float32).reshape(nd, 1)
        ctl = jnp.asarray(mti_bypass).astype(jnp.int32).reshape(1)
        extra_ops = [jnp.asarray(wd), jnp.asarray(dtwr), jnp.asarray(dtwi),
                     ctl]
        extra_specs = [vmem(), vmem(), vmem(),
                       pl.BlockSpec(memory_space=pltpu.SMEM)]

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    slices = jax.ShapeDtypeStruct((n2 * n2d, n1, ndl), jnp.float32)
    operands = [iq[..., 0], iq[..., 1], jnp.asarray(win), jnp.asarray(twr),
                jnp.asarray(twi), jnp.asarray(c1h), jnp.asarray(c1l),
                jnp.asarray(s1h), jnp.asarray(s1l), mrh, mrl, mih, mil,
                *extra_ops]
    in_specs = [vmem()] * 13 + extra_specs
    scratch = []
    if detect:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(scale_override, jnp.int32).reshape(1))
        out_shape = [slices]                                    # det
        if emit_mag:
            out_shape.append(slices)                            # mag
        out_specs = [vmem()] * len(out_shape)
        # Scalar outputs: SMEM (Mosaic rejects scalar stores to VMEM).
        out_shape.append(jax.ShapeDtypeStruct((1, 2), jnp.int32))  # nf, ndet
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        if emit_topk:
            out_shape.append(jax.ShapeDtypeStruct((n2 * n2d, n1, 1),
                                                  jnp.float32))
            out_specs.append(vmem())                            # row maxes
        wmin, wmax = _c_range(cfar.halo_doppler, n2d)
        gmin, gmax = _c_range(peak_group_radius, n2d)
        n_rot = max(wmax - wmin + 1, gmax - gmin + 1)
        scratch = [pltpu.VMEM(
            (n_rot, n2 * n2d, n1 + 2 * _DET_PAD, ndl), jnp.float32)]
    elif cfar is not None:
        out_shape = [slices, jax.ShapeDtypeStruct((n1, ndl), jnp.int32)]
        out_specs = [vmem(), vmem()]
    else:
        out_shape = slices
        out_specs = vmem()

    def deinterleave(planes):
        # plane k2*n2d + pd, cell [q, q_d] -> map[n2*q + k2, n2d*q_d + pd].
        x = planes.reshape(n2, n2d, n1, ndl)
        return jnp.transpose(x, (2, 0, 3, 1)).reshape(nr, nd)

    out = pl.pallas_call(
        functools.partial(_kernel, n1=n1, n2=n2, c2r=c2r, c2i=c2i,
                          exact_mag=exact_mag, cfar=cfar, detect=detect,
                          emit_mag=emit_mag,
                          peak_radius=peak_group_radius,
                          emit_topk=emit_topk, outer=outer,
                          percell_onepass=percell_onepass,
                          n2d=n2d, d2r=d2r, d2i=d2i,
                          notch_mode=notch_mode, transient=transient),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*operands)
    if detect:
        det_s = out[0]
        mag = deinterleave(out[1]) if emit_mag else None
        if not emit_topk:
            return det_s, mag, out[-1][0, 0], None, None
        stats = out[-2]
        # Row maxes in sliced-row order (id plane*n1 + q) — feeds the
        # row-select stage of ops/detect.topk_detections_sliced directly.
        rmax = out[-1].reshape(n2 * n2d * n1)
        return det_s, mag, stats[0, 0], rmax, stats[0, 1]
    if cfar is not None:
        mag_s, scale_plane = out
        mag = deinterleave(mag_s)
        # Map row k belongs to block row k // scale_block == q (k = n2*q+k2,
        # scale_block == n2) and map bin d to lane d // n2d — repeat the
        # block-constant plane along both axes.
        scale = jnp.repeat(scale_plane, n2, axis=0)
        if n2d > 1:
            scale = jnp.repeat(scale, n2d, axis=1)
        return mag, scale
    # De-interleave: map row n2*q + k2, bin n2d*q_d + pd.
    return deinterleave(out)

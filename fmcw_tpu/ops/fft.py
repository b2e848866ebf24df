"""FFT kernels (JAX) — DFT-as-matmul on the MXU, plus XLA FFT fallback.

The reference uses Xilinx XFFT streaming IP (rtl/src/radar_core.vhd:79-127).
On TPU the radar's transform sizes (1024-pt range, 128-pt Doppler) are small
enough that a dense DFT matmul runs on the MXU at full systolic-array
utilization — batched over 128 chirps / 1024 range bins it is one
(batch, N) @ (N, N) GEMM per axis, which XLA fuses with the window multiply
and neighboring elementwise stages.  This beats generic FFT lowering for these
shapes and, crucially, contracts over *either* axis without materializing a
transpose (the single-chip corner turn folds into the Doppler matmul's
dimension numbers).

``bfp_quantize`` applies the framework's block-floating-point semantics
(golden/fixed_point.bfp_fft) to emulate the reference's int16 inter-stage
format on device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def dft_matrices(n: int, window: bool = False, coef_width: int = 16,
                 dtype=np.float32):
    """(cos, -sin) DFT matrices C[s, k] = exp(-2j*pi*s*k/n), optionally
    pre-multiplied by the Q15 Hamming window along the sample axis (folding
    the window_multiplier stage into the transform for free)."""
    s = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(n)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * s * k / n
    cr, ci = np.cos(ang), np.sin(ang)
    if window:
        from .window import hamming_float
        w = hamming_float(n, coef_width).astype(np.float64)[:, None]
        cr, ci = cr * w, ci * w
    return cr.astype(dtype), ci.astype(dtype)


def dft_apply(re: jnp.ndarray, im: jnp.ndarray, axis: int, window: bool = False,
              precision=jax.lax.Precision.HIGHEST):
    """Forward DFT along ``axis`` of a complex array given as (re, im) float32
    pair, as 4 real MXU matmuls: Xr = xr@Cr - xi@Ci; Xi = xr@Ci + xi@Cr."""
    n = re.shape[axis]
    cr, ci = dft_matrices(n, window=window)
    cr, ci = jnp.asarray(cr), jnp.asarray(ci)
    dn = (((axis % re.ndim,), (0,)), ((), ()))

    def mm(x, c):
        y = jax.lax.dot_general(x, c, dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=precision)
        # dot_general moves the contracted axis's result dim to the end;
        # restore the original axis position.
        return jnp.moveaxis(y, -1, axis % re.ndim)

    xr_cr = mm(re, cr)
    xr_ci = mm(re, ci)
    xi_cr = mm(im, cr)
    xi_ci = mm(im, ci)
    return xr_cr - xi_ci, xr_ci + xi_cr


def fft_apply(re: jnp.ndarray, im: jnp.ndarray, axis: int, window: bool = False,
              method: str = "matmul", precision=jax.lax.Precision.HIGHEST):
    """Forward FFT along ``axis``; method "matmul" (MXU DFT) or "xla"
    (jnp.fft.fft lowering).  The window, when requested, is folded into the
    matmul or applied as an elementwise multiply before the XLA FFT."""
    if method == "matmul":
        return dft_apply(re, im, axis, window=window, precision=precision)
    if method == "xla":
        if window:
            from .window import hamming_float
            w = jnp.asarray(hamming_float(re.shape[axis]))
            shape = [1] * re.ndim
            shape[axis] = re.shape[axis]
            w = w.reshape(shape)
            re, im = re * w, im * w
        z = jax.lax.complex(re, im)
        zf = jnp.fft.fft(z, axis=axis)
        return jnp.real(zf), jnp.imag(zf)
    raise ValueError(method)


def bfp_quantize(re: jnp.ndarray, im: jnp.ndarray, axis: int):
    """Per-transform block-floating-point quantization to int16 range
    (framework BFP semantics — golden/fixed_point.bfp_fft): right-shift so the
    per-slice peak |component| lands in [2^14, 2^15), round half-to-even,
    discard the exponent.  Returns float32 arrays holding integer values."""
    peak = jnp.maximum(jnp.abs(re), jnp.abs(im))
    peak = jnp.max(peak, axis=axis, keepdims=True)
    s = jnp.ceil(jnp.log2(jnp.maximum(peak, 1.0) / 32768.0))
    scale = jnp.exp2(-jnp.maximum(s, 0.0))

    def q(x):
        v = jnp.round(x * scale)  # round half-to-even (convergent)
        return jnp.clip(v, -32768.0, 32767.0)

    return q(re), q(im)

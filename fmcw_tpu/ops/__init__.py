"""JAX/Pallas compute kernels for the radar chain."""

from . import window, fft, notch, magnitude, cfar, detect  # noqa: F401

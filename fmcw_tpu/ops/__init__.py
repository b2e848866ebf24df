"""JAX/Pallas compute kernels for the radar chain."""

from . import window, fft, notch, magnitude, cfar, detect, beamform  # noqa: F401

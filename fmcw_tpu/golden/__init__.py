"""Golden models: bit-faithful fixed-point and float64 reference chains."""

from . import fixed_point, reference  # noqa: F401

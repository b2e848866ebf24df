"""Mesh/sharding layer: all-to-all corner turn, CFAR halo exchange."""

from . import mesh, sharded  # noqa: F401

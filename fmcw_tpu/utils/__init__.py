"""Utilities: golden-file I/O, log formats, visualization."""

from . import io  # noqa: F401

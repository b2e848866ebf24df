"""Streaming runtime: double-buffered ingest, overlapped dispatch, native IO."""

from . import stream  # noqa: F401

"""Models: the radar pipeline (radar_core equivalent), TWS tracker, scenario."""

from . import pipeline  # noqa: F401

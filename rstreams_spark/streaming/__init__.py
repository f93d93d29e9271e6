"""Structured Streaming operator variants (watermarked windows, stateful lag, stream joins)."""

from . import joins, stateful, throttle, windows  # noqa: F401

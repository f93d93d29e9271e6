"""Structured Streaming operator variants (watermarked windows, stateful lag, stream joins)."""

from . import dedup, joins, state, stateful, throttle, windows  # noqa: F401

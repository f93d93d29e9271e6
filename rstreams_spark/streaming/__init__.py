"""Structured Streaming operator variants (watermarked windows, stateful lag, stream joins)."""

from . import dedup, joins, state, stateful, throttle, tws, windows  # noqa: F401

"""Structured Streaming operator variants (watermarked windows, stateful lag, stream joins)."""

from . import curation, dedup, joins, state, stateful, throttle, tws, windows  # noqa: F401

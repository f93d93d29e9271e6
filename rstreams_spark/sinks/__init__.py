"""Batch and streaming sinks."""

from . import writers  # noqa: F401

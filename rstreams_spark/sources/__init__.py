"""Batch and streaming sources (files, rate, Kafka builders)."""

from . import files, kafka  # noqa: F401

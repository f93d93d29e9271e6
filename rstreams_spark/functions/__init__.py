"""Column-level function library: text, dedup, similarity, multimodal, lib.rs utils."""

from . import core, dedup, multimodal, similarity, text  # noqa: F401

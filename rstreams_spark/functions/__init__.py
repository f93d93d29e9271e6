from . import core, dedup, multimodal, similarity, text  # noqa: F401

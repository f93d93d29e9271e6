from . import files, kafka  # noqa: F401

from . import joins, stateless, table, windows  # noqa: F401

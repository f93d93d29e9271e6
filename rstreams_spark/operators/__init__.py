from . import joins, skew, stateless, table, windows  # noqa: F401

"""Relational operators: windows, joins, changelog tables, stateless combinators, skew-safe aggregation."""

from . import joins, skew, stateless, table, windows  # noqa: F401

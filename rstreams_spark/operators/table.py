"""Changelog tables: latest value per key.

Parity target: reference ``Table::spawn`` (src/table.rs:15-44)
upserts each record's value into a KV store keyed by message key, so
the store always holds the latest value per key (reference test
src/table.rs:50-103 asserts exactly that).

Spark-first: "latest per key" is an aggregation, not a mutable map —
``max(struct(ts, tiebreakers..., values...))`` gives a deterministic
argmax in ONE hash shuffle with map-side partial aggregation (the
struct comparison is lexicographic, so ties on ``ts`` resolve by the
tiebreaker columns instead of arrival nondeterminism). At 100 TB the
same plan holds; key-cardinality bounds the output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["latest_per_key"]


def latest_per_key(
    df: DataFrame,
    key: str | Sequence[str],
    order_col: str,
    value_cols: Sequence[str] | None = None,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    vals = list(value_cols) if value_cols is not None else [
        c for c in df.columns if c not in keys and c != order_col
    ]
    # field order defines the comparison order; dedupe so a column
    # that is both tiebreaker and value appears once (at its
    # highest-priority position)
    fields: list[str] = [order_col]
    for c in (*tiebreakers, *vals):
        if c not in fields:
            fields.append(c)
    packed = F.max(F.struct(*[F.col(c) for c in fields])).alias("__latest")
    agg = df.groupBy(*keys).agg(packed)
    return agg.select(
        *keys,
        F.col(f"__latest.{order_col}").alias(order_col),
        *[F.col(f"__latest.{v}").alias(v) for v in vals],
    )

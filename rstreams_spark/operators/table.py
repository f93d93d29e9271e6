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
    packed = F.max(
        F.struct(F.col(order_col), *[F.col(t) for t in tiebreakers], *[F.col(v) for v in vals])
    ).alias("__latest")
    agg = df.groupBy(*keys).agg(packed)
    return agg.select(
        *keys,
        F.col(f"__latest.{order_col}").alias(order_col),
        *[F.col(f"__latest.{v}").alias(v) for v in vals],
    )

"""Skew-aware operators: salted two-phase groupBy and salted join.

At 100 TB a handful of hot keys (one viral user, one dominant
event_type) can pin an aggregation or a join on a single reducer.
The classic fixes:

- aggregation: phase 1 aggregates on (key, salt) spreading each hot
  key over ``salt_n`` reducers, phase 2 merges the ``salt_n``
  partials per key — both phases map-side-combine, total extra cost
  is one small shuffle of |keys| × salt_n partial rows.
- join: salt the skewed (big) side's key with a random shard in
  [0, salt_n), replicate the other side once per shard, join on
  (key, shard) — each hot key's rows land on ``salt_n`` reducers
  instead of one.

Only algebraic aggregates compose the two-phase way; the helper
supports the common ones and takes (phase1, phase2) expression pairs
for custom merges. AQE's skew-join splitting covers sort-merge joins
it can observe at runtime; ``salted_join`` is the explicit tool when
AQE can't help (e.g. a key so hot a single partition still exceeds
the split threshold, or non-AQE plans).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "SaltedAgg"]


class SaltedAgg:
    """An aggregate expressed as (phase1 over rows, phase2 over partials)."""

    def __init__(self, phase1: Column, phase2_fn, name: str):
        self.phase1 = phase1.alias(f"__p_{name}")
        self.phase2 = phase2_fn(F.col(f"__p_{name}")).alias(name)

    @classmethod
    def sum(cls, col: str, name: str | None = None) -> "SaltedAgg":
        return cls(F.sum(col), F.sum, name or f"sum_{col}")

    @classmethod
    def count(cls, name: str = "n") -> "SaltedAgg":
        return cls(F.count("*"), F.sum, name)

    @classmethod
    def min(cls, col: str, name: str | None = None) -> "SaltedAgg":
        return cls(F.min(col), F.min, name or f"min_{col}")

    @classmethod
    def max(cls, col: str, name: str | None = None) -> "SaltedAgg":
        return cls(F.max(col), F.max, name or f"max_{col}")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[SaltedAgg],
    salt_n: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase grouped aggregation robust to key skew.

    ``salt_on``: a high-cardinality column used to derive the salt
    deterministically; defaults to a hash of ALL columns. Either way
    the salt is a pure function of row content — positional ids
    (monotonically_increasing_id) are not stable under stage
    recomputation and could double-count rows on task retry.
    """
    salt_src = (
        [F.col(salt_on)] if salt_on else [F.col(c) for c in df.columns]
    )
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(salt_n))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[a.phase1 for a in aggs])
    )
    return phase1.groupBy(*keys).agg(*[a.phase2 for a in aggs])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-robust equi-join: the big side gets a deterministic row
    shard in [0, salt_n); the small side is exploded ``salt_n``× so
    every (key, shard) bucket finds its match. Each hot key then
    occupies ``salt_n`` reducers instead of one.

    Cost model: small side is replicated ``salt_n``× through the
    shuffle — use only when the small side is modest (but too big or
    too skew-sensitive to broadcast outright) and the big side has
    keys hot enough to pin a reducer. ``how`` is from the big side
    ('inner' or 'left'): every big row carries exactly one shard, so
    outer semantics are preserved without dedup.

    The shard is a hash of the big row's COLUMNS, never a positional
    id: positional ids are not stable under stage recomputation, so a
    task retry after partial shuffle commit could re-shard rows and
    duplicate/lose matches. Fully identical rows share a shard —
    harmless for correctness, and real keys' rows still spread.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (big side), got {how!r}: "
            "the replicated small side would duplicate unmatched rows"
        )
    shard = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n)
    )
    b = big.withColumn("__shard", shard)
    s = small.withColumn(
        "__shard", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    on = [key, "__shard"]
    return b.join(s, on, how).drop("__shard")

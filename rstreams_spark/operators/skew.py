"""Skew-aware aggregation: salted two-phase groupBy.

At 100 TB a handful of hot keys (one viral user, one dominant
event_type) can pin an aggregation on a single reducer. The classic
fix: phase 1 aggregates on (key, salt) spreading each hot key over
``salt_n`` reducers, phase 2 merges the ``salt_n`` partials per key —
both phases map-side-combine, total extra cost is one small shuffle
of |keys| × salt_n partial rows.

Only algebraic aggregates compose this way; the helper supports the
common ones and takes (phase1, phase2) expression pairs for custom
merges. AQE's skew handling covers *join* skew; aggregation-first
skew still needs salting, hence this operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "SaltedAgg"]


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
    deterministically (keeps results reproducible); defaults to
    ``spark_partition_id()`` + monotonically increasing id hash.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_n))
        if salt_on
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_n))
    )
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[a.phase1 for a in aggs])
    )
    return phase1.groupBy(*keys).agg(*[a.phase2 for a in aggs])

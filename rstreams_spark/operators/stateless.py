"""Stateless combinators as declarative DataFrame helpers.

The reference inherits these from tokio-stream/futures ``StreamExt``
(README "Stateless operators"): map, filter, filter_map, fold,
merge, take, skip, chunk, throttle, cycle, split. On Spark each is a
Catalyst expression or relational op — they exist here (beyond
``RStream`` methods) for direct functional use and to document the
mapping. None of them adds a shuffle beyond what the relational op
inherently needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["chunk", "ordinal", "merge", "throttle_sample", "cycle_index"]


def ordinal(df: DataFrame, order_by: Sequence[str], partition_by: Sequence[str] = ()) -> DataFrame:
    """Stable row ordinal ``__ord`` (0-based) — building block for
    chunk/skip/cycle, which are order-dependent in a stream world.
    A global ordinal uses an unpartitioned window (single-task sort):
    fine for samples/tests; at scale always pass ``partition_by``."""
    w = (
        Window.partitionBy(*partition_by).orderBy(*order_by)
        if partition_by
        else Window.orderBy(*order_by)
    )
    return df.withColumn("__ord", F.row_number().over(w) - 1)


def chunk(
    df: DataFrame,
    size: int,
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """``StreamExt::chunks`` analog: assign each row a chunk id
    (``__chunk``) of ``size`` consecutive rows in ``order_by`` order;
    aggregate per chunk downstream."""
    return ordinal(df, order_by, partition_by).withColumn(
        "__chunk", F.floor(F.col("__ord") / size).cast("bigint")
    )


def merge(*dfs: DataFrame) -> DataFrame:
    """``StreamExt::merge``: interleaving = order-free union."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def throttle_sample(df: DataFrame, one_in: int, on: str) -> DataFrame:
    """Deterministic 1-in-N rate bound (batch ``throttle`` analog)."""
    return df.where(F.pmod(F.xxhash64(F.col(on)), F.lit(one_in)) == 0)


def cycle_index(df: DataFrame, n: int, order_by: Sequence[str]) -> DataFrame:
    """``StreamExt::cycle`` analog for bounded data: tag each row with
    its position mod ``n`` (round-robin assignment)."""
    return ordinal(df, order_by).withColumn("__cycle", F.pmod(F.col("__ord"), F.lit(n)))

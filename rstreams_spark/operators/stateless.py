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

    With ``partition_by``: a per-key window, sharded by the key.

    Without it, the GLOBAL ordinal is computed in two distributed
    phases instead of the single-task unpartitioned window: (1)
    range-repartition on the order key and rank within each range
    shard (every shard sorts in parallel; range bounds keep shards
    in global order), (2) rank + the total row count of all earlier
    shards. The offsets frame is one row per SHARD (bounded
    metadata), so its running-sum window and the join back are
    broadcast-cheap; no task ever holds more than its shard. The
    ranked frame feeds both the offsets aggregate and the join, so
    it materializes once via lazy localCheckpoint (invariant #9 —
    use a real checkpoint dir on a cluster so shards survive
    executor loss; the checkpoint also pins partition ids against
    recompute instability)."""
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return df.withColumn("__ord", F.row_number().over(w) - 1)
    okeys = [F.col(c) for c in order_by]
    ranked = (
        df.repartitionByRange(*okeys)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__rn", F.row_number().over(Window.partitionBy("__pid").orderBy(*okeys))
        )
        .localCheckpoint(eager=False)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranked.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn("__ord", F.col("__off") + F.col("__rn") - 1)
        .drop("__pid", "__rn", "__off")
    )


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


def chunk_timeout(
    df: DataFrame,
    size: int,
    gap_seconds: int,
    ts_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """``StreamExt::chunks_timeout`` analog (reference src/lib.rs
    count-OR-time batching): a chunk closes after ``size`` rows OR
    when the stream goes silent for more than ``gap_seconds``.

    On an event-time log, "time" must mean EVENT time to be
    deterministic — wall-clock elapsed-since-first-buffered depends
    on the processing schedule and is not replayable, while a silence
    gap is a property of the data. (The live path gets wall-time
    batching from the micro-batch trigger + ``streaming.throttle``
    caps — count-or-time at trigger granularity.)

    Two single-pass windows, no recursion: the gap indicator's
    running sum splits silence-separated groups (``__session``), a
    row_number within each splits by count (``__chunk``). With
    ``partition_by`` both windows shard by key; without it the total
    order matches the reference's single-stream semantics (same
    discipline as ``chunk``).
    """
    keys = [F.col(c) for c in partition_by]
    order = [F.col(c) for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order) if keys else (
        Window.partitionBy().orderBy(*order)
    )
    e = F.unix_timestamp(F.col(ts_col))
    brk = (
        F.when(e - F.lag(e).over(w) > gap_seconds, F.lit(1))
        .otherwise(F.lit(0))
    )
    out = df.withColumn(
        "__session",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy(*keys, F.col("__session")).orderBy(*order)
    return out.withColumn(
        "__chunk",
        F.floor((F.row_number().over(w2) - 1) / size).cast("bigint"),
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

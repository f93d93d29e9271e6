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
    ``partition_by`` both windows shard by key.

    Without it, the global form is distributed the same way as
    ``ordinal``: range shards sort in parallel, and every
    cross-shard quantity is stitched with SHARD-COUNT-sized
    metadata — (a) each shard's first gap test borrows the previous
    shard's last event time, (b) global session ids add the break
    totals of earlier shards, (c) in-session positions add the
    segment counts of earlier shards (a session spanning shards is
    split into per-shard segments; the segment frame is bounded by
    shards + sessions). ``order_by`` must lead with ``ts_col`` so
    a shard's max event time is its last. Three lazy
    localCheckpoints pin the shard assignment and stop re-scans
    (invariants #8/#9; real checkpoint dir on a cluster).
    """
    order = [F.col(c) for c in order_by]
    # floor toward -inf (NOT unix_timestamp's trunc-toward-zero): the
    # silence-gap diffs must match the oracle's floor(epoch(ts)) on
    # pre-1970 instants too (queries/_util.py::epoch rationale)
    e = F.floor(
        F.col(ts_col).cast("timestamp").cast("double")
    ).cast("long")
    if not partition_by and (not order_by or order_by[0] != ts_col):
        # the distributed boundary gap test takes each shard's MAX
        # event time as its last row — only true in event-time order
        raise ValueError(
            f"global chunk_timeout requires order_by to lead with "
            f"ts_col ({ts_col!r}); got {list(order_by)!r}"
        )
    if partition_by:
        keys = [F.col(c) for c in partition_by]
        w = Window.partitionBy(*keys).orderBy(*order)
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
    ranged = (
        df.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__e", e)
        .localCheckpoint(eager=False)
    )
    wp = Window.partitionBy("__pid").orderBy(*order)
    # (a) previous shard's last event time seeds the boundary gap test
    shard_prev = (
        ranged.groupBy("__pid")
        .agg(F.max("__e").alias("__last"))
        .withColumn("__prev_last", F.lag("__last").over(Window.orderBy("__pid")))
        .select("__pid", "__prev_last")
    )
    brk = F.when(
        F.col("__e") - F.coalesce(F.lag("__e").over(wp), F.col("__prev_last"))
        > gap_seconds,
        F.lit(1),
    ).otherwise(F.lit(0))
    sessioned = (
        ranged.join(F.broadcast(shard_prev), "__pid")
        .withColumn("__brk", brk)
        .withColumn(
            "__sess_local",
            F.sum("__brk").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .localCheckpoint(eager=False)
    )
    # (b) global session id = local running sum + earlier shards' breaks
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    brk_off = (
        sessioned.groupBy("__pid")
        .agg(F.sum("__brk").alias("__bt"))
        .withColumn("__boff", F.coalesce(F.sum("__bt").over(w_off), F.lit(0)))
        .select("__pid", "__boff")
    )
    segmented = (
        sessioned.join(F.broadcast(brk_off), "__pid")
        .withColumn(
            "__session", (F.col("__sess_local") + F.col("__boff")).cast("bigint")
        )
        .withColumn(
            "__rn_seg",
            F.row_number().over(
                Window.partitionBy("__pid", "__session").orderBy(*order)
            ),
        )
        .localCheckpoint(eager=False)
    )
    # (c) in-session position = segment rank + earlier shards' segment counts
    w_seg = (
        Window.partitionBy("__session")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # only segments with an earlier-shard predecessor need an offset:
    # a session spanning k shards contributes k-1 such rows, so the
    # BROADCAST side is bounded by shards-1 no matter how many
    # sessions exist (gap-heavy data makes sessions ~O(rows) — an
    # unfiltered broadcast would ship them all to every executor)
    seg_off = (
        segmented.groupBy("__pid", "__session")
        .agg(F.count("*").alias("__sc"))
        .withColumn("__soff", F.coalesce(F.sum("__sc").over(w_seg), F.lit(0)))
        .where(F.col("__soff") > 0)
        .select("__pid", "__session", "__soff")
    )
    return (
        segmented.join(F.broadcast(seg_off), ["__pid", "__session"], "left")
        .withColumn("__soff", F.coalesce(F.col("__soff"), F.lit(0)))
        .withColumn(
            "__chunk",
            F.floor(
                (F.col("__soff") + F.col("__rn_seg") - 1) / size
            ).cast("bigint"),
        )
        .drop("__pid", "__e", "__prev_last", "__brk", "__sess_local", "__rn_seg", "__soff")
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

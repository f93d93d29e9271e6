"""Sinks: where rstreams pipelines terminate (reference README
"Sink" taxonomy). Batch writers + streaming sinks incl. a
foreachBatch changelog-upsert that materializes a Table."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = [
    "write_parquet", "write_bucketed", "stream_to_memory", "stream_to_parquet",
    "stream_foreach_batch",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed+sorted table write: the 100 TB answer for REPEATED
    big-table equi-joins/aggs on the same key. Co-bucketed tables
    join with ZERO exchanges (pinned by
    tests/test_plans.py::test_bucketed_join_needs_no_shuffle) — pay
    the shuffle once at write time, never again per query.
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .option("path", path)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet: ``partition_by`` low-cardinality columns
    give partition pruning to every downstream reader."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Memory sink (tests/debug): query results as table ``name``."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def stream_to_parquet(df: DataFrame, path: str, checkpoint: str):
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def stream_foreach_batch(
    df: DataFrame, fn: Callable[[DataFrame, int], None], output_mode: str = "update"
):
    """foreachBatch escape hatch — e.g. upserting a changelog table
    into an external KV/OLTP store (the reference's redb Store role,
    src/store.rs)."""
    return df.writeStream.foreachBatch(fn).outputMode(output_mode).start()

"""Sinks: where rstreams pipelines terminate (reference README
"Sink" taxonomy). Batch writers + streaming sinks incl. a
foreachBatch changelog-upsert that materializes a Table."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = [
    "write_parquet", "write_orc", "write_bucketed", "compact_parquet",
    "stream_to_memory", "stream_to_parquet", "stream_foreach_batch",
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


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC twin of ``write_parquet`` — same partition-pruning
    contract on read (both in-box columnar formats are supported so
    a consumer's existing lake layout dictates the choice)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 512,
    nanos_cols: dict[str, str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ⌈bytes/target⌉ files. Streaming sinks and incremental ingests
    leave thousands of tiny files; scans then pay per-file open/footer
    costs and lose row-group-level parallelism. Returns the new file
    count. Rewrites THROUGH a temp subdir then swaps, so a failure
    mid-write never destroys the source.
    """
    import math
    import os
    import shutil

    from ..sources.files import read_parquet

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compact_tmp"
    read_parquet(spark, path, nanos_cols).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    backup = path.rstrip("/") + "__compact_old"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return n_files


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

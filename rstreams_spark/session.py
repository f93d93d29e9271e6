"""Tuned SparkSession builder.

One place to set the scale-oriented defaults so every entrypoint
(tests, bench, driver) runs the same engine configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def _default_driver_mem() -> str:
    """Driver heap default: 48g (sf1 broadcasts OOM at 8g) clamped to
    ~80% of physical RAM so hosts smaller than the dev box don't get
    OOM-killed by a lazily-committed Xmx they can't back. The
    SPARK_GRAFT_DRIVER_MEM env var always wins."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        phys = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return "48g"
    return f"{max(2, min(48, int(phys * 0.8 / (1 << 30))))}g"


def get_spark(
    app_name: str = "rstreams_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    AQE is on so post-shuffle partition counts, skew joins and
    dynamic broadcast decisions adapt at runtime — the same configs
    we would ship to a 1000-executor cluster; only ``master`` and the
    partition count are local-mode artifacts.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches for mapInPandas/applyInPandasWithState: the
        # 10k default fragments a 2M-row trigger into 200 transfer
        # round-trips per partition; 100k measured ~1.4× on the
        # stateful streaming path with bounded per-batch memory
        # (rows × row-width per worker)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: ONE JVM hosts the driver AND all executor
        # threads — 8g starved 32 concurrent tasks plus broadcast
        # builds at sf1 (notEnoughMemoryToBuildAndBroadcastTable).
        # Xmx is a cap, not an upfront allocation, but it is clamped
        # to ~80% of detected physical RAM so a smaller box fails
        # with a clear broadcast OOM instead of an OOM-kill; override
        # via SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory", _default_driver_mem())
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # ObjectHashAggregate (any collect_list/collect_set agg)
        # falls back to SORT-based aggregation after 128 distinct
        # keys per task by default — the minhash signature agg (64
        # mins + the hash set) was paying a full sort of the shingle
        # stream at every SF for nothing. 8192 keys × ~1 KB of
        # per-key buffers ≈ 8 MB/task before fallback: safe on any
        # executor, and per-task key counts are shuffle-partition
        # controlled at scale anyway.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                "8192")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def register_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[str]:
    """Register the sf tables as temp views so users can drive the
    engine with plain ``spark.sql(...)`` — the SQL face of the same
    Catalyst plans the DataFrame API builds. Returns view names."""
    tables = load_tables(spark, sf_dir, *names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return list(tables)


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load parquet tables from an sf dir; returns dict name->DataFrame.

    Scans stay columnar/pushdown-friendly: callers select/filter on
    the returned frames and Catalyst prunes at the parquet reader.
    """
    from .sources.files import read_parquet

    all_names = names or (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()
    return {
        n: read_parquet(spark, f"{sf_dir}/{n}.parquet", nanos_cols={"ts": "ns"})
        for n in all_names
    }

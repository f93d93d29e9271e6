"""File sources (batch + streaming).

The reference's only real source is Kafka (feature-gated samsa); a
Spark engine's workhorse sources are columnar files. These helpers
keep scans pushdown-friendly and handle the TIMESTAMP(NANOS) parquet
wrinkle (Spark reads nanos as long behind the legacy flag; every
other consumer truncates to µs — we match that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "read_parquet", "read_json", "read_csv", "read_orc", "read_text_lines",
    "stream_files", "stream_rate", "register_tables", "TABLES",
]


def _fix_nanos(df: DataFrame, nanos_cols: dict[str, str] | None) -> DataFrame:
    for col, unit in (nanos_cols or {}).items():
        if unit == "ns" and dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def read_parquet(
    spark: SparkSession, path: str, nanos_cols: dict[str, str] | None = None
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _fix_nanos(spark.read.parquet(path), nanos_cols)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON lines with an explicit schema (never infer at scale: the
    inference pass is a full extra read of the data)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC — the other columnar in-box format; same pushdown/pruning
    behavior as parquet (PushedFilters in the scan node)."""
    return spark.read.orc(path)


def read_text_lines(
    spark: SparkSession, path: str, line_col: str = "line"
) -> DataFrame:
    """Raw text, one row per line — the reference's shakespeare
    loader shape (example/shakespeare_loader.rs reads the play as
    lines and produces keyed records); downstream normalization/
    wordcount is the tpipe pipeline."""
    return spark.read.text(path).withColumnRenamed("value", line_col)


def stream_files(
    spark: SparkSession, path: str, fmt: str, schema: StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source — schema is mandatory (streaming reads
    cannot infer); ``maxFilesPerTrigger`` bounds microbatch size."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic benchmark stream (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def stream_rate_micro_batch(
    spark: SparkSession, rows_per_batch: int, num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic stream with a FIXED batch size (timestamp, value).

    Unlike ``rate``, whose backlog balloons batch sizes when the
    offered rate exceeds engine capacity (each trigger swallows the
    accumulated lag, so slow pipelines see ever-growing batches and
    never finish N batches in bounded time), ``rate-micro-batch``
    emits exactly ``rows_per_batch`` rows per trigger — the right
    source for measuring per-row capacity of a slow (Python-state)
    path.
    """
    r = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
    )
    if num_partitions is not None:
        r = r.option("numPartitions", num_partitions)
    return r.load()


TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register the sf-dir tables as temp views so the whole catalog
    surface is reachable through plain ``spark.sql`` — same nanos
    handling as the DataFrame path (queries/_util.t). Views are lazy:
    registration reads only parquet footers.
    """
    from ..queries._util import t

    for name in tables:
        t(spark, sf_dir, name).createOrReplaceTempView(name)

"""Time-based stream throttling (reference ``StreamExt::throttle``).

The reference's ``throttle(d)`` (tokio-streams) passes items through
at most once per wall-clock interval. The distributed analog bounds
the INGEST RATE per microbatch: a source-side row/file cap
(``maxOffsetsPerTrigger`` for Kafka, ``rowsPerBatch`` for
rate-micro-batch, ``maxFilesPerTrigger`` for file sources) combined
with a processing-time trigger interval yields "at most N units per
T of wall time" — genuine time-based rate limiting, complementing
the batch catalog's deterministic 1-in-N ``throttle_sample``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader, DataStreamWriter

__all__ = ["throttled_reader", "throttled", "SOURCE_CAP_OPTION"]

# per-format option bounding how much a single microbatch ingests
SOURCE_CAP_OPTION = {
    "kafka": "maxOffsetsPerTrigger",
    "rate-micro-batch": "rowsPerBatch",
    "parquet": "maxFilesPerTrigger",
    "json": "maxFilesPerTrigger",
    "csv": "maxFilesPerTrigger",
    "text": "maxFilesPerTrigger",
}


def throttled_reader(
    spark: SparkSession, fmt: str, per_trigger: int, **options: str
) -> DataStreamReader:
    """``spark.readStream`` for ``fmt`` with its per-trigger ingest
    cap set to ``per_trigger`` (rows for kafka/rate-micro-batch,
    files for file sources). Unknown formats raise — a silent
    missing cap would mean an unthrottled stream.
    """
    try:
        key = SOURCE_CAP_OPTION[fmt]
    except KeyError:
        raise ValueError(
            f"no per-trigger cap option known for format {fmt!r}; "
            f"supported: {sorted(SOURCE_CAP_OPTION)}"
        ) from None
    reader = spark.readStream.format(fmt).option(key, per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def throttled(writer: DataStreamWriter, every: str) -> DataStreamWriter:
    """Fire a microbatch at most once per ``every`` of wall time
    (processing-time trigger), e.g. ``throttled(w, "5 seconds")``.
    Together with ``throttled_reader``'s cap: ≤ cap rows per
    ``every``."""
    return writer.trigger(processingTime=every)

"""Streaming deduplication — the live counterpart of the batch
dedup family (functions/dedup.py).

``stream_dedup_exact`` drops records whose fingerprint was already
seen, with the dedup state bounded by the watermark horizon instead
of growing forever: the distributed, fault-tolerant analog of an
ingest pipeline's "have I seen these bytes" KV set, and the missing
piece for running the exact-dedup stage on a live firehose rather
than a parquet corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_fingerprint

__all__ = ["stream_dedup_exact"]


def stream_dedup_exact(
    df: DataFrame,
    text_col: str,
    ts_col: str,
    horizon: str = "1 hour",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Keep the first record per content fingerprint (md5 of the
    normalized text, same fingerprint as the batch ``dedup_exact``),
    optionally scoped by ``keys``.

    State is evicted once the watermark passes ``horizon`` — a dup
    arriving later than the horizon is treated as new, which is the
    deliberate trade bounding state at (distinct fingerprints per
    horizon), not (all fingerprints ever). Runs on the engine's
    dedup state store: hash-partitioned by fingerprint, checkpointed.
    """
    fp = df.withColumn("__fp", md5_fingerprint(F.col(text_col)))
    fp = fp.withWatermark(ts_col, horizon)
    return fp.dropDuplicatesWithinWatermark([*keys, "__fp"]).drop("__fp")

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

__all__ = ["stream_dedup_exact", "stream_span_dedup"]


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


def stream_span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    horizon: str = "1 hour",
    span_size: int = 16,
) -> DataFrame:
    """Live span-level exact substring dedup — the streaming
    counterpart of the batch ``span_dedup`` catalog query (Lee et
    al. 2021 at non-overlapping ``span_size``-token granularity):
    each document is exploded into spans and a span whose text was
    already emitted inside the watermark horizon is dropped, so the
    sink receives only first-occurrence spans (with their source doc
    id and position, from which a consumer reassembles text exactly
    like the batch operator does).

    First-arrival order stands in for the batch min-(doc_id, idx)
    keeper — on a live firehose "first seen" IS arrival order. State
    is the engine's dedup store keyed by span text, hash-partitioned
    and watermark-evicted: (distinct spans per horizon), not (all
    spans ever) — the same trade ``stream_dedup_exact`` makes.
    """
    from ..functions.text import token_chunks, tokens

    spans = df.select(
        id_col,
        ts_col,
        F.explode(
            token_chunks(tokens(F.col(text_col)), span_size, 0)
        ).alias("__c"),
    ).select(
        id_col,
        ts_col,
        F.col("__c.chunk_idx").cast("long").alias("span_idx"),
        F.col("__c.chunk_text").alias("span_text"),
        F.col("__c.n_tokens").cast("long").alias("n_tokens"),
    )
    return spans.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        ["span_text"]
    )

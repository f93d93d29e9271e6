"""Streaming event-time windows (Structured Streaming).

The live-stream counterpart of ``operators.windows``: same grouped
aggregation on (key, window), driven by the microbatch engine with a
watermark bounding state — the role the reference's per-key KV-store
buffers play in ``tumbling_window``/``hopping_window``
(reference src/window.rs:42-177), but with distributed, spillable,
checkpointed state instead of a single-process map.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_tumbling_window", "stream_hopping_window"]


def _stream_windowed(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    size: str,
    hop: str | None,
    watermark: str,
    *aggs: Column,
) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    win = F.window(F.col(ts), size, hop) if hop else F.window(F.col(ts), size)
    out = (
        df.withWatermark(ts, watermark)
        .groupBy(*keys, win.alias("window"))
        .agg(*aggs)
    )
    return out.select(
        *keys,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c not in (*keys, "window")],
    )


def stream_tumbling_window(
    df: DataFrame, key: str | Sequence[str], ts: str, size: str,
    *aggs: Column, watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling windows; append-mode emits a window once
    the watermark passes its end (late data beyond it is dropped —
    the scalable stand-in for the reference's emit-on-next-window)."""
    return _stream_windowed(df, key, ts, size, None, watermark, *aggs)


def stream_hopping_window(
    df: DataFrame, key: str | Sequence[str], ts: str, size: str, hop: str,
    *aggs: Column, watermark: str = "10 minutes",
) -> DataFrame:
    return _stream_windowed(df, key, ts, size, hop, watermark, *aggs)

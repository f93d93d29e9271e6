"""Streaming joins.

``stream_interval_join`` — the live counterpart of the reference's
``inner_join_streams`` (src/join.rs:21-140): keyed stream-stream
inner join matching records within ``high_water_mark`` of each
other. Watermarks on both sides bound join state exactly the way the
reference's prune-on-arrival loop bounds its KV buffers
(src/join.rs:76-81), but distributed and checkpointed.

``stream_table_join`` — enrich a stream against a (slowly changing)
batch dimension: broadcast hash join per microbatch, no stream-side
shuffle; the streaming analog of reference ``join_stream_table``
(src/join.rs:142-156).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join", "stream_table_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    high_water_mark: str,
    watermark: str | None = None,
) -> DataFrame:
    """Keyed stream-stream inner join with |t_l − t_r| < hwm (strict).

    ``watermark`` (default: the hwm itself) is applied to both sides;
    Spark uses it plus the time-range condition to expire state.
    """
    wm = watermark or high_water_mark
    l = left.withWatermark(left_ts, wm).alias("l")
    r = right.withWatermark(right_ts, wm)
    for c in right.columns:
        r = r.withColumnRenamed(c, f"r_{c}")
    r = r.alias("r")
    band = F.expr(f"INTERVAL {high_water_mark}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.r_{key}"))
        & (F.col(f"l.{left_ts}") > F.col(f"r.r_{right_ts}") - band)
        & (F.col(f"l.{left_ts}") < F.col(f"r.r_{right_ts}") + band)
    )
    return l.join(r, cond, "inner")


def stream_table_join(
    stream: DataFrame, stream_key: str, table: DataFrame, table_key: str,
    how: str = "left",
) -> DataFrame:
    cond = stream[stream_key] == table[table_key]
    return stream.join(F.broadcast(table), cond, how).drop(table[table_key])

"""Custom stateful streaming operators via applyInPandasWithState.

``stream_lag_window`` is the live counterpart of the reference's
``lag_window`` (src/window.rs:9-40): per-key buffer of the last N
values, emitting the buffer for every arriving row once full. State
is the per-key buffer (bounded at N rows), partitioned by key across
executors and checkpointed — exactly what the reference's KV store
holds, made distributed and fault-tolerant.

``stream_latest_per_key`` is the reference ``Table`` changelog
(src/table.rs:15-44) as an update-mode streaming aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_lag_window", "stream_latest_per_key", "stream_strat_classify"]


def stream_lag_window(
    df: DataFrame,
    key: str,
    ts: str,
    lag: int,
    value_col: str,
) -> DataFrame:
    """Per-key sliding buffer of the last ``lag`` values (streaming).

    Output schema: (key string-compatible, ts, values array<double>).
    Rows within a microbatch are processed in ``ts`` order; the
    buffer carries across batches via GroupState.
    """
    out_schema = f"{key} string, {ts} timestamp, values array<double>"
    state_schema = "buf array<double>"

    def fn(
        group_key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (buf,) = state.get if state.exists else ([],)
        buf = list(buf)
        out_ts, out_vals = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts)
            for t_val, v in zip(pdf[ts], pdf[value_col]):
                buf.append(float(v))
                if len(buf) > lag:
                    buf.pop(0)
                if len(buf) == lag:
                    out_ts.append(t_val)
                    out_vals.append(list(buf))
        state.update((buf,))
        yield pd.DataFrame(
            {key: [group_key[0]] * len(out_ts), ts: out_ts, "values": out_vals}
        )

    return (
        df.select(F.col(key).cast("string").alias(key), ts, value_col)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def stream_latest_per_key(df: DataFrame, key: str, ts: str, value_col: str) -> DataFrame:
    """Changelog table as an update-mode streaming aggregation:
    max(struct(ts, value)) per key — one row of state per key."""
    packed = F.max(F.struct(F.col(ts), F.col(value_col))).alias("__latest")
    agg = df.groupBy(key).agg(packed)
    return agg.select(
        key,
        F.col(f"__latest.{ts}").alias(ts),
        F.col(f"__latest.{value_col}").alias(value_col),
    )


def stream_strat_classify(
    candles: DataFrame,
    key: str,
    ts: str,
) -> DataFrame:
    """Live candle-strat classification (reference
    example/stocks.rs classify_candle_strat): per-key state holds the
    previous candle's (top, bottom); each arriving FINALIZED candle
    is classified against it — inside/up/down/outside + color —
    mirroring the batch ``strat_classify`` lag logic exactly.

    Spark forbids a second stateful operator directly after a
    streaming aggregation, so the supported topology is two chained
    queries: candles stream → file/Kafka sink, then this operator
    over the candle stream (tests/test_streaming.py exercises the
    full two-stage pipeline). State is one (top, bottom) pair per
    key — constant size, watermark-independent.
    """
    out_schema = (
        f"{key} string, {ts} timestamp, strat_class string, color string"
    )
    state_schema = "prev_top double, prev_bottom double"

    def fn(
        group_key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = state.get if state.exists else None
        out_ts, out_cls, out_color = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts)
            for t_val, o, c in zip(pdf[ts], pdf["open"], pdf["close"]):
                top, bottom = max(o, c), min(o, c)
                if prev is not None:
                    p_top, p_bottom = prev
                    above, below = top > p_top, bottom < p_bottom
                    cls = (
                        "outside" if above and below
                        else "up" if above
                        else "down" if below
                        else "inside"
                    )
                    out_ts.append(t_val)
                    out_cls.append(cls)
                    out_color.append("green" if o < c else "red")
                prev = (float(top), float(bottom))
        state.update(prev)
        yield pd.DataFrame(
            {
                key: [group_key[0]] * len(out_ts),
                ts: out_ts,
                "strat_class": out_cls,
                "color": out_color,
            }
        )

    return (
        candles.select(
            F.col(key).cast("string").alias(key), ts, "open", "close"
        )
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )

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

__all__ = ["stream_lag_window", "stream_latest_per_key"]


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

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

__all__ = [
    "stream_tumbling_window",
    "stream_hopping_window",
    "stream_tumbling_window_gapfill",
]


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


def stream_tumbling_window_gapfill(
    df: DataFrame, key: str, ts: str, size_seconds: int, value_col: str
) -> DataFrame:
    """Live empty-window emission — the streaming counterpart of
    ``operators.windows.tumbling_window(gap_fill=True)`` and the
    faithful realization of the reference's gap behavior
    (src/window.rs:71-84: crossing into a new window flushes the
    buffer AND emits one empty record per silent window between).

    Watermarked streaming aggregations can't emit windows no event
    ever touched, so this is a custom stateful operator
    (``applyInPandasWithState``): per-key state is the open window's
    index + running (n, sum); when a row lands in a later window the
    open window flushes, every skipped index emits ``(n=0,
    sum_value=0.0)``, and the new window opens. Epoch-aligned
    ``ts // size`` indices match both the batch operator's
    ``F.window`` grid and the reference's integer-division indexing.
    State is three scalars per key; rows later than an already-flushed
    window are dropped (the watermarked-agg late-data contract). The
    still-open final window stays buffered — same emit-on-next-event
    semantics as the reference, so a bounded replay never emits each
    key's last window (tests compare against batch minus final
    window).
    """
    out_schema = (
        f"{key} string, window_start timestamp, n long, sum_value double"
    )
    state_schema = "widx long, n long, s double"

    def fn(group_key, pdfs, state):
        import pandas as pd

        widx, n, s = state.get if state.exists else (None, 0, 0.0)
        starts: list[int] = []
        ns: list[int] = []
        sums: list[float] = []
        # concat chunks before sorting (CLAUDE invariant #7)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        whole = (
            pd.concat(chunks).sort_values(ts) if chunks else pd.DataFrame()
        )
        for row in whole.itertuples(index=False):
            rowd = row._asdict()
            w = int(rowd[ts].timestamp()) // size_seconds
            if widx is None:
                widx = w
            elif w > widx:
                starts.append(widx * size_seconds)
                ns.append(n)
                sums.append(s)
                for g in range(widx + 1, w):  # silent windows
                    starts.append(g * size_seconds)
                    ns.append(0)
                    sums.append(0.0)
                widx, n, s = w, 0, 0.0
            elif w < widx:
                continue  # late beyond the open window: drop
            n += 1
            s += float(rowd[value_col])
        if widx is not None:
            state.update((widx, n, s))
        yield pd.DataFrame(
            {
                key: [group_key[0]] * len(starts),
                "window_start": pd.to_datetime(starts, unit="s"),
                "n": ns,
                "sum_value": sums,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        df.select(F.col(key).cast("string").alias(key), ts, value_col)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )

"""Event-time windows, Spark-first.

Parity targets (reference semantics, not implementation):
- ``tumbling_window`` — reference src/window.rs:42-92: per-key
  buffers flushed when event time crosses a ``size`` boundary.
- ``hopping_window`` — reference src/window.rs:95-177: overlapping
  ``[start, start+size)`` windows advancing by ``hop``.
- ``lag_window`` — reference src/window.rs:9-40: per-key sliding
  buffer of the last N values, emitted once full.

The reference walks each key's buffer imperatively against a KV
store. On Spark the same result is a *declarative* grouped
aggregation on ``(key, window)``: one hash shuffle, map-side partial
aggregation, AQE-coalesced output — the plan that survives 100 TB.
Raw-buffer parity (the reference yields the vector of values) is an
aggregate too: pass ``F.collect_list``/``F.sort_array``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "tumbling_window", "hopping_window", "lag_window", "session_window",
    "rollup_candles",
]


def _windowed(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    size: str,
    hop: str | None,
    *aggs: Column,
) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    win = F.window(F.col(ts), size, hop) if hop else F.window(F.col(ts), size)
    out = df.groupBy(*keys, win.alias("window")).agg(*aggs)
    # surface start/end as plain sortable columns (reference emits
    # window_start alongside the buffer, src/window.rs:152-156)
    return out.select(
        *keys,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c not in (*keys, "window")],
    )


def tumbling_window(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    size: str,
    *aggs: Column,
    gap_fill: bool = False,
) -> DataFrame:
    """Non-overlapping event-time windows of ``size`` per key.

    ``gap_fill=True`` restores the reference's empty-window emission
    (src/window.rs:71-84: silent gaps between a key's windows yield
    empty buffers): each key's window grid from its first to its last
    window is sequence-generated and left-joined, so gap windows
    appear with NULL aggregates (coalesce counts to 0 downstream).
    Scale shape: the grid derives from the already-aggregated (small)
    window frame — one extra shuffle on key over window rows, never
    over raw events; per-key grid length is span/size, bounded for
    any real retention window.
    """
    out = _windowed(df, key, ts, size, None, *aggs)
    if not gap_fill:
        return out
    return _gap_filled(out, key, size, size)


def _gap_filled(
    out: DataFrame, key: str | Sequence[str], size: str, step: str
) -> DataFrame:
    """Left-join ``out`` (a windowed frame) against each key's full
    window grid (start advancing by ``step`` from first to last
    window), so silent gaps appear as NULL-aggregate rows."""
    keys = [key] if isinstance(key, str) else list(key)
    span = out.groupBy(*keys).agg(
        F.min("window_start").alias("__lo"), F.max("window_start").alias("__hi")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval {step})")
        ).alias("window_start"),
    )
    filled = grid.join(out.drop("window_end"), [*keys, "window_start"], "left")
    filled = filled.withColumn(
        "window_end", F.col("window_start") + F.expr(f"interval {size}")
    )
    return filled.select(*out.columns)


def hopping_window(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    size: str,
    hop: str,
    *aggs: Column,
    gap_fill: bool = False,
) -> DataFrame:
    """Overlapping windows of ``size`` advancing by ``hop`` per key.

    Spark's ``F.window(ts, size, hop)`` assigns each event to all
    ``size/hop`` windows containing it — the reference's per-hop
    emission (src/window.rs:127-156). ``gap_fill=True`` additionally
    emits the reference's empty hop windows (src/window.rs:147-163):
    the per-key hop grid between first and last window is generated
    and left-joined, so hops whose window contains no events appear
    with NULL aggregates. Same scale shape as tumbling gap-fill: the
    grid derives from the aggregated frame, never the raw events.
    """
    out = _windowed(df, key, ts, size, hop, *aggs)
    if not gap_fill:
        return out
    return _gap_filled(out, key, size, hop)


def rollup_candles(
    candles: DataFrame, key: str | Sequence[str], size: str, *extra: Column
) -> DataFrame:
    """Hierarchical OHLCV rollup: coarser candles from finer candles.

    The reference's stocks pipeline chains its timeframes off one
    tick stream, re-windowing RAW ticks per timeframe
    (example/stocks.rs:160-207). At 100 TB the scale answer is a
    rollup lattice: compute the finest candles once, then derive 4h
    from 1h, 1d from 4h… — each level aggregates the (tiny) previous
    level, not the tick table. OHLCV composes exactly over aligned
    windows: open = open of earliest sub-candle (min_by window_start),
    close = close of latest, high/low = max/min, volume/n = sums.

    Input: a frame produced by ``tumbling_window``-style candle
    queries with columns (key…, window_start, window_end, open, high,
    low, close, [volume,] n_trades). ``size`` must be a multiple of
    the input candle width. ``volume`` re-sums when present; pass
    ``extra`` aggregates for any additional partial columns the finer
    level carries (e.g. hi/lo micros-sum parts, which re-combine
    EXACTLY as long sums where a raw double re-sum would be
    order-dependent — see queries/core.py::candles_rollup).
    """
    keys = [key] if isinstance(key, str) else list(key)
    win = F.window(F.col("window_start"), size)
    vol = (
        [F.sum("volume").alias("volume")]
        if "volume" in candles.columns else []
    )
    out = candles.groupBy(*keys, win.alias("window")).agg(
        F.min_by("open", F.col("window_start")).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", F.col("window_start")).alias("close"),
        *vol,
        F.sum("n_trades").alias("n_trades"),
        *extra,
    )
    return out.select(
        *keys,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c not in (*keys, "window")],
    )


def session_window(
    df: DataFrame, key: str | Sequence[str], ts: str, gap: str, *aggs: Column
) -> DataFrame:
    """Gap-based sessions per key (beyond the reference's fixed
    windows — the natural next window type for event analytics).

    Spark merges consecutive events while each arrives at or before
    ``previous + gap`` — INCLUSIVE at the boundary (probed on
    Spark 4: an event exactly gap after the previous one extends the
    session; the upstream docs suggest a strict bound). Still a
    single grouped aggregation — one shuffle on key, session merging
    happens inside the sort-based session aggregation operator.
    """
    keys = [key] if isinstance(key, str) else list(key)
    win = F.session_window(F.col(ts), gap)
    out = df.groupBy(*keys, win.alias("session")).agg(*aggs)
    return out.select(
        *keys,
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *[c for c in out.columns if c not in (*keys, "session")],
    )


def lag_window(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    lag: int,
    value_cols: Sequence[str],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Per-key sliding buffer of the last ``lag`` rows (inclusive).

    Emits one row per input row once a key has ≥ ``lag`` rows, with
    ``values`` = array of structs of ``value_cols`` ordered oldest →
    newest — matching reference src/window.rs:26-35 (emit when
    ``events.len() == lag``, then slide by one).

    Runs as a ranked window function: a single shuffle on ``key``,
    per-partition sort on ``ts`` — no per-row state round-trips.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts), *[F.col(t) for t in tiebreakers]]
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(-(lag - 1), 0)
    buf = F.collect_list(F.struct(*[F.col(c) for c in value_cols])).over(w)
    return (
        df.withColumn("values", buf)
        .where(F.size("values") == lag)
        .select(*keys, F.col(ts), "values")
    )

"""transformWithStateInPandas operators (Spark 4.x state API).

The newer stateful-processing API: named state variables, timers,
and explicit lifecycle on a per-key ``StatefulProcessor`` — Spark's
long-term replacement for ``applyInPandasWithState``. The
``applyInPandasWithState`` implementations in ``stateful.py`` remain
the portable floor; this module carries the forward path and proves
it produces identical results (tests/test_streaming.py parity test).

Requires the RocksDB state store provider — pair with
``streaming.state.rocksdb_state`` (the engine rejects
transformWithState on the default HDFS-backed provider) — AND the
``protobuf`` package (Spark's state-server protocol between the JVM
and the Python stateful processor is protobuf-framed). Environments
without protobuf get a clear ImportError at operator-construction
time instead of a crashed driver worker mid-query;
``HAS_TWS_RUNTIME`` is the probe (same optional-dependency gating
pattern as the PIL codec in functions/multimodal.py).

Reference parity targets: lag_window (src/window.rs:9-40),
strat_classify (example/stocks.rs classify_candle_strat), Table
changelog (src/table.rs:15-44), StreamExt::timeout silence detection
— each the same contract as its ``stateful.py`` twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ._chunks import concat_time_ordered
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "stream_lag_window_tws", "stream_strat_classify_tws",
    "stream_latest_per_key_tws", "stream_gap_detect_tws",
    "HAS_TWS_RUNTIME",
]

try:  # the JVM↔Python state protocol needs protobuf at runtime
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_RUNTIME = True
except ImportError:
    HAS_TWS_RUNTIME = False


def _require_tws() -> None:
    if not HAS_TWS_RUNTIME:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(Spark's Python state-server protocol); it is not "
            "installed — use the streaming.stateful "
            "applyInPandasWithState equivalent"
        )


class _LagProcessor(StatefulProcessor):
    """Per-key sliding buffer of the last ``lag`` values as a named
    ValueState variable (array<double> — bounded at lag doubles)."""

    def __init__(self, key: str, ts: str, value_col: str, lag: int):
        self._key, self._ts, self._vc, self._lag = key, ts, value_col, lag

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getValueState(
            "buf",
            StructType([StructField("vals", ArrayType(DoubleType()))]),
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._buf.get() if self._buf.exists() else None
        buf = list(got[0]) if got is not None else []
        # concat ALL chunks before sorting (CLAUDE invariant #7);
        # fast paths (skip copy/sort when possible) in _chunks
        whole = concat_time_ordered([pdf for pdf in rows if len(pdf)], self._ts)
        out_ts, out_vals = [], []
        for row in whole.itertuples(index=False):
            d = row._asdict()
            buf.append(float(d[self._vc]))
            if len(buf) > self._lag:
                buf.pop(0)
            if len(buf) == self._lag:
                out_ts.append(d[self._ts])
                out_vals.append(list(buf))
        self._buf.update((buf,))
        yield pd.DataFrame(
            {
                self._key: [key[0]] * len(out_ts),
                self._ts: out_ts,
                "values": out_vals,
            }
        )

    def close(self) -> None:
        pass


def stream_lag_window_tws(
    df: DataFrame, key: str, ts: str, lag: int, value_col: str
) -> DataFrame:
    """``stream_lag_window`` on the transformWithStateInPandas API —
    identical output contract (tests assert equality), RocksDB-only.
    """
    _require_tws()
    out_schema = StructType(
        [
            StructField(key, StringType()),
            StructField(ts, TimestampType()),
            StructField("values", ArrayType(DoubleType())),
        ]
    )
    return (
        df.select(F.col(key).cast("string").alias(key), ts, value_col)
        .groupBy(key)
        .transformWithStateInPandas(
            _LagProcessor(key, ts, value_col, lag),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="None",
        )
    )


class _StratProcessor(StatefulProcessor):
    """Per-key ValueState of the previous candle's (top, bottom) —
    same classification logic as ``stateful.stream_strat_classify``
    (reference example/stocks.rs classify_candle_strat)."""

    def __init__(self, key: str, ts: str):
        self._key, self._ts = key, ts

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._prev = handle.getValueState(
            "prev", "prev_top double, prev_bottom double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = tuple(self._prev.get()) if self._prev.exists() else None
        # concat ALL chunks before sorting (CLAUDE invariant #7);
        # fast paths (skip copy/sort when possible) in _chunks
        whole = concat_time_ordered([pdf for pdf in rows if len(pdf)], self._ts)
        out_ts, out_cls, out_color = [], [], []
        if len(whole):
            for t_val, o, c in zip(whole[self._ts], whole["open"], whole["close"]):
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
        if prev is not None:
            self._prev.update(prev)
        yield pd.DataFrame(
            {
                self._key: [key[0]] * len(out_ts),
                self._ts: out_ts,
                "strat_class": out_cls,
                "color": out_color,
            }
        )

    def close(self) -> None:
        pass


def stream_strat_classify_tws(candles: DataFrame, key: str, ts: str) -> DataFrame:
    """``stream_strat_classify`` on transformWithStateInPandas —
    identical output contract, RocksDB-only. Same chained-query
    topology constraint as the portable version (no stateful op
    directly above a streaming aggregation)."""
    _require_tws()
    out_schema = StructType(
        [
            StructField(key, StringType()),
            StructField(ts, TimestampType()),
            StructField("strat_class", StringType()),
            StructField("color", StringType()),
        ]
    )
    return (
        candles.select(
            F.col(key).cast("string").alias(key), ts, "open", "close"
        )
        .groupBy(key)
        .transformWithStateInPandas(
            _StratProcessor(key, ts),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="None",
        )
    )


class _LatestProcessor(StatefulProcessor):
    """Per-key ValueState of the latest (ts, value) — the reference
    Table changelog (src/table.rs:15-44) on the tws API. Emits the
    merged latest row for every key that received input this batch
    (update-mode changelog, one state row per key)."""

    def __init__(self, key: str, ts: str, value_col: str):
        self._key, self._ts, self._vc = key, ts, value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._latest = handle.getValueState(
            "latest", "ts_us long, v double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = tuple(self._latest.get()) if self._latest.exists() else None
        got_input = False
        for pdf in rows:
            if not len(pdf):
                continue
            got_input = True
            # batch-local argmax on (ts, value) — same tie-break as
            # the JVM agg max(struct(ts, value)) in stateful.py.
            # MICROsecond resolution (the timestamp's full precision):
            # ms truncation would tie-break same-millisecond events
            # on value where the JVM struct-max compares sub-ms ts
            us = (pdf[self._ts].astype("int64") // 1_000).to_numpy()
            vs = pdf[self._vc].astype(float).to_numpy()
            for m, v in zip(us, vs):
                cand = (int(m), float(v))
                if cur is None or cand > cur:
                    cur = cand
        if got_input and cur is not None:
            self._latest.update(cur)
            yield pd.DataFrame(
                {
                    self._key: [key[0]],
                    self._ts: [pd.Timestamp(cur[0], unit="us")],
                    self._vc: [cur[1]],
                }
            )
        else:
            yield pd.DataFrame({self._key: [], self._ts: [], self._vc: []})

    def close(self) -> None:
        pass


def stream_latest_per_key_tws(
    df: DataFrame, key: str, ts: str, value_col: str
) -> DataFrame:
    """``stream_latest_per_key`` on transformWithStateInPandas —
    changelog semantics (one updated row per keyed input batch),
    numeric value column, RocksDB-only."""
    _require_tws()
    out_schema = StructType(
        [
            StructField(key, StringType()),
            StructField(ts, TimestampType()),
            StructField(value_col, DoubleType()),
        ]
    )
    return (
        df.select(
            F.col(key).cast("string").alias(key), ts,
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(key)
        .transformWithStateInPandas(
            _LatestProcessor(key, ts, value_col),
            outputStructType=out_schema,
            outputMode="update",
            timeMode="None",
        )
    )


class _GapProcessor(StatefulProcessor):
    """Event-time silence detection on tws timers: state is one
    last-seen timestamp per key; each batch re-arms a timer at
    ``last_seen + gap`` and ``handleExpiredTimer`` emits the gap row
    when the watermark passes it — same contract as
    ``stateful.stream_gap_detect`` (reference StreamExt::timeout)."""

    def __init__(self, key: str, gap_ms: int):
        self._key, self._gap_ms = key, gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._last = handle.getValueState("last", "last_ms long")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        last_ms = self._last.get()[0] if self._last.exists() else 0
        prev_timer = last_ms + self._gap_ms if last_ms else None
        for pdf in rows:
            if len(pdf):
                batch_max = int(pdf["__ts"].astype("int64").max() // 1_000_000)
                last_ms = max(last_ms, batch_max)
        self._last.update((last_ms,))
        if prev_timer is not None and prev_timer != last_ms + self._gap_ms:
            self._handle.deleteTimer(prev_timer)
        self._handle.registerTimer(last_ms + self._gap_ms)
        yield pd.DataFrame({self._key: [], "last_seen": []})

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if self._last.exists():
            (last_ms,) = self._last.get()
            self._last.clear()
            yield pd.DataFrame(
                {
                    self._key: [key[0]],
                    "last_seen": [pd.Timestamp(last_ms, unit="ms")],
                }
            )

    def close(self) -> None:
        pass


def stream_gap_detect_tws(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    watermark: str = "0 seconds",
) -> DataFrame:
    """``stream_gap_detect`` on transformWithStateInPandas: explicit
    event-time timers (timeMode="EventTime") instead of
    GroupStateTimeout — deterministic, replayable, RocksDB-only."""
    _require_tws()
    out_schema = StructType(
        [
            StructField(key, StringType()),
            StructField("last_seen", TimestampType()),
        ]
    )
    return (
        df.select(
            F.col(key).cast("string").alias(key), F.col(ts).alias("__ts")
        )
        .withWatermark("__ts", watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            _GapProcessor(key, gap_seconds * 1000),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="EventTime",
        )
    )

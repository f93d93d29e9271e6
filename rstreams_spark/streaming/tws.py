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
        # concat ALL chunks before sorting (CLAUDE invariant #7)
        chunks = [pdf for pdf in rows if len(pdf)]
        whole = (
            pd.concat(chunks).sort_values(self._ts)
            if chunks
            else pd.DataFrame()
        )
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
    if not HAS_TWS_RUNTIME:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(Spark's Python state-server protocol); it is not "
            "installed — use streaming.stateful.stream_lag_window, "
            "the applyInPandasWithState equivalent"
        )
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

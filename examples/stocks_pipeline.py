"""The reference's flagship example (example/stocks.rs) re-expressed
Spark-first: tick stream → OHLCV candles at multiple timeframes →
previous-candle "strat" classification → sinks.

The reference builds this as 10 chained actor pipelines (one per
timeframe), each hopping_window → aggregate_candles → lag_window(2)
→ classify (example/stocks.rs:160-207). Here each timeframe is one
declarative plan over the same scan: Catalyst shares the scan, each
timeframe is a single (symbol, window) shuffle, classification is a
lag over the (tiny) candle table — no actors, no channels, no
per-record state machines.

Run: python examples/stocks_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rstreams_spark.operators import windows
from rstreams_spark.queries._util import t
from rstreams_spark.session import get_spark

TIMEFRAMES = {
    "1h": "1 hour", "4h": "4 hours", "12h": "12 hours",
    "1d": "1 day", "1w": "1 week",
}


def candles(ticks: DataFrame, symbol: str, ts: str, price: str, size: str) -> DataFrame:
    """aggregate_candles parity (example/stocks.rs:231-257): open =
    first by time, close = last, high/low = max/min, volume = count
    (the driver's tick table has no volume column)."""
    order = F.struct(ts, "event_id")
    return windows.tumbling_window(
        ticks, symbol, ts, size,
        F.min_by(price, order).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(price, order).alias("close"),
        F.count("*").alias("volume"),
        F.count("*").alias("n_trades"),
    )


def classify_strat(c: DataFrame, symbol: str) -> DataFrame:
    """classify_candle_strat parity (example/stocks.rs:259-286):
    compare candle body extent vs the previous candle."""
    top, bottom = F.greatest("open", "close"), F.least("open", "close")
    w = Window.partitionBy(symbol).orderBy("window_start")
    lagged = c.select(
        symbol, "window_start", "open", "high", "low", "close", "volume",
        top.alias("top"), bottom.alias("bottom"),
        F.lag(top).over(w).alias("p_top"), F.lag(bottom).over(w).alias("p_bottom"),
    ).where(F.col("p_top").isNotNull())
    above, below = F.col("top") > F.col("p_top"), F.col("bottom") < F.col("p_bottom")
    strat = (
        F.when(above & below, "outside").when(above, "up")
        .when(below, "down").otherwise("inside")
    )
    color = F.when(F.col("open") < F.col("close"), "green").otherwise("red")
    return lagged.select(
        symbol, "window_start", "open", "high", "low", "close", "volume",
        strat.alias("strat_class"), color.alias("color"),
    )


def build_pipeline(ticks: DataFrame) -> dict[str, DataFrame]:
    """One classified-candle DataFrame per timeframe (the reference's
    per-timeframe Kafka topics, example/stocks.rs:160-177) — built as
    a rollup lattice: ticks are windowed ONCE at the finest
    timeframe; every coarser level re-aggregates the (tiny) previous
    level via ``rollup_candles`` instead of re-scanning ticks."""
    level = candles(ticks, "event_type", "ts", "value", TIMEFRAMES["1h"])
    out = {"1h": classify_strat(level, "event_type")}
    for name, size in list(TIMEFRAMES.items())[1:]:
        level = windows.rollup_candles(level, "event_type", size)
        out[name] = classify_strat(level, "event_type")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("stocks_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    ticks = t(spark, sf_dir, "events")
    for name, df in build_pipeline(ticks).items():
        n = df.count()
        sample = df.orderBy("event_type", "window_start").limit(3).collect()
        print(f"[{name}] {n} classified candles; first: "
              + ", ".join(f"{r['event_type']}@{r['window_start']}={r['strat_class']}"
                          for r in sample))
    spark.stop()


if __name__ == "__main__":
    main()

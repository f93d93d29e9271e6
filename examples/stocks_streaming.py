"""The reference stocks pipeline LIVE (example/stocks.rs end-to-end):

  ticks → watermarked tumbling candles → (file sink) →
        candle stream → stateful strat classification

Spark forbids a second stateful operator directly after a streaming
aggregation, so the supported topology is two chained queries with a
durable sink between them — which is also the production shape (the
candle store doubles as the queryable OHLCV table). State per key in
stage 2 is one (top, bottom) pair: constant, watermark-independent.

Run: python examples/stocks_streaming.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from rstreams_spark.queries._util import t
from rstreams_spark.session import get_spark
from rstreams_spark.sinks import writers
from rstreams_spark.streaming import stateful
from rstreams_spark.streaming import windows as swindows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("stocks-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp(prefix="stocks_streaming_"))

    # replay the events table as a file stream of ticks
    ticks_dir = work / "ticks"
    (
        t(spark, sf_dir, "events")
        .select("event_id", "ts", F.col("event_type").alias("sym"), "value")
        .write.json(str(ticks_dir))
    )
    ticks = spark.readStream.schema(
        "event_id bigint, ts timestamp, sym string, value double"
    ).json(str(ticks_dir))

    # stage 1: watermarked daily candles -> parquet
    candles = swindows.stream_tumbling_window(
        ticks, "sym", "ts", "1 day",
        F.min_by("value", F.struct("ts", "event_id")).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.struct("ts", "event_id")).alias("close"),
        F.count("*").alias("volume"),
        watermark="0 seconds",
    )
    candle_dir = str(work / "candles")
    q1 = writers.stream_to_parquet(candles, candle_dir, str(work / "ckpt1"))
    q1.processAllAvailable()
    q1.stop()

    # stage 2: candle stream -> stateful classification
    candle_stream = spark.readStream.schema(
        "sym string, window_start timestamp, window_end timestamp, "
        "open double, high double, low double, close double, volume bigint"
    ).parquet(candle_dir)
    classified = stateful.stream_strat_classify(
        candle_stream, "sym", "window_start"
    )
    q2 = writers.stream_to_memory(classified, "live_strat", "append")
    q2.processAllAvailable()
    q2.stop()

    rows = spark.sql(
        "select * from live_strat order by sym, window_start"
    ).collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["strat_class"]] = counts.get(r["strat_class"], 0) + 1
    first = ", ".join(
        f"{r['sym']}@{r['window_start']:%Y-%m-%d}={r['strat_class']}"
        for r in rows[:3]
    )
    print(f"[live] {len(rows)} classified candles; classes={counts}; first: {first}")


if __name__ == "__main__":
    main()

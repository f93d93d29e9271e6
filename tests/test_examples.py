"""End-to-end parity example tests: the stocks pipeline produces the
same classifications in batch and in streaming mode."""

from pyspark.sql import functions as F

from examples.stocks_pipeline import build_pipeline, candles
from rstreams_spark.queries._util import t
from rstreams_spark.sinks import writers
from rstreams_spark.streaming import windows as swindows

from conftest import SF_SMOKE


def test_stocks_pipeline_all_timeframes(spark):
    ticks = t(spark, SF_SMOKE, "events")
    out = build_pipeline(ticks)
    assert set(out) == {"1h", "4h", "12h", "1d", "1w"}
    day = out["1d"]
    assert day.count() > 0
    classes = {r["strat_class"] for r in day.select("strat_class").distinct().collect()}
    assert classes <= {"inside", "up", "down", "outside"}
    # high/low bound open/close on every candle
    bad = day.where(
        (F.col("high") < F.greatest("open", "close"))
        | (F.col("low") > F.least("open", "close"))
    ).count()
    assert bad == 0


def test_live_stocks_pipeline_matches_batch_classify(spark, tmp_path):
    """The two-stage LIVE pipeline reproduces the oracle-checked
    batch strat_classify exactly, minus each key's final candle
    (append-mode watermark cannot finalize the last window of a
    bounded replay; on a real stream the next tick closes it)."""
    from examples.stocks_streaming import main as _unused  # noqa: F401
    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.queries._util import t
    from rstreams_spark.streaming import stateful
    from rstreams_spark.streaming import windows as swindows

    ticks_dir = tmp_path / "ticks"
    (
        t(spark, SF_SMOKE, "events")
        .select("event_id", "ts", F.col("event_type").alias("sym"), "value")
        .write.json(str(ticks_dir))
    )
    ticks = spark.readStream.schema(
        "event_id bigint, ts timestamp, sym string, value double"
    ).json(str(ticks_dir))
    candles = swindows.stream_tumbling_window(
        ticks, "sym", "ts", "1 day",
        F.min_by("value", F.struct("ts", "event_id")).alias("open"),
        F.max_by("value", F.struct("ts", "event_id")).alias("close"),
        watermark="0 seconds",
    )
    from rstreams_spark.sinks import writers as w

    q1 = w.stream_to_parquet(
        candles, str(tmp_path / "candles"), str(tmp_path / "ck1")
    )
    q1.processAllAvailable()
    q1.stop()
    candle_stream = spark.readStream.schema(
        "sym string, window_start timestamp, window_end timestamp, "
        "open double, close double"
    ).parquet(str(tmp_path / "candles"))
    classified = stateful.stream_strat_classify(
        candle_stream, "sym", "window_start"
    )
    q2 = w.stream_to_memory(classified, "parity_strat", "append")
    q2.processAllAvailable()
    q2.stop()
    live = {
        (r["sym"], int(r["window_start"].timestamp()), r["strat_class"], r["color"])
        for r in spark.sql("select * from parity_strat").collect()
    }

    batch_rows = REGISTRY["strat_classify"](spark, SF_SMOKE).collect()
    last_per_key = {}
    for r in batch_rows:
        last_per_key[r["event_type"]] = max(
            last_per_key.get(r["event_type"], 0), r["window_start_epoch"]
        )
    batch = {
        (r["event_type"], r["window_start_epoch"], r["strat_class"], r["color"])
        for r in batch_rows
        if r["window_start_epoch"] < last_per_key[r["event_type"]]
    }
    assert live == batch


def test_llm_corpus_pipeline_monotone_funnel(spark):
    """The curation funnel only ever narrows the doc set, the
    verified near-dup stage actually removes something on the
    synthetic corpus (it contains planted near-dups), and survivors
    still produce chunks."""
    from examples.llm_corpus_pipeline import run

    c = run(spark, SF_SMOKE)
    assert c["raw"] >= c["after_exact"] >= c["after_near_dup"] > 0
    assert c["after_near_dup"] < c["raw"]  # planted dups were caught
    # decontamination can only narrow further (eval shard + 3-gram
    # overlap with it are both excluded), and packing bins every
    # surviving doc
    assert c["after_near_dup"] >= c["after_decontam"] > 0
    assert c["bins"] > 0
    assert c["chunks"] > 0


def test_streaming_candles_match_batch(spark, tmp_path):
    """The streaming window agg over the same ticks produces the
    batch candle table (complete mode, watermark irrelevant once all
    data is processed)."""
    ticks = t(spark, SF_SMOKE, "events")
    batch = candles(ticks, "event_type", "ts", "value", "1 day")

    # stream the same rows through a file source
    src = tmp_path / "ticks"
    ticks.select("event_id", "ts", "event_type", "value").write.json(str(src))
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, event_type string, value double"
    ).json(str(src))
    s_out = swindows.stream_tumbling_window(
        stream, "event_type", "ts", "1 day",
        F.min_by("value", F.struct("ts", "event_id")).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.struct("ts", "event_id")).alias("close"),
        F.count("*").alias("volume"),
        watermark="0 seconds",
    )
    q = writers.stream_to_memory(s_out, "stream_candles", "complete")
    q.processAllAvailable()
    q.stop()

    def key(rows):
        return {
            (r["event_type"], r["window_start"]): (
                r["open"], r["high"], r["low"], r["close"], r["volume"]
            )
            for r in rows
        }

    got = key(spark.sql("select * from stream_candles").collect())
    want = key(batch.collect())
    assert got == want

"""Window operator semantics, mirroring the reference's test vectors
(reference src/window.rs mod test)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from rstreams_spark.operators import windows

EPOCH = dt.datetime(2024, 1, 1)


def _events(spark, ts_seconds, key="key"):
    return spark.createDataFrame(
        [Row(key=key, ts=EPOCH + dt.timedelta(seconds=s), v=s) for s in ts_seconds]
    )


# the reference's hopping/tumbling vector (src/window.rs:232-247),
# seconds instead of millis
VECTOR = [0, 1, 3, 4, 6, 6, 8, 8, 8, 9, 10, 11, 11, 13, 14, 20]


def _contents(df):
    out = {}
    for r in df.collect():
        out[int(r["window_start"].timestamp() - EPOCH.timestamp())] = r["vals"]
    return out


def test_tumbling_matches_reference_vector(spark):
    df = _events(spark, VECTOR)
    got = windows.tumbling_window(
        df, "key", "ts", "3 seconds", F.sort_array(F.collect_list("v")).alias("vals")
    )
    # reference tumbling_as_hopping (src/window.rs:219-261): windows of
    # 3 starting at 0 → contents per window (no gap-fill emissions)
    assert _contents(got) == {
        0: [0, 1], 3: [3, 4], 6: [6, 6, 8, 8, 8], 9: [9, 10, 11, 11],
        12: [13, 14], 18: [20],
    }


def test_tumbling_gap_fill_emits_empty_windows(spark):
    """Reference src/window.rs:71-84: silent gaps between a key's
    windows yield empty emissions. VECTOR has a gap at window 15."""
    df = _events(spark, VECTOR)
    got = windows.tumbling_window(
        df, "key", "ts", "3 seconds",
        F.count("*").alias("n"), gap_fill=True,
    )
    rows = {
        int(r["window_start"].timestamp() - EPOCH.timestamp()): r["n"]
        for r in got.collect()
    }
    assert rows == {0: 2, 3: 2, 6: 5, 9: 4, 12: 2, 15: None, 18: 1}
    # window_end is filled on gap rows too
    assert all(r["window_end"] is not None for r in got.collect())


def test_hopping_matches_reference_vector(spark):
    df = _events(spark, VECTOR)
    got = windows.hopping_window(
        df, "key", "ts", "3 seconds", "1 second",
        F.sort_array(F.collect_list("v")).alias("vals"),
    )
    # reference hopping test (src/window.rs:263-343) — every non-empty
    # window [s, s+3) stepping by 1; the reference also emits empty
    # gap windows (15,16,17), which carry no rows by construction
    expect = {
        -2: [0], -1: [0, 1], 0: [0, 1], 1: [1, 3], 2: [3, 4], 3: [3, 4],
        4: [4, 6, 6], 5: [6, 6], 6: [6, 6, 8, 8, 8], 7: [8, 8, 8, 9],
        8: [8, 8, 8, 9, 10], 9: [9, 10, 11, 11], 10: [10, 11, 11],
        11: [11, 11, 13], 12: [13, 14], 13: [13, 14], 14: [14],
        18: [20], 19: [20], 20: [20],
    }
    assert _contents(got) == expect


def test_hopping_gap_fill_emits_empty_hops(spark):
    """Reference src/window.rs:147-163: hops whose window holds no
    events are still emitted. With size=3 hop=1 over VECTOR, the
    silent stretch between 14 and 20 leaves hops 15,16,17 empty."""
    df = _events(spark, VECTOR)
    got = windows.hopping_window(
        df, "key", "ts", "3 seconds", "1 second",
        F.count("*").alias("n"), gap_fill=True,
    )
    rows = {
        int(r["window_start"].timestamp() - EPOCH.timestamp()): r["n"]
        for r in got.collect()
    }
    assert sorted(rows) == list(range(-2, 21))  # full hop grid
    assert {s for s, n in rows.items() if n is None} == {15, 16, 17}


def test_hopping_windows_per_event_count(spark):
    # every event lands in exactly size/hop windows
    df = _events(spark, VECTOR)
    got = windows.hopping_window(
        df, "key", "ts", "4 seconds", "2 seconds", F.count("*").alias("n")
    )
    total = got.agg(F.sum("n")).collect()[0][0]
    assert total == len(VECTOR) * 2


def test_session_window_gap_merge(spark):
    # events 0,1,2 chain within 3s gaps; 10 starts a new session
    df = _events(spark, [0, 1, 2, 10, 11], key="a")
    got = windows.session_window(
        df, "key", "ts", "3 seconds", F.sort_array(F.collect_list("v")).alias("vals")
    )
    out = {
        int(r["session_start"].timestamp() - EPOCH.timestamp()): r["vals"]
        for r in got.collect()
    }
    assert out == {0: [0, 1, 2], 10: [10, 11]}


def test_lag_window_emits_once_full(spark):
    # reference lag_window (src/window.rs:9-40): per-key buffer of N,
    # emits for every event once the key has N values, sliding by one
    df = _events(spark, [1, 2, 3, 4], key="a").unionByName(
        _events(spark, [10], key="b")
    )
    got = windows.lag_window(df, "key", "ts", 3, ["v"])
    rows = sorted(
        (r["key"], [x["v"] for x in r["values"]]) for r in got.collect()
    )
    assert rows == [("a", [1, 2, 3]), ("a", [2, 3, 4])]  # b never fills


def test_rollup_candles_equals_direct(spark):
    # the lattice strategy must be lossless: ticks→1s→3s == ticks→3s
    ticks = _events(spark, VECTOR).withColumn("event_id", F.col("v"))
    def direct(size):
        order = F.struct("ts", "event_id")
        return windows.tumbling_window(
            ticks, "key", "ts", size,
            F.min_by("v", order).alias("open"), F.max("v").alias("high"),
            F.min("v").alias("low"), F.max_by("v", order).alias("close"),
            F.sum("v").alias("volume"), F.count("*").alias("n_trades"),
        )
    rolled = windows.rollup_candles(direct("1 second"), "key", "3 seconds")
    def key(df):
        return {
            (r["key"], r["window_start"]): (
                r["open"], r["high"], r["low"], r["close"], r["volume"], r["n_trades"]
            ) for r in df.collect()
        }
    assert key(rolled) == key(direct("3 seconds"))


def test_session_window_gap_boundary_is_inclusive(spark):
    """An event landing EXACTLY gap after the previous one extends
    the session (probed Spark 4 behavior; its docs suggest a strict
    bound) — and the DuckDB oracle's lag-cumsum construction must
    split only strictly beyond the gap. Continuous timestamps never
    hit this; a quantized-timestamp corpus did (r6)."""
    import duckdb

    from pyspark.sql import functions as F

    from rstreams_spark.operators import windows as W

    df = spark.createDataFrame(
        [("u", "2020-01-01 00:00:00", 1.0),
         ("u", "2020-01-01 01:00:00", 2.0),   # exactly gap later: merge
         ("u", "2020-01-01 02:00:01", 3.0)],  # 1s beyond gap: split
        "user_id string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = W.session_window(df, "user_id", "ts", "1 hour",
                           F.count("*").alias("n"))
    assert sorted(r["n"] for r in out.collect()) == [1, 2]
    oracle_sessions = duckdb.sql("""
        with e(ts) as (values (timestamp '2020-01-01 00:00:00'),
                              (timestamp '2020-01-01 01:00:00'),
                              (timestamp '2020-01-01 02:00:01')),
        marked as (
          select ts, case when lag(ts) over (order by ts) is null
                            or ts > lag(ts) over (order by ts)
                               + interval 1 hour
                          then 1 else 0 end as ns from e)
        select count(*) filter (ns = 1) from marked
    """).fetchone()[0]
    assert oracle_sessions == 2

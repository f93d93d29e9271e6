"""Join semantics vs the reference's test vectors (src/join.rs mod test)."""

import datetime as dt

from pyspark.sql import Row

from rstreams_spark.operators import joins, table

EPOCH = dt.datetime(2024, 1, 1)


def _stream(spark, rows):
    return spark.createDataFrame(
        [
            Row(key=k, ts=EPOCH + dt.timedelta(seconds=s), v=s)
            for k, s in rows
        ]
    )


def test_interval_join_confluent_vector(spark):
    # reference test_inner_join (src/join.rs:160-206): the Confluent
    # blog example — same key, |Δt| < 10 (strict)
    left = _stream(
        spark, [("a", 0), ("b", 1), ("c", 3), ("d", 4), ("f", 6), ("f", 6), ("g", 8)]
    )
    right = _stream(
        spark, [("a", 1), ("c", 2), ("e", 5), ("f", 7), ("g", 9), ("g", 9), ("b", 11)]
    )
    got = joins.interval_join(left, right, "key", "key", "ts", "ts", "10 seconds")
    pairs = sorted((r["key"], r["v"], r["r_v"]) for r in got.collect())
    # (b, 1, 11) excluded: |1-11| = 10 is not strictly within 10s
    assert pairs == [
        ("a", 0, 1), ("c", 3, 2),
        ("f", 6, 7), ("f", 6, 7), ("g", 8, 9), ("g", 8, 9),
    ]


def test_interval_join_strict_bound(spark):
    left = _stream(spark, [("k", 0)])
    right = _stream(spark, [("k", 10), ("k", 9)])
    got = joins.interval_join(left, right, "key", "key", "ts", "ts", "10 seconds")
    # |0-10| = 10 is excluded (strict <, reference within_window
    # src/lib.rs:38-41); |0-9| = 9 is included
    assert [r["r_v"] for r in got.collect()] == [9]


def test_stream_table_join_latest_value(spark):
    # reference join_stream_table (src/join.rs:142-156): each stream
    # record sees the table's latest value for its key, None on miss
    changelog = _stream(spark, [("a", 1), ("a", 5), ("b", 2)])
    tbl = table.latest_per_key(changelog, "key", "ts")
    stream = _stream(spark, [("a", 10), ("b", 11), ("z", 12)]).select(
        "key", "ts", "v"
    )
    got = joins.stream_table_join(
        stream, "key", tbl.select("key", tbl["v"].alias("tv")), "key"
    )
    vals = {r["v"]: r["tv"] for r in got.collect()}
    assert vals == {10: 5, 11: 2, 12: None}


def test_asof_join(spark):
    left = _stream(spark, [("k", 5), ("k", 12), ("k", 3)])
    right = _stream(spark, [("k", 4), ("k", 10), ("k", 20)]).withColumnRenamed("v", "rv")
    got = joins.asof_join(left, right, "key", "ts", "ts", ["rv"])
    vals = {r["v"]: r["r_rv"] for r in got.collect()}
    # each left ts matched to latest right at-or-before
    assert vals == {3: None, 5: 4, 12: 10}


def test_asof_join_tolerance(spark):
    left = _stream(spark, [("k", 5), ("k", 30)])
    right = _stream(spark, [("k", 4)]).withColumnRenamed("v", "rv")
    got = joins.asof_join(
        left, right, "key", "ts", "ts", ["rv"], tolerance="10 seconds"
    )
    vals = {r["v"]: r["r_rv"] for r in got.collect()}
    assert vals == {5: 4, 30: None}  # 30-4 > 10s tolerance


def test_asof_join_right_tiebreaker_deterministic(spark):
    """Two right rows at the same (key, ts): the highest tiebreaker
    wins, mirroring latest_per_key (ADVICE: without an explicit
    tiebreaker the picked row is undefined)."""
    left = _stream(spark, [("k", 5)])
    right = spark.createDataFrame(
        [
            Row(key="k", ts=EPOCH + dt.timedelta(seconds=4), rv=100, seq=1),
            Row(key="k", ts=EPOCH + dt.timedelta(seconds=4), rv=200, seq=2),
        ]
    )
    got = joins.asof_join(
        left, right, "key", "ts", "ts", ["rv"], right_tiebreakers=["seq"]
    )
    assert [r["r_rv"] for r in got.collect()] == [200]


def test_interval_join_rename_never_collides(spark):
    """Left already owns r_v: disambiguation must keep prefixing
    until unique instead of emitting duplicate column names."""
    left = _stream(spark, [("a", 0)]).selectExpr("key", "ts", "v", "v * 10 as r_v")
    right = _stream(spark, [("a", 1)]).selectExpr("key", "ts", "v", "v * 0 as r_v")
    got = joins.interval_join(left, right, "key", "key", "ts", "ts", "10 seconds")
    assert len(got.columns) == len(set(got.columns))  # all names unique
    assert got.count() == 1


def test_range_join_rejects_range_duplicating_how(spark):
    import pytest

    from pyspark.sql import Row as R

    points = spark.createDataFrame([R(x=1.0)])
    ranges = spark.createDataFrame([R(lo=0.0, hi=10.0)])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="range_join supports"):
            joins.range_join(points, "x", ranges, "lo", "hi", 4.0, how=how)


def test_range_join_grid_bucketing(spark):
    from pyspark.sql import Row as R

    points = spark.createDataFrame([R(pid=i, x=float(i)) for i in range(20)])
    ranges = spark.createDataFrame(
        [R(rid=1, lo=2.0, hi=5.0), R(rid=2, lo=4.0, hi=12.0), R(rid=3, lo=18.0, hi=30.0)]
    )
    got = joins.range_join(points, "x", ranges, "lo", "hi", cell_width=4.0)
    pairs = sorted((r["pid"], r["rid"]) for r in got.collect())
    expect = sorted(
        (p, rid)
        for p in range(20)
        for rid, lo, hi in [(1, 2, 5), (2, 4, 12), (3, 18, 30)]
        if lo <= p <= hi
    )
    assert pairs == expect


def test_range_join_plans_as_hash_join(spark):
    from pyspark.sql import Row as R

    from rstreams_spark import plans

    points = spark.createDataFrame([R(x=float(i)) for i in range(100)])
    ranges = spark.createDataFrame([R(rid=i, lo=float(i), hi=float(i + 5)) for i in range(50)])
    joined = joins.range_join(points, "x", ranges, "lo", "hi", cell_width=8.0)
    # the whole point: equi-join on the grid cell, not a nested loop
    txt = plans.explain_str(joined)
    assert "NestedLoop" not in txt

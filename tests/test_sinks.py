"""Sink round-trips: partitioned parquet write → pruned read."""

from pyspark.sql import functions as F

from rstreams_spark import plans
from rstreams_spark.queries._util import t
from rstreams_spark.sinks import writers

from conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = t(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_type")
    writers.write_parquet(ev, out, partition_by=["event_type"])

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    pruned = back.where(F.col("event_type") == "purchase")
    txt = plans.explain_str(pruned)
    # partition filter reaches the scan: only the purchase directory read
    assert "PartitionFilters" in txt and "purchase" in txt
    got = pruned.count()
    want = ev.where(F.col("event_type") == "purchase").count()
    assert got == want


def test_stream_to_parquet_roundtrip(spark, tmp_path):
    import datetime as dt
    import json as j

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(5):
            ts = (dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)).strftime(
                "%Y-%m-%dT%H:%M:%S"
            )
            f.write(j.dumps({"key": "k", "ts": ts, "v": float(i)}) + "\n")
    stream = (
        spark.readStream.schema("key string, ts timestamp, v double")
        .json(str(src))
    )
    sink = str(tmp_path / "sink")
    q = writers.stream_to_parquet(stream, sink, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(sink).count() == 5


def test_compact_parquet_reduces_files(spark, tmp_path):
    from rstreams_spark.sinks.writers import compact_parquet

    path = str(tmp_path / "many")
    spark.range(10_000).repartition(20).write.parquet(path)
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 20
    n = compact_parquet(spark, path, target_file_mb=512)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert n == 1 and after == 1
    assert spark.read.parquet(path).count() == 10_000


def test_orc_roundtrip_pushes_filters(spark, tmp_path):
    """ORC write → read round-trip preserves rows and pushes filters
    to the scan, same contract as parquet."""
    from rstreams_spark.sources import files

    orders = t(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders_orc")
    writers.write_orc(orders, out)
    back = files.read_orc(spark, out)
    assert back.count() == orders.count()
    filtered = back.where(F.col("o_totalprice") > 1000.0)
    # a non-empty pushed filter naming the column — the bare
    # "PushedFilters" substring appears in every scan explain (even
    # as "PushedFilters: []") and would make this assertion vacuous
    assert any("o_totalprice" in p for p in plans.pushed_filters(filtered))
    assert filtered.count() == orders.where("o_totalprice > 1000.0").count()


def test_text_lines_source_wordcount(spark, tmp_path):
    """Raw text source (shakespeare_loader shape): one row per line,
    downstream wordcount equals a Python count."""
    from collections import Counter

    from rstreams_spark.sources import files

    lines = ["to be or not to be", "that is the question", ""]
    p = tmp_path / "play.txt"
    p.write_text("\n".join(lines) + "\n")
    df = files.read_text_lines(spark, str(p))
    words = df.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("line")), " "), lambda x: x != F.lit(""))
        ).alias("w")
    )
    got = {r["w"]: r["n"] for r in words.groupBy("w").agg(F.count("*").alias("n")).collect()}
    want = Counter(w for line in lines for w in line.lower().split() if w)
    assert got == dict(want)

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

"""Late & disordered event delivery across microbatches — the
STREAMING counterpart of the batch probe matrix (VERDICT r7 item 7).

The 22 batch probe classes feed each engine the same static corpus;
these tests instead drive watermark-late rows and cross-microbatch
disorder through the stateful operators where state actually DROPS
rows, pinning each operator's documented late-data contract:

- watermarked window aggs: in-watermark disorder aggregates exactly
  (batch parity); beyond-watermark rows are dropped and an
  already-emitted window is never re-emitted or mutated (append).
- session windows: late rows that bridge two open sessions MERGE them
  (engine-managed state merge), disorder included.
- dropDuplicatesWithinWatermark dedup: a late dup inside the horizon
  is dropped; after the watermark evicts its fingerprint the same
  content is readmitted — the documented state-bounding trade.
- gapfill (custom applyInPandasWithState): a row older than the open
  window index is dropped (the watermarked-agg late contract), while
  disorder INTO the open window still accumulates.

Each microbatch is one file + processAllAvailable, so batch
boundaries (and therefore watermark advancement) are deterministic.
"""

import datetime as dt
import json

from pyspark.sql import functions as F

from rstreams_spark.sinks import writers
from rstreams_spark.sources import files
from rstreams_spark.streaming import dedup as sdedup, windows as swindows

EPOCH = dt.datetime(2024, 1, 1)
SCHEMA = "key string, ts timestamp, v double"
DOC_SCHEMA = "doc_id long, ts timestamp, text string"


def _ts(sec: int) -> str:
    return (EPOCH + dt.timedelta(seconds=sec)).strftime("%Y-%m-%dT%H:%M:%S")


def _append_kv(src, name, rows):
    with open(src / name, "w") as f:
        for k, s, v in rows:
            f.write(json.dumps({"key": k, "ts": _ts(s), "v": float(v)}) + "\n")


def _append_docs(src, name, rows):
    with open(src / name, "w") as f:
        for i, s, text in rows:
            f.write(json.dumps({"doc_id": i, "ts": _ts(s), "text": text}) + "\n")


def test_tumbling_disorder_within_watermark_matches_batch(spark, tmp_path):
    """Cross-batch disorder INSIDE the watermark: batch 2 delivers
    rows older than batch 1's, the final aggregate is exactly the
    batch groupBy of the union — nothing dropped, nothing doubled."""
    src = tmp_path / "dis1"
    src.mkdir()
    _append_kv(src, "b0.json", [("a", 0, 1), ("a", 7, 8), ("b", 0, 5)])
    stream = files.stream_files(spark, str(src), "json", SCHEMA)
    out = swindows.stream_tumbling_window(
        stream, "key", "ts", "3 seconds",
        F.sum("v").alias("s"), watermark="1 hour",
    )
    q = writers.stream_to_memory(out, "dis1_out", "complete")
    q.processAllAvailable()
    # older timestamps arrive AFTER newer ones, in a later microbatch
    _append_kv(src, "b1.json", [("a", 1, 2), ("a", 3, 4), ("b", 2, 7)])
    q.processAllAvailable()
    q.stop()
    got = {
        (r["key"], int(r["window_start"].timestamp() - EPOCH.timestamp())): r["s"]
        for r in spark.sql("select * from dis1_out").collect()
    }
    assert got == {("a", 0): 3.0, ("a", 3): 4.0, ("a", 6): 8.0, ("b", 0): 12.0}


def test_tumbling_append_drops_beyond_watermark(spark, tmp_path):
    """A row older than the watermark is DROPPED and an emitted
    window is never re-opened: the [0,10) window emits with the
    on-time sum; the late v=50 row for it vanishes (no new row, no
    mutation); in-watermark rows keep aggregating."""
    src = tmp_path / "late1"
    src.mkdir()
    stream = files.stream_files(spark, str(src), "json", SCHEMA)
    out = swindows.stream_tumbling_window(
        stream, "key", "ts", "10 seconds",
        F.sum("v").alias("s"), watermark="5 seconds",
    )
    q = writers.stream_to_memory(out, "late1_out", "append")
    # batch 1: [0,10) gets 1+2; t=100 advances the watermark to 95
    _append_kv(src, "b0.json", [("a", 5, 1), ("a", 8, 2), ("a", 100, 9)])
    q.processAllAvailable()
    # batch 2: t=3 is far beyond the watermark (95) -> dropped;
    # t=101 lands in the open [100,110) window. [0,10) emits here.
    _append_kv(src, "b1.json", [("a", 3, 50), ("a", 101, 1)])
    q.processAllAvailable()
    # batch 3 advances the watermark to 195; batch 4 triggers the
    # [100,110) emission under it (emission uses the PREVIOUS
    # batch's closing watermark)
    _append_kv(src, "b2.json", [("a", 200, 7)])
    q.processAllAvailable()
    _append_kv(src, "b3.json", [("a", 300, 7)])
    q.processAllAvailable()
    q.stop()
    got = {
        int(r["window_start"].timestamp() - EPOCH.timestamp()): r["s"]
        for r in spark.sql("select * from late1_out").collect()
    }
    # [0,10) excludes the late 50; [100,110) includes the disordered
    # but in-watermark 101; [200,210) finalizes under the t=300
    # batch's watermark (295) — processAllAvailable runs the no-data
    # finalizing batch; [300,310) stays pending (wm 295 < 310)
    assert got == {0: 3.0, 100: 10.0, 200: 7.0}


def test_session_window_merges_disordered_bridge_rows(spark, tmp_path):
    """A late-but-in-watermark row that lands BETWEEN two open
    sessions bridges them: the engine merges session state across
    microbatches (gap 5s; 0 & 8 are separate until 4 arrives)."""
    src = tmp_path / "sess_dis"
    src.mkdir()
    stream = files.stream_files(spark, str(src), "json", SCHEMA)
    out = swindows.stream_session_window(
        stream, "key", "ts", "5 seconds",
        F.count("v").alias("n"), F.sum("v").alias("s"),
        watermark="1 hour",
    )
    q = writers.stream_to_memory(out, "sess_dis_out", "complete")
    _append_kv(src, "b0.json", [("a", 0, 1), ("a", 8, 2), ("a", 30, 3)])
    q.processAllAvailable()
    # 4 bridges [0,5) and [8,13) into one session; 23 extends nothing
    _append_kv(src, "b1.json", [("a", 4, 10), ("a", 23, 4)])
    q.processAllAvailable()
    q.stop()
    got = {
        (
            int(r["session_start"].timestamp() - EPOCH.timestamp()),
            int(r["session_end"].timestamp() - EPOCH.timestamp()),
        ): (r["n"], r["s"])
        for r in spark.sql("select * from sess_dis_out").collect()
    }
    assert got == {(0, 13): (3, 13.0), (23, 28): (1, 4.0), (30, 35): (1, 3.0)}


def test_dedup_late_dup_dropped_then_readmitted_after_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract end-to-end: a dup
    arriving late-but-within-horizon is dropped; once the watermark
    evicts the fingerprint, identical content is readmitted — the
    documented (distinct per horizon) state bound, not (all ever)."""
    src = tmp_path / "ddup"
    src.mkdir()
    stream = files.stream_files(spark, str(src), "json", DOC_SCHEMA)
    out = sdedup.stream_dedup_exact(stream, "text", "ts", horizon="10 seconds")
    q = writers.stream_to_memory(out, "ddup_out", "append")
    _append_kv_docs = _append_docs
    _append_kv_docs(src, "b0.json", [(1, 0, "hello world"), (2, 5, "fresh doc")])
    q.processAllAvailable()
    # disordered dup (ts older than doc 2) within the horizon: dropped
    _append_kv_docs(src, "b1.json", [(3, 4, "hello world")])
    q.processAllAvailable()
    # advance the watermark far past every stored fingerprint's expiry
    _append_kv_docs(src, "b2.json", [(4, 100, "later doc")])
    q.processAllAvailable()
    # same content after eviction: readmitted as new
    _append_kv_docs(src, "b3.json", [(5, 120, "hello world")])
    q.processAllAvailable()
    q.stop()
    got = sorted(r["doc_id"] for r in spark.sql("select * from ddup_out").collect())
    assert got == [1, 2, 4, 5]


def test_gapfill_drops_rows_behind_open_window(spark, tmp_path):
    """Custom stateful gapfill: disorder INTO the open window still
    accumulates; a row behind the open window index is dropped (the
    watermarked-agg late contract the docstring pins)."""
    src = tmp_path / "gfdis"
    src.mkdir()
    stream = files.stream_files(spark, str(src), "json", SCHEMA)
    out = swindows.stream_tumbling_window_gapfill(stream, "key", "ts", 10, "v")
    q = writers.stream_to_memory(out, "gfdis_out", "append")
    # w0 gets v=1; t=25 flushes w0, gap-fills w1, opens w2
    _append_kv(src, "b0.json", [("a", 5, 1), ("a", 25, 2)])
    q.processAllAvailable()
    # t=7 is behind the open w2 -> dropped; t=26 joins open w2;
    # t=45 flushes w2 (2+3), gap-fills w3, opens w4
    _append_kv(src, "b1.json", [("a", 7, 100), ("a", 26, 3), ("a", 45, 4)])
    q.processAllAvailable()
    q.stop()
    got = {
        int(r["window_start"].timestamp() - EPOCH.timestamp()):
            (r["n"], r["sum_value"])
        for r in spark.sql("select * from gfdis_out").collect()
    }
    # w4 (t=45) still open -> unemitted; the late 100 appears nowhere
    assert got == {0: (1, 1.0), 10: (0, 0.0), 20: (2, 5.0), 30: (0, 0.0)}


def test_concat_time_ordered_contract():
    """The shared chunk-assembly helper (invariant 7): multi-chunk
    disorder is concatenated THEN ordered; a monotonic batch passes
    through un-copied; empty input yields an empty frame."""
    import pandas as pd

    from rstreams_spark.streaming._chunks import concat_time_ordered

    a = pd.DataFrame({"ts": [5, 7], "v": [1.0, 2.0]})
    b = pd.DataFrame({"ts": [3, 6], "v": [3.0, 4.0]})
    got = concat_time_ordered([a, b], "ts")
    assert got["ts"].tolist() == [3, 5, 6, 7]
    assert got["v"].tolist() == [3.0, 1.0, 4.0, 2.0]
    mono = pd.DataFrame({"ts": [1, 2, 2, 9], "v": [0.0, 1.0, 2.0, 3.0]})
    out = concat_time_ordered([mono], "ts")
    assert out is mono  # single monotonic chunk: no copy, no reorder
    assert len(concat_time_ordered([], "ts")) == 0

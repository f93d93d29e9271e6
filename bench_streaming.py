"""Streaming throughput bench (repeatable; promoted from PERF.md).

Rate source → 100-key watermarked 1 s tumbling aggregation → noop
sink. Reports sustained processed rows/s computed from the engine's
own progress metrics (Σ inputRows / Σ trigger wall time), the same
pipeline PERF.md's 1.6 M rows/s figure came from.

Standalone: prints ONE JSON line. Also importable — ``measure()`` is
embedded in bench.py's round artifact so rounds are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# offered must exceed engine capacity or the measurement reports the
# source rate, not the engine (2M offered read "2M/s" when the real
# sustained figure is ~9M/s on local[32])
OFFERED_ROWS_PER_SEC = 8_000_000
MIN_BATCHES = 4       # ≥1 cold (excluded) + ≥3 warm
MAX_WAIT_SECONDS = 45.0
# median-of-N: this host's noise bands swung the recorded stateful
# number 4× across identical-code runs (996k → 326k in BENCH_r04
# while same-session clean runs logged 1.15-1.35M) — per CLAUDE.md's
# own confirm-across-two-runs rule, a single draw must never be the
# round artifact
REPEATS = 3


def _run_stream(writer_df, ckpt_prefix: str, min_batches: int,
                max_wait: float) -> tuple[float, int, int]:
    """Start → wait for min_batches → stop; returns (warm rows/s,
    batches, total rows). Cold first batch excluded (codegen +
    state-store init)."""
    return _run_writer(
        writer_df.writeStream.format("noop").outputMode("append"),
        ckpt_prefix, min_batches, max_wait,
    )


def _run_writer(writer, ckpt_prefix: str, min_batches: int,
                max_wait: float) -> tuple[float, int, int]:
    """Same contract as ``_run_stream`` for a prepared
    ``DataStreamWriter`` (the foreachBatch gate benches build their
    own writer)."""
    import shutil
    import tempfile

    # fresh dir per run: a fixed/pid-keyed path could resume a stale
    # checkpoint (pid reuse) and poison the measurement
    ckpt = tempfile.mkdtemp(prefix=ckpt_prefix)
    q = writer.option("checkpointLocation", ckpt).start()
    try:
        # batch-count-driven, not wall-clock: after a loaded session a
        # fixed window can catch only the cold batch and report 0
        deadline = time.perf_counter() + max_wait
        while (
            len([p for p in q.recentProgress if p is not None]) < min_batches
            and time.perf_counter() < deadline
        ):
            time.sleep(0.25)
        progresses = [p for p in q.recentProgress if p is not None]
    finally:
        q.stop()
        try:  # drain the stream thread before deleting its state dir —
            # rmtree under a live HDFSBackedStateStore is the abort-stack
            # noise that drowned r02's bench JSON
            q.awaitTermination(30)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
    rows = sum(p["numInputRows"] for p in progresses)
    busy_ms = sum(
        p["durationMs"]["triggerExecution"] for p in progresses[1:]
    )
    warm_rows = sum(p["numInputRows"] for p in progresses[1:])
    rate = (warm_rows / (busy_ms / 1000.0)) if busy_ms else 0.0
    return rate, len(progresses), rows


def _median_run(results: list[tuple[float, int, int]]) -> tuple[float, int, int]:
    """The actual run with the median rate (lower-middle for even
    counts) — every reported field then describes ONE run, keeping
    total_rows/batches comparable with pre-r5 single-run history
    entries (summing rows across repeats next to a last-run batch
    count mixed accounting bases)."""
    return sorted(results, key=lambda r: r[0])[(len(results) - 1) // 2]


def _collapsed(results: list[tuple[float, int, int]]) -> bool:
    """True when the run set cannot yield a warm rate: the median run
    has rate 0, i.e. most runs never completed 2 batches. With the
    plain ``rate`` source this is the backlog balloon (r02, re-hit
    r12): offered > capacity makes every batch swallow the accumulated
    lag, so on a degraded host batch 2 grows to 100 M+ rows and the
    wait window only ever sees the cold batch — the engine is
    processing millions of rows/s but the measurement reads 0."""
    return _median_run(results)[0] == 0


def measure(spark, offered: int = OFFERED_ROWS_PER_SEC,
            min_batches: int = MIN_BATCHES,
            max_wait: float = MAX_WAIT_SECONDS,
            repeats: int = REPEATS) -> dict:
    from pyspark.sql import functions as F

    from rstreams_spark.sources.files import (
        stream_rate, stream_rate_micro_batch,
    )
    from rstreams_spark.streaming.windows import stream_tumbling_window

    def pipeline(src):
        keyed = src.withColumn("key", (F.col("value") % 100).cast("long"))
        return stream_tumbling_window(
            keyed, "key", "timestamp", "1 second",
            F.count("*").alias("n"), F.avg("value").alias("avg_v"),
            watermark="2 seconds",
        )

    agg = pipeline(stream_rate(spark, offered))
    results = [
        _run_stream(agg, "bench_stream_ckpt_", min_batches, max_wait)
        for _ in range(repeats)
    ]
    out = {
        "offered_rows_per_sec": offered,
        "runs": [round(r[0]) for r in results],
        "run_batches": [r[1] for r in results],
    }
    if _collapsed(results):
        # measurement-bug fallback (r12, documented in
        # OPTIMIZATION_r12.md): re-measure through the SAME pipeline
        # fed by rate-micro-batch at `offered` rows per batch — fixed
        # batch sizes cannot balloon, so warm batches complete and the
        # rate computation (warm rows / trigger-busy seconds) is
        # unchanged. The plain-rate zeros stay visible in `runs`;
        # the flag marks the artifact as fallback-sourced so rounds
        # stay comparable.
        agg_mb = pipeline(
            stream_rate_micro_batch(spark, offered, num_partitions=8)
        )
        results = [
            _run_stream(agg_mb, "bench_stream_ckpt_mb_",
                        min_batches, max_wait)
            for _ in range(repeats)
        ]
        out["stateless_fallback"] = "rate-micro-batch"
        out["runs"] = out["runs"] + [round(r[0]) for r in results]
        out["run_batches"] = out["run_batches"] + [r[1] for r in results]
    med = _median_run(results)
    out["processed_rows_per_sec"] = round(med[0])
    out["total_rows"] = med[2]
    out["batches"] = med[1]
    return out


# Python/Arrow path; capacity ≪ JVM agg. 2M/batch amortizes per-trigger
# overhead (400k/batch reads 220k rows/s, 2M/batch the true ~700k) and
# still completes 4 batches in ~12 s — far inside MAX_WAIT_SECONDS.
STATEFUL_ROWS_PER_BATCH = 2_000_000


def measure_stateful(spark, rows_per_batch: int = STATEFUL_ROWS_PER_BATCH,
                     min_batches: int = MIN_BATCHES,
                     max_wait: float = MAX_WAIT_SECONDS,
                     repeats: int = REPEATS) -> dict:
    """Throughput of the Arrow-stateful path (applyInPandasWithState
    lag buffer over 100 keys) — the honest Python-side number to set
    against the JVM windowed-agg rate. The remaining ~6× gap is
    Arrow transfer + state round-trips (the per-row Python loop that
    used to cap this at ~0.8 M rows/s is gone — buffers are numpy
    sliding-window views now); operators that CAN be JVM
    aggregations should be (and in this engine are).

    Uses ``rate-micro-batch`` (fixed rows/batch), not ``rate``: with
    an offered rate above capacity the plain rate source's backlog
    balloons every batch (each trigger swallows the accumulated lag),
    so N batches never complete inside the wait window — which is
    exactly how r02's artifact lost its stateful number."""
    from pyspark.sql import functions as F

    from rstreams_spark.sources.files import stream_rate_micro_batch
    from rstreams_spark.streaming.stateful import stream_lag_window

    src = (
        stream_rate_micro_batch(spark, rows_per_batch, num_partitions=8)
        # native long key: the operator preserves key dtype now, and a
        # string key measured ~20% slower (string group-sort + Arrow)
        .withColumn("key", (F.col("value") % 100).cast("long"))
        .withColumn("v", F.col("value").cast("double"))
    )
    out = stream_lag_window(
        src.select("key", F.col("timestamp").alias("ts"), "v"),
        "key", "ts", 2, "v",
    )
    results = [
        _run_stream(out, "bench_stream_state_ckpt_", min_batches, max_wait)
        for _ in range(repeats)
    ]
    med = _median_run(results)
    return {
        "stateful_rows_per_batch": rows_per_batch,
        "stateful_processed_rows_per_sec": round(med[0]),
        "stateful_runs": [round(r[0]) for r in results],
        "stateful_run_batches": [r[1] for r in results],
        "stateful_batches": med[1],
    }


# Ingest near-dup gates (the 100 TB door): docs/vectors per second
# THROUGH the foreachBatch dedup gates while verifying against a
# materialized corpus index — parity-tested since r6/r7, rate-measured
# since r9 (VERDICT r8 item 6). Arrivals are a 50/50 mix of corpus
# duplicates (full candidate-join + verify load, all dropped) and
# novel synthetic docs/vectors (signature/assign load, all kept), so
# the measured rate pays both halves of the real ingest profile.
GATE_SF_DIR_DEFAULT = "/root/testdata/sf0.1"
GATE_DOCS_PER_BATCH = 50_000
GATE_VECS_PER_BATCH = 50_000


def _gate_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", GATE_SF_DIR_DEFAULT)


def _noop_sink(df, _epoch_id) -> None:
    df.write.format("noop").mode("overwrite").save()


def measure_dedup_gates(spark, sf_dir: str | None = None,
                        docs_per_batch: int = GATE_DOCS_PER_BATCH,
                        vecs_per_batch: int = GATE_VECS_PER_BATCH,
                        min_batches: int = MIN_BATCHES,
                        max_wait: float = 90.0,
                        repeats: int = REPEATS) -> dict:
    from pyspark.sql import functions as F

    from rstreams_spark.queries._util import t
    from rstreams_spark.sources.files import stream_rate_micro_batch
    from rstreams_spark.streaming.dedup import (
        embedding_index, minhash_index, minhash_index_fps,
        stream_dedup_embedding, stream_dedup_minhash,
    )

    sf = sf_dir or _gate_sf_dir()
    # cross-measurement hygiene: in the full bench this runs after
    # 4×30 headline passes whose dead checkpoint blocks would
    # otherwise stall the gates' per-trigger checkpoints (see
    # session.gc_hygiene — r11 root cause)
    from rstreams_spark.session import gc_hygiene

    gc_hygiene(spark)
    out: dict = {
        "gate_docs_per_batch": docs_per_batch,
        "gate_vecs_per_batch": vecs_per_batch,
    }

    # --- minhash (text) gate --------------------------------------
    # the lookup frame that synthesizes arrivals is harness
    # scaffolding — materialize it eagerly so each trigger measures
    # the GATE, not a per-trigger parquet re-scan of the corpus
    docs = t(spark, sf, "documents").select("doc_id", "text").localCheckpoint()
    n_docs = docs.count()
    index_bands, index_sets = minhash_index(docs)
    # the index is corpus state, not per-trigger work: materialize it
    # once (eager) so triggers measure gate throughput, like streaming
    # against the written index table at corpus scale
    index_bands = index_bands.localCheckpoint()
    index_sets = index_sets.localCheckpoint()
    # exact-copy pre-gate sidecar (r11): the production config — a
    # fingerprint-matched arrival skips the signature pipeline
    index_fps = minhash_index_fps(
        docs, index_bands=index_bands
    ).localCheckpoint()
    src = stream_rate_micro_batch(spark, docs_per_batch, num_partitions=8)
    novel = F.concat_ws(
        " ", *[
            F.md5(F.concat_ws("-", F.col("value").cast("string"), F.lit(str(k))))
            for k in range(16)
        ]
    )
    arriving = (
        src.withColumn("__src", F.col("value") % n_docs)
        .join(
            docs.select(F.col("doc_id").alias("__src"),
                        F.col("text").alias("__t")),
            "__src",
        )
        .select(
            F.col("value").alias("doc_id"),
            F.when(F.col("value") % 2 == 0, F.col("__t"))
             .otherwise(novel).alias("text"),
        )
    )
    writer = stream_dedup_minhash(
        arriving, index_bands, index_sets, _noop_sink, index_fps=index_fps
    )
    # one UNTIMED warm-up run before the timed repeats: the first
    # stream of a gate in a session pays one-time costs past batch 1
    # (codegen/JIT of the gate plan, Arrow kernel spin-up) that the
    # per-run cold-batch exclusion can't see — the r9 draws spread
    # 2.8k/13.8k/10.3k docs/s with draw 1 paying setup (VERDICT r9
    # item 3)
    _run_writer(writer, "bench_gate_minhash_warm_", min_batches, max_wait)
    results = [
        _run_writer(writer, "bench_gate_minhash_", min_batches, max_wait)
        for _ in range(repeats)
    ]
    med = _median_run(results)
    out["gate_minhash_docs_per_sec"] = round(med[0])
    out["gate_minhash_runs"] = [round(r[0]) for r in results]
    out["gate_minhash_batches"] = med[1]

    # --- embedding (semantic) gate --------------------------------
    vecs = (
        t(spark, sf, "embeddings").select("vec_id", "embedding")
        .where(F.col("embedding").isNotNull())
        .localCheckpoint()  # harness lookup frame, same as docs above
    )
    n_vecs = vecs.count()
    cents, indexed = embedding_index(vecs)
    cents = cents.localCheckpoint()
    indexed = indexed.localCheckpoint()
    vsrc = stream_rate_micro_batch(spark, vecs_per_batch, num_partitions=8)
    # novel vectors: flip alternate dimensions — far from every
    # corpus direction, so they pass the gate as genuinely new
    novel_vec = F.zip_with(
        F.col("__e"),
        F.sequence(F.lit(1), F.size(F.col("__e"))),
        lambda x, i: F.when(i % 2 == 0, -x).otherwise(x),
    )
    varriving = (
        vsrc.withColumn("__src", F.col("value") % n_vecs)
        .join(
            vecs.select(F.col("vec_id").alias("__src"),
                        F.col("embedding").alias("__e")),
            "__src",
        )
        .select(
            F.col("value").alias("vec_id"),
            F.when(F.col("value") % 2 == 0, F.col("__e"))
             .otherwise(novel_vec).alias("embedding"),
        )
    )
    vwriter = stream_dedup_embedding(varriving, cents, indexed, _noop_sink)
    # untimed warm-up (same rationale as the minhash gate above)
    _run_writer(vwriter, "bench_gate_embed_warm_", min_batches, max_wait)
    vresults = [
        _run_writer(vwriter, "bench_gate_embed_", min_batches, max_wait)
        for _ in range(repeats)
    ]
    vmed = _median_run(vresults)
    out["gate_embedding_vecs_per_sec"] = round(vmed[0])
    out["gate_embedding_runs"] = [round(r[0]) for r in vresults]
    out["gate_embedding_batches"] = vmed[1]
    return out


def main() -> None:
    from rstreams_spark.session import get_spark

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    out = measure(spark)
    out.update(measure_stateful(spark))
    out.update(measure_dedup_gates(spark))
    print(json.dumps({
        "metric": "streaming_processed_rows_per_sec",
        "value": out["processed_rows_per_sec"],
        "unit": "rows/sec",
        **{k: v for k, v in out.items() if k != "processed_rows_per_sec"},
    }))


if __name__ == "__main__":
    main()

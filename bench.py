"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end with a **noop sink**
(``write.format("noop")``), not ``.count()`` — count lets Catalyst
prune every projection it doesn't need, so projection-heavy queries
would measure scan+count instead of their real work. The noop sink
materializes every output column through the full plan. Per-query
times are the MEDIAN of three interleaved rounds (the raw draws ride
under ``draws``); ``value`` is the total of the medians across the
headline set; a streaming throughput metric (bench_streaming.measure)
rides along under ``streaming``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINERS = [
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q10", "tpch_q8", "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "wordcount", "hopping_window", "session_window", "candles",
    "candles_rollup", "range_band_count",
    "interval_join", "latest_per_key", "value_percentiles",
    "asof_enrich", "pattern_followed_by", "funnel_3step",
    "cohort_retention", "twap_daily",
    "tumbling_window_gapfill",
    "dedup_minhash", "dedup_simhash", "dedup_clusters", "minhash_lsh_topk",
    "doc_chunks", "embedding_quantize", "decontaminate_ngrams",
    "pack_sequences", "top_terms", "orders_rollup", "embedding_dim_stats",
    "ann_topk", "ann_lsh_topk", "text_quality", "quality_repetition",
    "span_dedup", "doc_commonness", "ngram_novelty", "dedup_winnowing",
    "vocab_coverage", "audio_meta",
    # r6: cross-source gram-overlap matrix (mirror detection) — two
    # gram-keyed shuffles, source-bounded join fanout; a scale path.
    "source_overlap",
    # promoted r5: semantic_clusters now buckets on corpus-sized
    # learned k-means cells (linear pair work, 3.0x on the sf1
    # decade step), so it is a scale path, not the exact baseline it
    # was when excluded; ivf_topk rides along as the ANN index whose
    # fit machinery it shares. embedding_cosine_dup (fixed-bucket
    # exact baseline) stays unbenched by design.
    "semantic_clusters", "ivf_topk",
    # r5: fuzzy minhash-LSH train/eval decontamination (bipartite
    # band join + exact verify on candidates); MP4/AVI metadata probe
    "decontaminate_fuzzy", "video_meta", "budget_sample",
    # r5: UCR-style z-normalized subsequence search over events
    "ts_similarity_topk",
    # r7: the corpus-scale probe fallbacks — same ANN values on a
    # shuffled hash join (uncapped probe side); benched so the
    # shuffle path's cost stays visible next to the broadcast path
    "ann_lsh_topk_shuffle", "ivf_topk_shuffle",
]


def build_payload(times: dict, sf: str, streaming: dict, errors: dict) -> dict:
    """The single stdout artifact line, kept COMPACT by construction:
    the driver captures only a tail of stdout, and r6's line with
    per-query raw draws grew to ~5 KB and truncated past the capture
    window (BENCH_r06 parsed:null). Medians only, rounded to 3 dp;
    raw draws persist in bench_history.jsonl and stderr comments.
    tests/test_lib_utils.py bounds the serialized size."""
    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "streaming": streaming,
    }
    if errors:
        # a partial sum must never read as a speedup: flag the
        # headline value invalid whenever any query errored
        payload["errors"] = errors
        payload["valid"] = False
    return payload


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footers so per-query times measure the plan
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # spin up the Python worker pool once (workers are reused), so
    # pandas-UDF queries measure steady-state, not interpreter start
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # JIT/codegen warm pass at the smallest SF: first execution of a
    # plan pays multi-second janino compilation that has nothing to
    # do with data-scale throughput (measured: 8.9 s cold vs 2.2 s
    # warm for the same sf0.1 query)
    warm_dir = "/root/testdata/sf0.001"
    import os.path as _p

    def run(df) -> None:
        # noop sink: executes the FULL plan incl. every projection
        # (count would let Catalyst prune unused expressions)
        df.write.format("noop").mode("overwrite").save()

    if _p.isdir(warm_dir):
        for name in HEADLINERS:
            run(REGISTRY[name](spark, warm_dir))

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name in HEADLINERS:  # untimed pass: row sanity at bench SF
        try:
            rows[name] = REGISTRY[name](spark, sf_dir).count()
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
    # MEDIAN-of-3 (r6; was min-of-2): this host shows multi-minute
    # noise bands (identical code 45 s vs 82 s), and a single low/high
    # draw faked both a "regression" (r5's quality_repetition) and
    # would fake speedups. The three timed runs are INTERLEAVED as
    # full rounds over the whole query list so one query's samples sit
    # minutes apart — a band that doesn't span the whole round can't
    # capture all three. Draws ride in the artifact so the judge (and
    # bench_diff) can see the spread behind every median.
    draws: dict[str, list[float]] = {}
    for _ in range(3):
        for name in HEADLINERS:
            if name in errors:
                continue
            try:
                start = time.perf_counter()
                run(REGISTRY[name](spark, sf_dir))
                dt = time.perf_counter() - start
                draws.setdefault(name, []).append(round(dt, 3))
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                draws.pop(name, None)
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
    for name, ds in draws.items():
        times[name] = sorted(ds)[len(ds) // 2]  # median draw
    for name in HEADLINERS:
        if name in times:
            print(
                f"# {name}: {times[name]:.3f}s median of {draws[name]} "
                f"({rows[name]} rows)", file=sys.stderr,
            )

    # streaming rides along but must never sink the artifact: r02's
    # BENCH JSON was unparseable because a state-store teardown stack
    # drowned the (single) output line — measure defensively and emit
    # the JSON unconditionally afterwards
    streaming: dict = {}
    try:
        import bench_streaming
        streaming = bench_streaming.measure(spark)
    except Exception as exc:
        streaming["err"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        import bench_streaming
        streaming.update(bench_streaming.measure_stateful(spark))
    except Exception as exc:
        streaming["stateful_err"] = f"{type(exc).__name__}: {exc}"[:300]
    print(f"# streaming: {streaming}", file=sys.stderr)

    payload = build_payload(times, sf, streaming, errors)
    # append-only per-run history so regressions surface as numbers
    # (r02→r03 archaeology was only possible via PERF.md prose);
    # tools/bench_diff.py prints the per-query delta of the last two
    try:
        import subprocess
        rev = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        rev = None
    try:
        hist = dict(payload, draws=draws, ts=int(time.time()), commit=rev)
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_history.jsonl"), "a"
        ) as fh:
            fh.write(json.dumps(hist) + "\n")
    except Exception:
        pass  # history must never sink the artifact
    sys.stderr.flush()
    time.sleep(0.5)  # let straggling JVM log lines land before the JSON
    # leading newline: if an interleaved JVM log line left an unterminated
    # stdout fragment, the JSON still starts at column 0 of its own line
    line = json.dumps(payload)
    if len(line) > 2500:  # loud guard: never outgrow the tail capture again
        print(f"# WARNING: bench JSON line is {len(line)} bytes (>2500); "
              "the driver's stdout tail capture may truncate it",
              file=sys.stderr)
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()
    # skip Python/JVM teardown entirely: shutdown-hook stacks (state
    # store abort noise) must not interleave after the JSON line
    os._exit(0)


if __name__ == "__main__":
    main()

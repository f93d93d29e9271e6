"""Bucketed-lake A/B for the dedup/embedding ingest family (VERDICT
r10 item 7) — does a pre-bucketed INDEX layout remove the per-trigger
exchange the gates pay?

Two measured claims, extending tools/bucketed_bench.py's fact-fact
result to the 100 TB dedup story:

1. **Embedding gate**: the semantic index written BUCKETED BY CELL
   (`write_bucketed(indexed, ..., ["cell"])`) satisfies the cogroup
   kernel's index-side clustering with ZERO exchange — each trigger
   shuffles only the arriving batch. The union→groupBy kernel shape
   (`_cell_dup_ids_np`) must re-shuffle BOTH sides every trigger (a
   union discards child partitioning), so the bucketed lake needs
   the cogroup twin (`_cell_dup_ids_np_cogroup` — row-identical,
   pinned).
2. **Minhash gate**: `index_bands` written bucketed on (band_idx,
   band_key) lets the per-trigger candidate join plan a shuffle on
   the ARRIVING band rows only (one-sided exchange) instead of both.

Prints timing (warm + min-of-2) and exchange counts per layout.
Usage: python tools/bucketed_dedup_bench.py [sf_dir]
       (default /root/testdata/sf0.1; larger local tilings welcome)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BKT_DIR = os.path.join(HERE, ".localdata", "bucketed_dedup")
N_BUCKETS = 32


def _timed(build, draws: int = 2) -> float:
    from pyspark.sql import SparkSession

    from rstreams_spark.session import gc_hygiene

    gc_hygiene(SparkSession.getActiveSession())
    build().localCheckpoint(eager=False).count()  # warm
    best = float("inf")
    for _ in range(draws):
        t0 = time.perf_counter()
        build().localCheckpoint(eager=False).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from rstreams_spark import plans
    from rstreams_spark.functions.dedup import (
        doc_shingles, lsh_band_rows, minhash_signature_np,
    )
    from rstreams_spark.functions.similarity import l2_norm, rankable_norm
    from rstreams_spark.queries._util import t
    from rstreams_spark.queries.dedupq import BANDS, COSINE_TAU, NUM_PERM
    from rstreams_spark.session import gc_hygiene, get_spark, oha_session
    from rstreams_spark.sinks.writers import write_bucketed
    from rstreams_spark.streaming.dedup import (
        MINHASH_SHINGLE_N, _cell_dup_ids_np, _cell_dup_ids_np_cogroup,
        embedding_index, minhash_index,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = oha_session(get_spark("bucketed-dedup-bench"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).count()

    # ---------------- embedding gate ------------------------------
    vecs = (
        t(spark, sf, "embeddings").select("vec_id", "embedding")
        .where(F.col("embedding").isNotNull())
        .localCheckpoint()
    )
    cents, indexed = embedding_index(vecs)
    cents = cents.localCheckpoint()
    t0 = time.perf_counter()
    write_bucketed(indexed, "indexed_cell_bkt",
                   os.path.join(BKT_DIR, "indexed"), ["cell"], N_BUCKETS)
    print(f"# index bucketed write (one-time): "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
    indexed_plain = indexed.localCheckpoint()
    indexed_bkt = spark.table("indexed_cell_bkt")

    from rstreams_spark.queries.dedupq import ivf_assign_np

    arrivals = (
        ivf_assign_np(
            vecs.select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                        "embedding"),
            cents,
        )
        .withColumn("v_norm", l2_norm(F.col("embedding")))
        .where(rankable_norm(F.col("v_norm")))
        .localCheckpoint()
    )

    def rows_of(df):
        return sorted(r["vec_id"] for r in df.collect())

    variants = {
        "union kernel, plain index":
            lambda: _cell_dup_ids_np(arrivals, indexed_plain, COSINE_TAU),
        "cogroup kernel, plain index":
            lambda: _cell_dup_ids_np_cogroup(arrivals, indexed_plain,
                                             COSINE_TAU),
        "cogroup kernel, BUCKETED index":
            lambda: _cell_dup_ids_np_cogroup(arrivals, indexed_bkt,
                                             COSINE_TAU),
    }
    base = None
    print("| embedding gate variant | s | exchanges |")
    print("|---|---|---|")
    for name, b in variants.items():
        ids = rows_of(b())
        if base is None:
            base = ids
        assert ids == base, f"{name}: row mismatch vs union kernel"
        ex = plans.count_shuffles(b())
        print(f"| {name} | {_timed(b):.2f} | {ex} |")

    # ---------------- minhash gate candidate join -----------------
    docs = t(spark, sf, "documents").select("doc_id", "text").localCheckpoint()
    index_bands, _index_sets = minhash_index(docs)
    t0 = time.perf_counter()
    write_bucketed(index_bands, "bands_bkt",
                   os.path.join(BKT_DIR, "bands"),
                   ["band_idx", "band_key"], N_BUCKETS)
    print(f"# bands bucketed write (one-time): "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
    bands_plain = index_bands.localCheckpoint()
    bands_bkt = spark.table("bands_bkt")

    arriving = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    ).localCheckpoint()
    sh = doc_shingles(arriving, "text", MINHASH_SHINGLE_N)
    sig = minhash_signature_np(sh, NUM_PERM,
                               with_hash_set=False).localCheckpoint()

    def cand(bands_tbl):
        return (
            lsh_band_rows(sig, NUM_PERM, BANDS)
            .join(bands_tbl.hint("shuffle_hash"),
                  ["band_idx", "band_key"])
            .select("doc_id", "index_id")
            .distinct()
        )

    print("| minhash candidate join | s | exchanges |")
    print("|---|---|---|")
    n_plain = cand(bands_plain).count()
    n_bkt = cand(bands_bkt).count()
    assert n_plain == n_bkt, f"candidates differ: {n_plain} vs {n_bkt}"
    for name, tbl in (("plain bands", bands_plain),
                      ("BUCKETED bands", bands_bkt)):
        ex = plans.count_shuffles(cand(tbl))
        print(f"| {name} | {_timed(lambda: cand(tbl)):.2f} | {ex} |")


if __name__ == "__main__":
    main()

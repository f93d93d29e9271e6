"""stream_dedup_minhash per-trigger stage decomposition (VERDICT r10
item 1).

gate_minhash sits at 12.5-14.5k docs/s while its embedding sibling
jumped 3.8× when the dominant stage moved to a grouped Arrow kernel.
Before porting anything, ATTRIBUTE the trigger cost (the PERF.md A/B
discipline): reproduce one bench trigger as a static batch (identical
synthesis to bench_streaming.measure_dedup_gates — 50% corpus dups,
50% novel md5 text) and time each stage to an eager materialization:

  S1 signature — tokens → grams → distinct-shingle explode → md5
     hash64 → 64 pmod-min aggregates (+ collect_set hash set);
  S2 candidates — band rows from the materialized signatures, join
     vs index_bands, distinct (id, index_id);
  S3 verify — candidates join arriving/index hash sets,
     array_intersect jaccard ≥ tau cut, distinct dup ids;
  S4 anti — batch left-anti dup_ids;
  FULL — the fused minhash_dedup_batch as the gate runs it.

Each stage is timed min-of-N after a warm pass (host noise bands).
Stages re-read their upstream from an EAGER checkpoint so S2 never
re-runs S1 etc.

Usage: python tools/gate_minhash_decomp.py [sf_dir] [docs_per_batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

DRAWS = 3


def _timed(build, draws: int = DRAWS) -> float:
    """Warm pass + min-of-draws to an eager materialization (one
    job per draw: lazy checkpoint + count — invariant 11)."""
    build().localCheckpoint(eager=False).count()  # warm
    best = float("inf")
    for _ in range(draws):
        t0 = time.perf_counter()
        build().localCheckpoint(eager=False).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from rstreams_spark.functions.dedup import (
        doc_shingles, lsh_band_rows, minhash_signature,
    )
    from rstreams_spark.queries._util import t
    from rstreams_spark.queries.dedupq import BANDS, NUM_PERM
    from rstreams_spark.session import get_spark, oha_session
    from rstreams_spark.streaming.dedup import (
        MINHASH_DEDUP_TAU, MINHASH_SHINGLE_N, minhash_dedup_batch,
        minhash_index,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = oha_session(get_spark("gate-minhash-decomp"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).count()

    docs = t(spark, sf, "documents").select("doc_id", "text").localCheckpoint()
    n_docs = docs.count()
    index_bands, index_sets = minhash_index(docs)
    index_bands = index_bands.localCheckpoint()
    index_sets = index_sets.localCheckpoint()

    # one bench trigger's arrivals, synthesized exactly like
    # measure_dedup_gates (50% corpus dup / 50% novel)
    novel = F.concat_ws(
        " ", *[
            F.md5(F.concat_ws("-", F.col("value").cast("string"),
                              F.lit(str(k))))
            for k in range(16)
        ]
    )
    batch = (
        spark.range(per_batch).select(F.col("id").alias("value"))
        .withColumn("__src", F.col("value") % n_docs)
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
        .localCheckpoint()
    )

    # S1: signature (+ hash sets), from the materialized batch
    def s1():
        sh = doc_shingles(batch, "text", MINHASH_SHINGLE_N)
        return minhash_signature(sh, NUM_PERM, with_hash_set=True)

    t1 = _timed(s1)
    sig = s1().localCheckpoint()

    # S2: band rows + candidate join, from the materialized signature
    def s2():
        bands = lsh_band_rows(sig, NUM_PERM, BANDS)
        return (
            bands.join(index_bands, ["band_idx", "band_key"])
            .select("doc_id", "index_id")
            .distinct()
        )

    t2 = _timed(s2)
    cands = s2().localCheckpoint()
    n_cands = cands.count()

    # S3: exact-jaccard verify, from materialized candidates
    arriving = sig.select(
        "doc_id",
        F.col("__shset").alias("s1"),
        F.size("__shset").cast("long").alias("n1"),
    ).localCheckpoint()

    def s3():
        inter = F.size(F.array_intersect(F.col("s1"), F.col("shset")))
        jac = inter / (F.col("n1") + F.col("n") - inter)
        return (
            cands.join(arriving, "doc_id")
            .join(index_sets, "index_id")
            .where(jac >= MINHASH_DEDUP_TAU)
            .select("doc_id")
            .distinct()
        )

    t3 = _timed(s3)
    dup_ids = s3().localCheckpoint()
    n_dups = dup_ids.count()

    # S4: final anti-join
    def s4():
        return batch.join(dup_ids, "doc_id", "left_anti")

    t4 = _timed(s4)

    # FULL: the fused gate body as the stream runs it
    def full():
        return minhash_dedup_batch(batch, index_bands, index_sets)

    tf = _timed(full)

    print(f"# sf={os.path.basename(sf.rstrip('/'))} docs/batch={per_batch} "
          f"candidates={n_cands} dups={n_dups}", file=sys.stderr)
    print("| stage | s | share of Σ |")
    print("|---|---|---|")
    tot = t1 + t2 + t3 + t4
    for name, tv in (("S1 signature", t1), ("S2 candidates", t2),
                     ("S3 verify", t3), ("S4 anti-join", t4)):
        print(f"| {name} | {tv:.2f} | {tv / tot:.0%} |")
    print(f"| Σ stages | {tot:.2f} | |")
    print(f"| FULL fused | {tf:.2f} | |")
    print(f"| implied docs/s (fused) | {per_batch / tf:.0f} | |")


if __name__ == "__main__":
    main()

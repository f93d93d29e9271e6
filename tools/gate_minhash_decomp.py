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

    from rstreams_spark.functions.dedup import (
        doc_shingles, lsh_band_rows, minhash_signature,
    )
    from rstreams_spark.queries._util import t
    from rstreams_spark.queries.dedupq import BANDS, NUM_PERM
    from rstreams_spark.session import gc_hygiene, get_spark, oha_session
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

    from rstreams_spark.functions.text import hash64

    # S1: signature (+ hash sets), from the materialized batch
    def s1():
        sh = doc_shingles(batch, "text", MINHASH_SHINGLE_N)
        return minhash_signature(sh, NUM_PERM, with_hash_set=True)

    t1 = _timed(s1)
    sig = s1().localCheckpoint()

    # S1a: shingle explode + md5 hash64 only (tokens → grams →
    # distinct → explode → hash) — isolates the text work from the
    # 64-permutation aggregation
    def s1a():
        sh = doc_shingles(batch, "text", MINHASH_SHINGLE_N)
        return sh.select("doc_id", hash64(F.col("shingle")).alias("__h"))

    t1a = _timed(s1a)
    hashed = s1a().localCheckpoint()

    # S1b: the 64 pmod-min aggregates + collect_set from the
    # materialized (doc_id, __h) rows
    def s1b():
        from rstreams_spark.functions.dedup import P61, perm_coeffs
        _LO = (1 << 30) - 1
        hlo = F.col("__h").bitwiseAND(F.lit(_LO))
        hhi = F.shiftright(F.col("__h"), 30)
        aggs = [
            F.min(F.pmod(F.lit(a) * hlo + F.lit(c) * hhi + F.lit(b),
                         F.lit(P61))).alias(f"h{i}")
            for i, (a, c, b) in enumerate(perm_coeffs(NUM_PERM))
        ]
        aggs.append(F.array_sort(F.collect_set("__h")).alias("__shset"))
        return hashed.groupBy("doc_id").agg(*aggs)

    t1b = _timed(s1b)

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

    # S3a: the candidate set-pair join WITHOUT the intersect (ships
    # both hash-set arrays per candidate) — isolates join+shuffle
    # from the array_intersect evaluation
    def s3a():
        return (
            cands.join(arriving, "doc_id")
            .join(index_sets, "index_id")
            .select("doc_id", "index_id")
        )

    t3a = _timed(s3a)

    # S3b: intersect computed ONCE via a projection (is the double
    # evaluation of array_intersect inside `jac` costing a pass?)
    def s3b():
        joined = (
            cands.join(arriving, "doc_id")
            .join(index_sets, "index_id")
            .select(
                "doc_id",
                F.size(F.array_intersect(F.col("s1"), F.col("shset")))
                 .alias("__i"),
                "n1", "n",
            )
        )
        jac = F.col("__i") / (F.col("n1") + F.col("n") - F.col("__i"))
        return (
            joined.where(jac >= MINHASH_DEDUP_TAU)
            .select("doc_id").distinct()
        )

    t3b = _timed(s3b)
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

    # FULL + the r11 exact-fingerprint pre-gate (the bench config)
    from rstreams_spark.streaming.dedup import minhash_index_fps

    index_fps = minhash_index_fps(
        docs, index_bands=index_bands
    ).localCheckpoint()

    def full_fps():
        return minhash_dedup_batch(
            batch, index_bands, index_sets, index_fps=index_fps
        )

    tff = _timed(full_fps)

    # A/B: fp pre-gate with the JVM signature agg instead of the
    # Arrow kernel (is the kernel actually paying for itself?)
    def full_fps_jvm():
        return minhash_dedup_batch(
            batch, index_bands, index_sets, index_fps=index_fps,
            use_np_signature=False,
        )

    tfj = _timed(full_fps_jvm)

    # the pre-gate survivors alone (fp anti-join cost)
    def pregate():
        from rstreams_spark.functions.text import md5_fingerprint
        return (
            batch.withColumn("__fp", md5_fingerprint(F.col("text")))
            .join(index_fps.select(F.col("fp").alias("__fp")),
                  "__fp", "left_anti")
            .drop("__fp")
        )

    tpg = _timed(pregate)

    # kernel signature over the pre-gate survivors (the new S1)
    fresh = pregate().localCheckpoint()

    def s1k():
        from rstreams_spark.functions.dedup import minhash_signature_np
        sh = doc_shingles(fresh, "text", MINHASH_SHINGLE_N)
        return minhash_signature_np(sh, NUM_PERM)

    t1k = _timed(s1k)

    print(f"# sf={os.path.basename(sf.rstrip('/'))} docs/batch={per_batch} "
          f"candidates={n_cands} dups={n_dups}", file=sys.stderr)
    print("| stage | s | share of Σ |")
    print("|---|---|---|")
    tot = t1 + t2 + t3 + t4
    for name, tv in (("S1 signature", t1),
                     ("S1a shingle+md5 only", t1a),
                     ("S1b 64-min agg only", t1b),
                     ("S2 candidates", t2),
                     ("S3 verify", t3),
                     ("S3a set-pair join only", t3a),
                     ("S3b verify, single intersect", t3b),
                     ("S4 anti-join", t4)):
        print(f"| {name} | {tv:.2f} | {tv / tot:.0%} |")
    print(f"| Σ stages | {tot:.2f} | |")
    print(f"| FULL fused (no fps) | {tf:.2f} | |")
    print(f"| FULL fused + fp pre-gate | {tff:.2f} | |")
    print(f"| FULL fused + fp, JVM sig | {tfj:.2f} | |")
    print(f"| pre-gate anti-join alone | {tpg:.2f} | |")
    print(f"| S1 kernel on survivors | {t1k:.2f} | |")
    print(f"| implied docs/s (no fps) | {per_batch / tf:.0f} | |")
    print(f"| implied docs/s (fps) | {per_batch / tff:.0f} | |")


if __name__ == "__main__":
    main()

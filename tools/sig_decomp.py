"""Decompose the minhash signature stage (stage A of the banded-LSH
family — VERDICT r12 item 4) at a given SF: where does the time go,
and does splitting the 65-function ObjectHashAggregate into a codegen
HashAggregate (64 mins) + a 1-function OHA (collect_set) win?

Variants timed through the noop sink, fresh session, gc_hygiene
before every draw, interleaved rounds (host noise discipline):

  base_set   minhash_signature(with_hash_set=True)   — current stage A
             (single ObjectHashAggregate, 65 functions, interpreted)
  base_min   minhash_signature(with_hash_set=False)  — codegen floor
             (single HashAggregate, 64 min functions)
  set_only   groupBy(doc_id).agg(array_sort(collect_set(__h)))
             (single OHA, 1 function)
  split      lazy-checkpointed exploded frame -> min-agg JOIN set-agg
             (the §1.2 candidate: mins back in codegen)

Usage: python tools/sig_decomp.py <sf_dir> <reps>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    from rstreams_spark.functions.dedup import (
        NUM_PERM, doc_shingles, minhash_signature,
    )
    from rstreams_spark.functions.text import hash64
    from rstreams_spark.queries._util import t
    from rstreams_spark.session import gc_hygiene, get_spark, oha_session

    spark = oha_session(get_spark("sig-decomp"))
    spark.sparkContext.setLogLevel("ERROR")

    def sh():
        return doc_shingles(t(spark, sf_dir, "documents"), "text", 2)

    def with_h():
        return sh().select(F.col("doc_id"), hash64(F.col("shingle")).alias("__h"))

    def base_set():
        return minhash_signature(sh(), NUM_PERM, with_hash_set=True)

    def base_min():
        return minhash_signature(sh(), NUM_PERM, with_hash_set=False)

    def set_only():
        return with_h().groupBy("doc_id").agg(
            F.array_sort(F.collect_set("__h")).alias("__shset")
        )

    # the split is built inline (minhash_signature hashes internally,
    # so the two-consumer form needs the hashed frame shared explicitly)
    from rstreams_spark.functions.dedup import _LO_MASK, P61, perm_coeffs

    def split():
        wh = with_h().localCheckpoint(eager=False)
        hlo = F.col("__h").bitwiseAND(F.lit(_LO_MASK))
        hhi = F.shiftright(F.col("__h"), 30)
        aggs = [
            F.min(F.pmod(F.lit(a) * hlo + F.lit(c) * hhi + F.lit(b), F.lit(P61))).alias(f"h{i}")
            for i, (a, c, b) in enumerate(perm_coeffs(NUM_PERM))
        ]
        mins = wh.groupBy("doc_id").agg(*aggs)
        sets = wh.groupBy("doc_id").agg(
            F.array_sort(F.collect_set("__h")).alias("__shset")
        )
        return mins.join(sets, "doc_id")

    def preproj():
        # hlo/hhi as PLAIN columns: if the agg's (interpreted OHA)
        # update projection doesn't common the mask/shift subtrees,
        # this removes 2×64-2 ops/row; identical values by algebra
        wh = with_h().select(
            "doc_id", "__h",
            F.col("__h").bitwiseAND(F.lit(_LO_MASK)).alias("__hlo"),
            F.shiftright(F.col("__h"), 30).alias("__hhi"),
        )
        aggs = [
            F.min(
                F.pmod(
                    F.lit(a) * F.col("__hlo") + F.lit(c) * F.col("__hhi") + F.lit(b),
                    F.lit(P61),
                )
            ).alias(f"h{i}")
            for i, (a, c, b) in enumerate(perm_coeffs(NUM_PERM))
        ]
        aggs.append(F.array_sort(F.collect_set("__h")).alias("__shset"))
        return wh.groupBy("doc_id").agg(*aggs)

    def dict_bhj():
        # dictionary-encode: 64 pmods per DISTINCT hash (dup factor
        # 279-443× at sf0.1/sf1), broadcast the perm table back. Pays
        # a checkpoint of the exploded frame (feeds distinct + join)
        # and a BHJ probe per row; NOT scale-safe (distinct shingles
        # at real corpus scale outgrow any broadcast) — measured for
        # the record per VERDICT r12 item 4.
        wh = with_h().localCheckpoint(eager=False)
        hlo = F.col("__h").bitwiseAND(F.lit(_LO_MASK))
        hhi = F.shiftright(F.col("__h"), 30)
        perms = wh.select("__h").distinct().select(
            "__h",
            *[
                F.pmod(F.lit(a) * hlo + F.lit(c) * hhi + F.lit(b), F.lit(P61)).alias(f"p{i}")
                for i, (a, c, b) in enumerate(perm_coeffs(NUM_PERM))
            ],
        )
        aggs = [F.min(F.col(f"p{i}")).alias(f"h{i}") for i in range(NUM_PERM)]
        aggs.append(F.array_sort(F.collect_set("__h")).alias("__shset"))
        return wh.join(F.broadcast(perms), "__h").groupBy("doc_id").agg(*aggs)

    variants = {
        "base_set": base_set,
        "base_min": base_min,
        "set_only": set_only,
        "split": split,
        "preproj": preproj,
        "dict_bhj": dict_bhj,
    }

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name, fn in variants.items():  # codegen/JIT warm pass
        run(fn())

    draws: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            gc_hygiene(spark)
            spark.sparkContext.setJobDescription(f"sig_decomp:{name}")
            t0 = time.perf_counter()
            run(fn())
            draws[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps(draws))


if __name__ == "__main__":
    main()

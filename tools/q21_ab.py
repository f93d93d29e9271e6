"""Isolated q21 A/B at a given SF: the r12 shared-exchange
`.repartition(l_orderkey)` form vs the stock two-exchange form
(VERDICT r12 item 2 — the one code-changed headline query whose
driver number regressed while the isolated A/B said win).

Fresh session, warm pass at sf0.001, gc_hygiene before every draw,
interleaved rounds, noop sink. Usage:
  python tools/q21_ab.py <sf_dir> <reps>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def build(spark, sf_dir: str, shared_exchange: bool):
    from rstreams_spark.queries._util import t
    from rstreams_spark.queries.tpch import Q21_LATE_DAYS

    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    if shared_exchange:
        joined = joined.repartition(F.col("l_orderkey"))
    per_pair = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("__late")
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("__ns"),
            F.sum("__late").alias("__nl"),
            F.max(F.when(F.col("__late") == 1, F.col("l_suppkey"))).alias("__lone"),
        )
        .where((F.col("__ns") > 1) & (F.col("__nl") == 1))
    )
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.groupBy("__lone")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier), F.col("__lone") == F.col("s_suppkey"))
        .orderBy(F.col("numwait").desc(), "s_name", "s_suppkey")
        .limit(100)
        .select("s_name", "numwait")
    )


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    from rstreams_spark.session import gc_hygiene, get_spark

    spark = get_spark("q21-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for se in (True, False):  # warm pass
        run(build(spark, "/root/testdata/sf0.001", se))

    draws = {"shared": [], "stock": []}
    for _ in range(reps):
        for key, se in (("shared", True), ("stock", False)):
            gc_hygiene(spark)
            spark.sparkContext.setJobDescription(f"q21:{key}")
            t0 = time.perf_counter()
            run(build(spark, sf_dir, se))
            draws[key].append(round(time.perf_counter() - t0, 3))
    print(json.dumps(draws))


if __name__ == "__main__":
    main()

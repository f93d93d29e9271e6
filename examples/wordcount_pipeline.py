"""The reference's shakespeare word-count examples
(example/tpipe.rs, example/shakespeare_consumer.rs) Spark-first.

The reference hand-builds 4 per-partition consumer streams, maps a
normalizer over each, merges them, and folds a HashMap of counts
(example/tpipe.rs:32-127). Spark's scan is partition-parallel by
itself; normalize/explode/count is one declarative plan with
map-side partial aggregation — the merge and the fold are the
shuffle.

Run: python examples/wordcount_pipeline.py [sf_dir] [top_n]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from rstreams_spark.functions.text import tokens
from rstreams_spark.queries._util import t
from rstreams_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("wordcount")
    spark.sparkContext.setLogLevel("ERROR")
    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
    )
    # reference prints the top 100 (example/tpipe.rs:121-126)
    for r in counts.limit(top_n).collect():
        print(f"{r['word']}: {r['n']}")
    spark.stop()


if __name__ == "__main__":
    main()

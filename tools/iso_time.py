"""Isolated fresh-session noop-sink timing (the decision-grade number
on this noisy host — CLAUDE.md: never trust a single in-bench draw).

Spawned once per CONFIG: builds one fresh session, pays the codegen
warm pass at sf0.001, then times N interleaved rounds over the given
queries through the noop sink with ``gc_hygiene`` before every draw.
Prints one JSON line {query: [draws...]} on stdout (min is taken by
the caller so the raw spread stays visible).

Usage: python tools/iso_time.py <sf_dir> <reps> <query> [query ...]
Config (session conf, e.g. SPARK_GRAFT_INITIAL_PARTITIONS) rides the
environment, so an A/B is two invocations with different env.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.session import gc_hygiene, get_spark

    spark = get_spark("iso-time")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:  # codegen/JIT warm pass at the smallest SF
        run(REGISTRY[name](spark, "/root/testdata/sf0.001"))

    draws: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        gc_hygiene(spark)
        for name in names:
            t0 = time.perf_counter()
            run(REGISTRY[name](spark, sf_dir))
            draws[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps(draws))
    sys.stdout.flush()


if __name__ == "__main__":
    main()

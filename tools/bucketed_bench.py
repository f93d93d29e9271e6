"""Bucketed-lake A/B: the same catalog queries, plain parquet vs
co-bucketed tables (VERDICT r9 item 7).

SURVEY §6 documents the 100 TB discipline "pay the shuffle once at
load, never per query": facts bucketed on their repeated join key
plan fact-fact equi-joins and same-key aggregations with ZERO
exchanges (pinned by tests/test_plans.py::
test_bucketed_benchmark_tables_zero_exchange_q18_core and
test_bucketed_join_needs_no_shuffle). This tool adds the MEASURED
half at sf1: it writes bucketed orders+lineitem (co-bucketed on
orderkey, sorted) and events (bucketed on user_id) from the local
sf1 tiling, then times the UNMODIFIED catalog queries tpch_q3 /
tpch_q18 / interval_join on both layouts by routing the queries'
table reads through the bucketed catalog tables (the queries
themselves are untouched — same code path a lake deployment runs).

Timing: min-of-2 after an untimed warm run per (query, layout),
noop sink, alternating layouts inside one session. Prints a
PERF.md-ready table plus the exchange counts for both plans.

Usage: python tools/bucketed_bench.py  (~3 min; needs
.localdata/sf1 from tools/gen_sf1.py)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".localdata", "sf1",
)
BKT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".localdata", "bucketed_sf1",
)
N_BUCKETS = 32
QUERIES = ["tpch_q3", "tpch_q18", "interval_join"]
# table -> bucket key (facts with a repeated equi-join key only;
# dims stay plain parquet — broadcast is their scale path)
BUCKETED = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["user_id"],
}


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from rstreams_spark import plans
    from rstreams_spark.queries import REGISTRY, core, tpch
    from rstreams_spark.queries._util import t as t_orig
    from rstreams_spark.session import get_spark
    from rstreams_spark.sinks.writers import write_bucketed

    if not os.path.isdir(SF1):
        print("bucketed_bench: .localdata/sf1 absent — run tools/gen_sf1.py",
              file=sys.stderr)
        sys.exit(1)

    spark = get_spark("bucketed-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- one-time load shuffle: write the bucketed layout --------
    t0 = time.perf_counter()
    for name, keys in BUCKETED.items():
        tbl = f"{name}_bkt_sf1"
        path = os.path.join(BKT_DIR, name)
        write_bucketed(t_orig(spark, SF1, name), tbl, path, keys, N_BUCKETS)
    load_s = time.perf_counter() - t0
    print(f"# bucketed load (one-time, 3 tables): {load_s:.1f} s",
          file=sys.stderr)

    def t_bucketed(spark_, sf_dir, name):
        if name in BUCKETED:
            return spark_.table(f"{name}_bkt_sf1")
        return t_orig(spark_, sf_dir, name)

    def run(qname):
        REGISTRY[qname](spark, SF1).write.format("noop").mode(
            "overwrite"
        ).save()

    def patched(module_ts, fn):
        for mod in module_ts:
            mod.t = t_bucketed
        try:
            return fn()
        finally:
            for mod in module_ts:
                mod.t = t_orig

    mods = [core, tpch]
    rows = []
    for qname in QUERIES:
        cells = {}
        for layout in ("plain", "bucketed"):
            def draw():
                best = float("inf")
                run(qname)  # untimed warm
                for _ in range(2):
                    s = time.perf_counter()
                    run(qname)
                    best = min(best, time.perf_counter() - s)
                return best
            if layout == "bucketed":
                cells[layout] = patched(mods, draw)
                cells["ex_bkt"] = patched(
                    mods,
                    lambda: plans.count_shuffles(REGISTRY[qname](spark, SF1)),
                )
            else:
                cells[layout] = draw()
                cells["ex_plain"] = plans.count_shuffles(
                    REGISTRY[qname](spark, SF1)
                )
        rows.append(
            f"| {qname} | {cells['plain']:.2f} | {cells['bucketed']:.2f} | "
            f"{cells['ex_plain']} | {cells['ex_bkt']} |"
        )
        print(f"# {qname}: plain {cells['plain']:.2f} s "
              f"({cells['ex_plain']} ex) -> bucketed "
              f"{cells['bucketed']:.2f} s ({cells['ex_bkt']} ex)",
              file=sys.stderr)

    print("| query | plain s | bucketed s | exchanges plain | exchanges bucketed |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()

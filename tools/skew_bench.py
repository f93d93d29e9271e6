"""Skew-at-scale wall-clock probe (r9, VERDICT item 2).

The hot-key probe class proves PARITY under skew at sf0.01; this tool
measures PERFORMANCE at sf1: it derives ``.localdata/sf1_skew`` from
``.localdata/sf1`` — the SAME row counts and bytes, with keys
redirected so the shuffle work lands skewed — then times the four
skew-exposed headliners on both corpora:

- tpch_q3 / tpch_q18: 90% of lineitem rows redirected to ONE hot
  orderkey. FK semantics make this the clean case: every lineitem
  still matches exactly one order, so total join WORK is identical —
  only its distribution changes. The ≤2× criterion applies directly.
- interval_join: 30% of events redirected to one hot user. A key-skewed
  SELF join legitimately multiplies OUTPUT (hot purchases × hot errors
  inside the time band), so the honest criterion is wall normalized by
  output rows, reported alongside raw wall.
- dedup_minhash: 30% of documents gain a shared boilerplate prefix —
  hot shingles and hot LSH band buckets. The bucket/DF caps are the
  designed defense; the criterion is raw wall again.

Skewed joins run under a sibling session whose skew-detection
thresholds are scaled to local shuffle sizes (16 MB hot-partition
threshold vs the 256 MB production default — local[32] partitions
never reach production bytes); the tool asserts OptimizeSkewedJoin
actually split (``skew=true`` in the executed plan) for the FK joins.

Usage: python tools/skew_bench.py   (prints a table; record in PERF.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(HERE, ".localdata", "sf1")
OUT = os.path.join(HERE, ".localdata", "sf1_skew")

BOILER = " ".join(f"boiler{i} common prefix token" for i in range(8))


def build() -> None:
    import duckdb

    if not os.path.isdir(SF1):
        raise SystemExit("skew_bench: build .localdata/sf1 first (tools/gen_sf1.py)")
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    hot_ok = con.sql(
        f"select min(o_orderkey) from read_parquet('{SF1}/orders.parquet')"
    ).fetchone()[0]
    hot_user = con.sql(
        f"select min(user_id) from read_parquet('{SF1}/events.parquet')"
    ).fetchone()[0]
    rewrites = {
        "lineitem": (
            "select * replace (case when (l_orderkey * 31 + l_linenumber) % 10 < 9 "
            f"then {hot_ok} else l_orderkey end as l_orderkey) from t"
        ),
        "events": (
            "select * replace (case when event_id % 10 < 3 "
            f"then {hot_user} else user_id end as user_id) from t"
        ),
        "documents": (
            "select * replace (case when doc_id % 10 < 3 "
            f"then '{BOILER} ' || text else text end as text) from t"
        ),
    }
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        dst = f"{OUT}/{tbl}.parquet"
        if tbl in rewrites:
            sql = rewrites[tbl].replace("from t", f"from read_parquet('{SF1}/{tbl}.parquet')")
            con.sql(f"copy ({sql}) to '{dst}' (format parquet)")
        else:
            shutil.copyfile(f"{SF1}/{tbl}.parquet", dst)
        print(f"  {tbl}: done", file=sys.stderr)


def main() -> None:
    if not os.path.isdir(OUT) or "--rebuild" in sys.argv:
        print("# building sf1_skew ...", file=sys.stderr)
        build()

    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.session import gc_hygiene, get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # local-scale analog of the production skew thresholds: local[32]
    # shuffle partitions never reach 256 MB, so scale detection to the
    # bytes this corpus actually produces (the activation MECHANISM is
    # what we exercise; production defaults bind at production bytes)
    skew_sess = spark.newSession()
    skew_sess.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB"
    )
    skew_sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")

    def run(name: str, sess, sf: str) -> tuple[float, object]:
        df = REGISTRY[name](sess, sf)
        gc_hygiene(sess)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, df

    names = ["tpch_q3", "tpch_q18", "interval_join", "dedup_minhash"]
    for n in names:  # warm codegen/footers
        run(n, spark, "/root/testdata/sf0.001")

    print(f"{'query':16} {'uniform s':>10} {'skewed s':>10} {'ratio':>7}  notes")
    for n in names:
        u = min(run(n, spark, SF1)[0] for _ in range(2))
        sess = skew_sess if n.startswith("tpch") else spark
        draws = []
        last_df = None
        for _ in range(2):
            w, last_df = run(n, sess, OUT)
            draws.append(w)
        k = min(draws)
        note = ""
        if n.startswith("tpch"):
            plan = last_df._jdf.queryExecution().executedPlan().toString()
            note = "skew-split=" + ("YES" if "skew=true" in plan else "no")
        if n == "interval_join":
            out_rows = last_df.count()
            base_rows = REGISTRY[n](spark, SF1).count()
            note = (f"output {base_rows}->{out_rows} rows "
                    f"(wall/Mrow {u / max(base_rows,1) * 1e6:.2f} -> "
                    f"{k / max(out_rows,1) * 1e6:.2f} s)")
        print(f"{n:16} {u:10.3f} {k:10.3f} {k / u:7.2f}  {note}")


if __name__ == "__main__":
    main()

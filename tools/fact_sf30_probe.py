"""Third-decade (sf10 -> sf30) growth probe for the TPC-H/fact
family (VERDICT r11 item 1: the fact tables had no third-decade row
— tools/gen_sf30.py tiles them ×3 from sf10 since r12).

Times each fact-reading headliner at sf10 and sf30 in ONE session
(min-of-2 after an untimed warm execution, the scale_probe
discipline) and reports the 3x-data growth ratio. Linear work should
show ratios ~<=3.5 (3x data + noise); anything past FLAG warrants a
stage decomposition. Results append to $FACT30_OUT (default
fact_sf30_results.txt) — never scraped from stdout (progress bars
corrupt piped lines).

Timing discipline: machine otherwise idle (CLAUDE.md host-noise
note).

Usage: python tools/fact_sf30_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(HERE, ".localdata", "sf10")
SF30 = os.path.join(HERE, ".localdata", "sf30")
FLAG = 4.5

# fact-reading benched entries: the TPC-H headliners + rollup, plus
# the heaviest events-table core shapes (events tile ×3 too)
DEFAULT_QUERIES = [
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q8", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q15",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21",
    "tpch_q22", "orders_rollup",
    "tumbling_window", "session_window", "interval_join",
    "twap_daily", "ts_similarity_topk",
]


def main() -> None:
    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.session import gc_hygiene, get_spark

    names = sys.argv[1:] or DEFAULT_QUERIES
    out_path = os.environ.get(
        "FACT30_OUT", os.path.join(HERE, "fact_sf30_results.txt"))
    spark = get_spark("fact_sf30_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    lines = [f"# fact_sf30_probe @ {time.strftime('%F %T')} "
             f"(min-of-2 after warm, one session)"]
    lines.append(f"{'query':22s} {'sf10':>8s} {'sf30':>8s} {'step':>6s}")
    for name in names:
        row = {}
        for sf_dir, tag in ((SF10, "sf10"), (SF30, "sf30")):
            try:
                # without this, dead checkpoint blocks from earlier
                # queries read as fake superlinear steps (q21 37.5 s
                # mid-session vs 14.8 s fresh — session.gc_hygiene)
                gc_hygiene(spark)
                run(REGISTRY[name](spark, sf_dir))  # warm (untimed)
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    run(REGISTRY[name](spark, sf_dir))
                    best = min(best, time.perf_counter() - t0)
                row[tag] = best
            except Exception as exc:
                row[tag] = None
                row[f"{tag}_err"] = f"{type(exc).__name__}: {exc}"[:160]
        if row.get("sf10") and row.get("sf30"):
            step = row["sf30"] / row["sf10"]
            flag = "  ⚠" if step > FLAG else ""
            lines.append(f"{name:22s} {row['sf10']:8.2f} {row['sf30']:8.2f} "
                         f"{step:5.1f}x{flag}")
        else:
            lines.append(f"{name:22s} ERROR {row}")
        print(lines[-1], file=sys.stderr, flush=True)

    with open(out_path, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# appended to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()

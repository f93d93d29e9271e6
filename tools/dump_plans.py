"""Dump `.explain("formatted")` for bench headliners to files.

Usage: python tools/dump_plans.py <out_dir> <tag> [sf_dir] [query ...]

Writes <out_dir>/<query>_<tag>.txt for each query (default: the
30-query headline set). The r12 optimization round commits
plans/r12/<query>_before.txt (generated at the r11 snapshot) and
..._after.txt (at the round's final HEAD) so plan-shape claims in
OPTIMIZATION_r12.md are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    out_dir = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    from bench import HEADLINERS
    names = sys.argv[4:] or list(HEADLINERS)
    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()

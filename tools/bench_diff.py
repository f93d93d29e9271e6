"""Per-query delta between the last two bench_history.jsonl entries
(optionally: between two entries chosen by index, newest = -1).

Usage:
    python tools/bench_diff.py            # last two runs at the same sf
    python tools/bench_diff.py -3 -1      # explicit indices
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_history.jsonl",
    )
    if not os.path.exists(path):
        print("no bench_history.jsonl yet — run bench.py first")
        return
    with open(path) as fh:
        runs = [json.loads(line) for line in fh if line.strip()]
    if len(sys.argv) >= 3:
        a, b = runs[int(sys.argv[1])], runs[int(sys.argv[2])]
    else:
        b = runs[-1]
        prev = [r for r in runs[:-1] if r.get("sf") == b.get("sf")]
        if not prev:
            print(f"only one run at sf={b.get('sf')} — nothing to diff")
            return
        a = prev[-1]
    for r, tag in ((a, "base"), (b, "new")):
        flag = "" if r.get("valid", True) else "  [INVALID: errors]"
        print(f"{tag}: commit={r.get('commit')} sf={r.get('sf')} "
              f"total={r.get('value')}s{flag}")
    qa, qb = a.get("queries", {}), b.get("queries", {})
    rows = []
    for name in sorted(set(qa) | set(qb)):
        ta, tb = qa.get(name), qb.get(name)
        if ta is None or tb is None:
            rows.append((float("inf"), name, ta, tb, "added" if ta is None else "REMOVED"))
        else:
            rows.append((tb - ta, name, ta, tb, f"{tb - ta:+.3f}"))
    rows.sort(reverse=True)
    print(f"{'query':28} {'base':>8} {'new':>8} {'delta':>8}")
    for _, name, ta, tb, d in rows:
        print(f"{name:28} {ta if ta is not None else '-':>8} "
              f"{tb if tb is not None else '-':>8} {d:>8}")
    for side, r in (("base", a), ("new", b)):
        s = r.get("streaming") or {}
        if s:
            print(f"{side} streaming: stateless={s.get('processed_rows_per_sec')} "
                  f"stateful={s.get('stateful_processed_rows_per_sec')} rows/s")


if __name__ == "__main__":
    main()

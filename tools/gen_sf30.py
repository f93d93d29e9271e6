"""Generate a local sf30 DOCUMENTS corpus — third-decade spot
evidence, cheap form (VERDICT r9 item 8).

A full sf100 tiling is oversized for this host (the second decade is
already 2.3 GB across 10 tables), and the r9/r10 verdict loop only
needs the third-decade step for the steepest TEXT survivors
(ngram_novelty, dedup_clusters) plus oracle spot-checks — all of
which read only the ``documents`` table. So this tool tiles
``.localdata/sf10/documents.parquet`` ×3 into
``.localdata/sf30/documents.parquet`` (~1.5 M docs) and nothing
else; tools/scale_probe.py and the spot-check commands point at the
directory explicitly.

Level-3 decorrelation must differ from gen_sf1's 'e'→'q{i}' and
gen_sf10's 'a'→'x{j}' (reusing either would no-op on the already-
rewritten copies and mint exact cross-copy twins), and the rewritten
letter must be UNIVERSAL in the source corpus — a doc not containing
it is byte-identical across copies, silently inflating the dup rate
(a first cut used 'i'; ~1% of sf10 docs lack it, which tripled the
corpus dup rate 0.16% → 0.80%). Measured: every sf10 doc contains
'o', so copies 1-2 rewrite 'o' → 'z{k}'. Identical source texts
still map to identical outputs, so the within-copy duplicate
structure (the organic dup rate the dedup family's cost laws ride
on) is preserved exactly — the post-generation check FAILS if the
rate moved.

Usage: python tools/gen_sf30.py [out_dir]   (~1 GB, ~a minute)
"""

from __future__ import annotations

import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(HERE, ".localdata", "sf10")
DEFAULT_OUT = os.path.join(HERE, ".localdata", "sf30")
COPIES = 3


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    src = os.path.join(SRC, "documents.parquet")
    if not os.path.isfile(src):
        raise SystemExit("gen_sf30: build .localdata/sf10 first (tools/gen_sf10.py)")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    stride = con.sql(
        f"select max(doc_id) + 1 from read_parquet('{src}')"
    ).fetchone()[0]
    cols = [
        r[0] for r in con.sql(
            f"describe select * from read_parquet('{src}')"
        ).fetchall()
    ]
    parts = []
    for k in range(COPIES):
        sel = []
        for c in cols:
            if c == "doc_id":
                sel.append(f"doc_id + {k * stride} as doc_id")
            elif c == "text" and k > 0:
                sel.append(f"replace(text, 'o', 'z{k}') as text")
            else:
                sel.append(c)
        parts.append(
            f"select {', '.join(sel)} from read_parquet('{src}')"
        )
    q = " union all ".join(parts)
    con.sql(f"copy ({q}) to '{out}/documents.parquet' (format parquet)")
    n, dups = con.sql(
        f"select count(*), count(*) - count(distinct md5(text)) "
        f"from read_parquet('{out}/documents.parquet')"
    ).fetchone()
    n0, d0 = con.sql(
        f"select count(*), count(*) - count(distinct md5(text)) "
        f"from read_parquet('{src}')"
    ).fetchone()
    print(f"documents: {n} rows; exact-dup rows {dups} ({dups / n:.4%}; "
          f"source rate {d0 / n0:.4%})")
    if abs(dups / n - d0 / n0) > 1e-9:
        raise SystemExit(
            "gen_sf30: tiled dup rate differs from the source rate — "
            "the level-3 rewrite minted (or destroyed) cross-copy "
            "twins; pick a transform that is total on the corpus"
        )


if __name__ == "__main__":
    main()

"""Generate a local sf1 dataset for the scale probe (NOT driver data).

/root/testdata tops out at sf0.1; superlinear growth (pair blowups,
window skew) often only shows one decade up. This tool tiles sf0.1
ten times into ``.localdata/sf1`` (gitignored), each copy a
self-contained key universe:

- every table-primary key and FK *between tiled tables* is shifted
  by ``copy × (max_key+1)`` — join fan-outs and selectivities are
  preserved exactly, dimension cardinalities grow 10× (the same
  growth the driver data shows from sf0.01 → sf0.1);
- ``region``/``nation`` stay fixed (driver keeps them constant, like
  TPC-H);
- ``documents``: copies 1-9 get a per-copy suffix token so the
  corpus-wide duplicate RATE stays at sf0.1's level instead of every
  doc gaining 9 exact twins (which would change the dedup workload's
  character, not just its size); within-copy duplicate structure is
  untouched;
- ``embeddings`` tile ×4 (driver growth sf0.01→sf0.1 was ×4), with a
  tiny per-copy first-element perturbation so exact-tie top-k
  degeneracy doesn't distort ANN timings;
- ``events`` timestamps keep the same one-month span — density
  grows, as it does between the driver SFs.

Usage: python tools/gen_sf1.py [out_dir]   (~170 MB, <1 min)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".localdata", "sf1",
)
COPIES = 10
EMB_COPIES = 4

# table -> {column: shift-stride expression input}; stride = max+1 of
# the owning table so each copy is disjoint
SHIFTS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "customer")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supplier")],
    "events": [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

KEY_OF = {
    "customer": "c_custkey", "orders": "o_orderkey", "part": "p_partkey",
    "supplier": "s_suppkey", "events": "event_id", "events_user": "user_id",
    "documents": "doc_id", "embeddings": "vec_id",
}
TABLE_OF = {"events_user": "events"}  # stride source lives elsewhere

COPY_AS_IS = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides = {
        name: con.sql(
            f"select max({KEY_OF[name]}) + 1 from "
            f"read_parquet('{SRC}/{TABLE_OF.get(name, name)}.parquet')"
        ).fetchone()[0]
        for name in KEY_OF
    }

    for tbl in COPY_AS_IS:
        con.sql(
            f"copy (select * from read_parquet('{SRC}/{tbl}.parquet')) "
            f"to '{out}/{tbl}.parquet' (format parquet)"
        )
        print(f"{tbl}: copied")

    for tbl, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"describe select * from read_parquet('{SRC}/{tbl}.parquet')"
            ).fetchall()
        ]
        copies = EMB_COPIES if tbl == "embeddings" else COPIES
        parts = []
        for i in range(copies):
            sel = []
            for c in cols:
                shifted = next(
                    (s for col, s in shifts if col == c), None
                )
                if shifted is not None:
                    sel.append(f"{c} + {i * strides[shifted]} as {c}")
                elif tbl == "supplier" and c == "s_name":
                    # names are key-derived in the driver data
                    # (Supplier#%09d, unique per key); tiling the key
                    # without the name left 10 suppliers per name and
                    # broke every name-is-unique assumption one decade
                    # up (tpch_q21's oracle grouped by s_name — r6)
                    sel.append(
                        f"printf('Supplier#%09d', "
                        f"s_suppkey + {i * strides['supplier']}) as s_name"
                    )
                elif tbl == "customer" and c == "c_name":
                    sel.append(
                        f"printf('Customer#%09d', "
                        f"c_custkey + {i * strides['customer']}) as c_name"
                    )
                elif tbl == "documents" and c == "text" and i > 0:
                    # per-copy character substitution rewrites most
                    # words, so cross-copy shingle overlap collapses
                    # (a mere suffix token left copies at jaccard
                    # ≈0.98 — every doc became a near-dup of its 9
                    # twins and the dedup workload stopped resembling
                    # the driver's organic ~0.1% dup rate). Identical
                    # source texts map to identical outputs, so the
                    # WITHIN-copy duplicate structure is preserved.
                    sel.append(f"replace(text, 'e', 'q{i}') as text")
                elif tbl == "embeddings" and c == "embedding" and i > 0:
                    # circular rotation: orthogonal, so intra-copy
                    # geometry (norms, pairwise cosines) is exactly
                    # preserved while cross-copy cosines decorrelate
                    # (a tiny first-element nudge kept copies at
                    # cosine ≈0.999996 — quadratic cross-copy dup
                    # pairs the real corpus wouldn't have)
                    k = 16 * i
                    sel.append(
                        f"embedding[{k + 1}:] || embedding[1:{k}] as embedding"
                    )
                else:
                    sel.append(c)
            parts.append(
                f"select {', '.join(sel)} from "
                f"read_parquet('{SRC}/{tbl}.parquet')"
            )
        q = " union all ".join(parts)
        con.sql(f"copy ({q}) to '{out}/{tbl}.parquet' (format parquet)")
        n = con.sql(
            f"select count(*) from read_parquet('{out}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()

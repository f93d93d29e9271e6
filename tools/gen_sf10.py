"""Generate a local sf10 dataset — the SECOND decade up (r9, VERDICT
item 1). Tiles ``.localdata/sf1`` (built by tools/gen_sf1.py) ten
times into ``.localdata/sf10`` with the same key-tiling discipline:
key/FK shifts by copy × (max_key+1) preserve join fan-outs and
selectivities exactly; region/nation stay fixed; events keep the
one-month span (density grows).

The per-copy DECORRELATION transforms must differ from gen_sf1's —
reusing them would create exact cross-copy twins one level up:

- documents: gen_sf1 rewrote 'e' → 'q{i}'. A second 'e' pass would be
  a no-op on copies 1-9 (no 'e' left), so level 2 rewrites 'a' →
  'x{j}' — again most words change, cross-copy shingle overlap
  collapses, and identical source texts map to identical outputs so
  the within-copy (and within-sf1) duplicate structure is preserved.
  The corpus-wide dup RATE therefore stays at the organic level
  instead of every doc gaining 9 exact twins.
- embeddings: gen_sf1 used circular rotations (stride 16 on dim 64 —
  only 4 distinct rotations exist, so a second rotation level would
  alias: rot16∘rot0 == rot0∘rot16 ⇒ exact duplicate vectors under
  different vec_ids, breaking the ANN/IVF identity precondition).
  Level 2 composes a Walsh-style SIGN FLIP with a stride-8 rotation:
  copy j applies rot_{8j} then negates the dims whose bit (j-1) of
  the 0-based index is set. Both factors are orthogonal (norms and
  intra-copy pairwise cosines exactly preserved); the composite
  family flip_j∘rot_{8j+16i} over both tiling levels is injective in
  (i, j), so no two copies ever share a transform (no exact twins).
  Flips alone left a fat cross-copy tail (1.25% of same-base pairs
  above COSINE_TAU=0.4, max 0.64 — measured); adding the rotation
  de-aligns the per-dim mass pattern first and cuts the tail (the
  post-generation check below prints it). Embeddings tile ×4 per
  decade (the driver's own growth rate), like gen_sf1.

Usage: python tools/gen_sf10.py [out_dir]   (~2.4 GB, a few minutes)
"""

from __future__ import annotations

import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(HERE, ".localdata", "sf1")
DEFAULT_OUT = os.path.join(HERE, ".localdata", "sf10")
COPIES = 10
EMB_COPIES = 4

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
TABLE_OF = {"events_user": "events"}
COPY_AS_IS = ["region", "nation"]


def _flip_mask(j: int) -> str:
    """DuckDB predicate over 1-based dim ``d``: negate where bit
    (j-1) of the 0-based dim index is set (Walsh mask)."""
    return f"((d - 1) // {1 << (j - 1)}) % 2 = 1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    if not os.path.isdir(SRC):
        raise SystemExit("gen_sf10: build .localdata/sf1 first (tools/gen_sf1.py)")
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
                shifted = next((s for col, s in shifts if col == c), None)
                if shifted is not None:
                    sel.append(f"{c} + {i * strides[shifted]} as {c}")
                elif tbl == "supplier" and c == "s_name":
                    # key-derived unique names, same reason as gen_sf1
                    # (tpch_q21 groups by s_name — must stay unique)
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
                    sel.append(f"replace(text, 'a', 'x{i}') as text")
                elif tbl == "embeddings" and c == "embedding" and i > 0:
                    k = 8 * i
                    rot = f"(embedding[{k + 1}:] || embedding[1:{k}])"
                    sel.append(
                        f"list_transform(range(1, len(embedding) + 1), "
                        f"d -> case when {_flip_mask(i)} then -{rot}[d] "
                        f"else {rot}[d] end) as embedding"
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

    # post-generation corpus checks: the decade-step measurements are
    # only honest if the tiled corpus keeps organic dup structure
    dup = con.sql(
        f"select count(*), count(*) - count(distinct md5(text)) "
        f"from read_parquet('{out}/documents.parquet')"
    ).fetchone()
    print(f"docs exact-dup rows: {dup[1]}/{dup[0]} ({dup[1] / dup[0]:.4%} — "
          "must match sf1's rate)")
    edup = con.sql(
        f"select count(*) - count(distinct embedding::varchar) "
        f"from read_parquet('{out}/embeddings.parquet')"
    ).fetchone()[0]
    print(f"exact-duplicate embeddings: {edup} (must be 0)")
    stride = strides["embeddings"]
    tail = con.sql(f"""
        with e as (select vec_id, embedding
                   from read_parquet('{out}/embeddings.parquet')),
        pairs as (
          select list_reduce(list_transform(range(1, len(a.embedding)+1),
                   d -> a.embedding[d]::double * b.embedding[d]::double),
                   (x,y)->x+y)
            / (sqrt(list_reduce(list_transform(range(1, len(a.embedding)+1),
                   d -> a.embedding[d]::double * a.embedding[d]::double),
                   (x,y)->x+y))
             * sqrt(list_reduce(list_transform(range(1, len(b.embedding)+1),
                   d -> b.embedding[d]::double * b.embedding[d]::double),
                   (x,y)->x+y))) as cos
          from e a join e b on b.vec_id % {stride} = a.vec_id
                           and b.vec_id >= {stride}
          where a.vec_id < 2000
        )
        select count(*), count(*) filter (where cos >= 0.4), max(cos)
        from pairs
    """).fetchone()
    print(f"cross-copy same-base cosine tail: {tail[1]}/{tail[0]} pairs "
          f">= 0.4, max {tail[2]:.3f} (r9 HEAD: 4/6000, max 0.464 — "
          "residual organic-scale noise, vs 75/6000 max 0.636 for "
          "flips without the rotation)")


if __name__ == "__main__":
    main()

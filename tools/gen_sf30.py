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

    # ---- embeddings ×3 (r10: third-decade rows for the similarity
    # family after its kernel rewrites). Level-3 transforms must not
    # alias the level-1 rotations (16i) or level-2 flip∘rot_{8j}
    # composites — REVERSAL is an orientation-reversing permutation
    # no rotation can express, so rev-family ∘ rot-family is disjoint
    # from rot-family by construction: copy 1 = reverse + flip bit 3,
    # copy 2 = reverse∘rot_4 + flip bit 4. All factors orthogonal
    # (norms and intra-copy cosines exactly preserved); the empirical
    # post-checks below (exact-twin count, cross-copy cosine tail)
    # fail the build if any composite aliases anyway.
    esrc = os.path.join(SRC, "embeddings.parquet")
    estride = con.sql(
        f"select max(vec_id) + 1 from read_parquet('{esrc}')"
    ).fetchone()[0]
    ecols = [
        r[0] for r in con.sql(
            f"describe select * from read_parquet('{esrc}')"
        ).fetchall()
    ]
    eparts = []
    for k in range(COPIES):
        sel = []
        for c in ecols:
            if c == "vec_id":
                sel.append(f"vec_id + {k * estride} as vec_id")
            elif c == "embedding" and k > 0:
                base = "list_reverse(embedding)"
                if k == 2:
                    base = f"({base}[5:] || {base}[1:4])"
                flip_bit = 1 << (2 + k)  # bits 3, 4 — unused by levels 1-2
                sel.append(
                    f"list_transform(range(1, len(embedding) + 1), "
                    f"d -> case when ((d - 1) & {flip_bit}) != 0 "
                    f"then -{base}[d] else {base}[d] end) as embedding"
                )
            else:
                sel.append(c)
        eparts.append(f"select {', '.join(sel)} from read_parquet('{esrc}')")
    eq = " union all ".join(eparts)
    con.sql(f"copy ({eq}) to '{out}/embeddings.parquet' (format parquet)")
    en, edup = con.sql(
        f"select count(*), count(*) - count(distinct embedding::varchar) "
        f"from read_parquet('{out}/embeddings.parquet')"
    ).fetchone()
    print(f"embeddings: {en} rows; exact twins {edup} (must be 0)")
    if edup:
        raise SystemExit("gen_sf30: level-3 embedding transform aliased")
    tail = con.sql(f"""
        with e as (select vec_id, embedding
                   from read_parquet('{out}/embeddings.parquet')),
        pairs as (
          select list_reduce(list_transform(range(1, len(a.embedding)+1),
                   d -> a.embedding[d]::double * b.embedding[d]::double),
                 (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(range(1, len(a.embedding)+1),
                   d -> a.embedding[d]::double * a.embedding[d]::double),
                 (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(range(1, len(b.embedding)+1),
                   d -> b.embedding[d]::double * b.embedding[d]::double),
                 (x, y) -> x + y))) as cos
          from e a join e b
            on a.vec_id % {estride} = b.vec_id % {estride}
           and a.vec_id < b.vec_id)
        select count(*) filter (cos >= 0.4), max(cos), count(*) from pairs
    """).fetchone()
    print(f"cross-copy same-base pairs: {tail[2]}, ≥0.4 tail {tail[0]} "
          f"({tail[0] / max(tail[2], 1):.4%}), max {tail[1]:.3f}")

    # ---- TPC-H fact family ×3 (r12, VERDICT r11 item 1: the fact
    # tables had no third-decade row). Pure key tiling with gen_sf10's
    # shift discipline — key/FK shifts by copy × (max_key+1) preserve
    # join fan-outs and selectivities exactly; region/nation stay
    # fixed; events keep the one-month span (density grows). No text
    # decorrelation is needed: the TPC-H family joins and aggregates
    # on keys/measures, never on content similarity.
    fact_shifts: dict[str, list[tuple[str, str]]] = {
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
    }
    key_of = {
        "customer": "c_custkey", "orders": "o_orderkey",
        "part": "p_partkey", "supplier": "s_suppkey",
        "events": "event_id", "events_user": "user_id",
    }
    table_of = {"events_user": "events"}
    fstrides = {
        name: con.sql(
            f"select max({key_of[name]}) + 1 from read_parquet("
            f"'{SRC}/{table_of.get(name, name)}.parquet')"
        ).fetchone()[0]
        for name in key_of
    }
    for tbl in ("region", "nation"):
        con.sql(
            f"copy (select * from read_parquet('{SRC}/{tbl}.parquet')) "
            f"to '{out}/{tbl}.parquet' (format parquet)"
        )
        print(f"{tbl}: copied")
    for tbl, shifts in fact_shifts.items():
        fsrc = os.path.join(SRC, f"{tbl}.parquet")
        fcols = [
            r[0] for r in con.sql(
                f"describe select * from read_parquet('{fsrc}')"
            ).fetchall()
        ]
        fparts = []
        for i in range(COPIES):
            sel = []
            for c in fcols:
                shifted = next((s for col, s in shifts if col == c), None)
                if shifted is not None:
                    sel.append(f"{c} + {i * fstrides[shifted]} as {c}")
                elif tbl == "supplier" and c == "s_name":
                    # tpch_q21 groups by s_name — must stay unique
                    sel.append(
                        f"printf('Supplier#%09d', "
                        f"s_suppkey + {i * fstrides['supplier']}) as s_name"
                    )
                elif tbl == "customer" and c == "c_name":
                    sel.append(
                        f"printf('Customer#%09d', "
                        f"c_custkey + {i * fstrides['customer']}) as c_name"
                    )
                else:
                    sel.append(c)
            fparts.append(
                f"select {', '.join(sel)} from read_parquet('{fsrc}')"
            )
        fq = " union all ".join(fparts)
        con.sql(f"copy ({fq}) to '{out}/{tbl}.parquet' (format parquet)")
        fn = con.sql(
            f"select count(*) from read_parquet('{out}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {fn} rows")


if __name__ == "__main__":
    main()

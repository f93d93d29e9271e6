"""Adversarial probe-corpus builders — the r6 campaign, reproducible.

Generates every documented probe class (SURVEY §7f table) as a
schema-matched parquet corpus under ``.localdata/probes/<class>/``.
Each class either caught a real Spark-vs-DuckDB divergence in r6 or
pins a contract (CLAUDE.md invariant 17); ``tools/probe_sweep.py``
(or ``make probes``) runs the full oracle gate over each.

Usage:
    python tools/gen_probes.py [--out DIR] [--src SF_DIR] [class ...]

Authoring gotchas (cost two false alarms in r6): DuckDB bare decimal
literals (``100.00``) write DECIMAL parquet columns — always cast
``::double``; ``label`` is INTEGER; keep every source column via
``select * replace (...)`` so schema drift can't hide behind a probe.
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

SRC_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Each class maps table -> SELECT body (over the source parquet, aliased t).
# Tables not listed copy through unchanged. `None` body = empty table.
# ---------------------------------------------------------------------------


def _shift_events(seconds: str) -> dict:
    return {
        "events": f"select * replace (ts + interval (({seconds})) second as ts) from t",
    }


CLASSES: dict[str, dict] = {
    # --- degenerate sizes -------------------------------------------------
    "empty": {tbl: None for tbl in TABLES},
    "onerow": {tbl: "select * from t limit 1" for tbl in TABLES},
    # --- NULL injection ---------------------------------------------------
    "null_text": {
        "documents": (
            "select * replace ("
            " case when doc_id % 10 = 3 then NULL else text end as text,"
            " case when doc_id % 17 = 5 then NULL else lang end as lang)"
            " from t"
        ),
        "embeddings": (
            "select * replace ("
            " case when vec_id % 11 = 7 then NULL else embedding end"
            " as embedding) from t"
        ),
    },
    "null_facts": {
        # NULL join keys + NULL measures in every fact table: keys must
        # never equi-join / asof-match (r6: asof_join matched NULL keys);
        # NULL measures must not be carried by per-value fills
        "orders": (
            "select * replace ("
            " case when o_orderkey % 13 = 4 then NULL else o_custkey end as o_custkey,"
            " case when o_orderkey % 11 = 6 then NULL else o_totalprice end"
            " as o_totalprice) from t"
        ),
        "lineitem": (
            "select * replace ("
            " case when l_orderkey % 17 = 3 then NULL else l_partkey end as l_partkey,"
            " case when l_orderkey % 13 = 5 then NULL else l_quantity end as l_quantity,"
            " case when l_orderkey % 19 = 7 then NULL else l_extendedprice end"
            " as l_extendedprice) from t"
        ),
        "events": (
            "select * replace ("
            " case when event_id % 13 = 2 then NULL else user_id end as user_id,"
            " case when event_id % 11 = 4 then NULL else value end as value,"
            " case when event_id % 23 = 6 then NULL else event_type end"
            " as event_type) from t"
        ),
    },
    "null_ts": {
        # NULL event times + NULL date columns: every window/session/
        # asof/gapfill operator and date-filtered TPC-H query must
        # agree with the oracle on where NULL instants go (grouped?
        # dropped? own partition?) — never probed before r7
        "events": (
            "select * replace ("
            " case when event_id % 9 = 2 then NULL else ts end as ts)"
            " from t"
        ),
        "orders": (
            "select * replace ("
            " case when o_orderkey % 11 = 3 then NULL else o_orderdate end"
            " as o_orderdate) from t"
        ),
        "lineitem": (
            "select * replace ("
            " case when l_orderkey % 13 = 4 then NULL else l_shipdate end"
            " as l_shipdate) from t"
        ),
    },
    "exotic_ws": {
        # invariant 14's divergence class: Java \s includes \x0B,
        # RE2/DuckDB's does not; U+00A0/U+2003 are non-ASCII spaces.
        # Tokenizers must split identically on every engine — the
        # explicit WS_PATTERN classes are the contract under test
        "documents": (
            "select * replace (case doc_id % 6"
            " when 0 then replace(text, ' ', chr(11))"       # vertical tab
            " when 1 then replace(text, ' ', chr(9))"        # tab
            " when 2 then replace(text, ' ', chr(13) || chr(10))"  # crlf
            " when 3 then replace(text, ' ', chr(160))"      # nbsp U+00A0
            " when 4 then replace(text, ' ', chr(8195))"     # em space U+2003
            " else text end as text) from t"
        ),
    },
    "all_null_cols": {
        # ENTIRE columns NULL (vs the partial-NULL classes): zero
        # finite groups, an empty vocabulary, no embeddable vectors.
        # Catches group-vanishing and empty-domain divergences that
        # partial NULLs can't (some group always survives there)
        "documents": (
            "select * replace ("
            " NULL::varchar as text, NULL::varchar as lang,"
            " NULL::varchar as source) from t"
        ),
        "embeddings": (
            "select * replace (NULL::float[] as embedding) from t"
        ),
        "events": (
            "select * replace (NULL::varchar as event_type,"
            " NULL::double as value) from t"
        ),
    },
    "nonfinite": {
        # IEEE specials in measures: NaN/±Inf land in real corpora
        # via parser junk and upstream overflow. Sum/round/sort/
        # group/percentile behavior must agree with the oracle
        # wherever a non-finite value flows
        "events": (
            "select * replace ("
            " case when event_id % 19 = 3 then 'NaN'::double"
            "      when event_id % 23 = 5 then 'Infinity'::double"
            "      when event_id % 29 = 7 then '-Infinity'::double"
            " else value end as value) from t"
        ),
        "lineitem": (
            "select * replace ("
            " case when l_orderkey % 31 = 3 then 'NaN'::double"
            " else l_quantity end as l_quantity,"
            " case when l_orderkey % 37 = 5 then 'Infinity'::double"
            " else l_extendedprice end as l_extendedprice) from t"
        ),
    },
    "dup_rows": {
        # every table unioned with itself: byte-identical duplicate
        # rows break every "unique key" assumption at once —
        # duplicate (ts, event_id) sort ties, duplicate doc_ids into
        # the dedup keepers, doubled join fan-out. Identical rows
        # make tie order immaterial (any permutation yields the same
        # multiset), so engines must agree everywhere
        tbl: "select * from t union all select * from t"
        for tbl in TABLES
    },
    "huge_values": {
        # finite but out-of-domain magnitudes (1e12..1e300): beyond
        # |x| ~ 1e9 the micros hi/lo recovery turns ambiguous, and
        # floor(1e300) overflows a long asymmetrically between
        # engines — the domain guard must raise on BOTH instead
        "events": (
            "select * replace ("
            " case when event_id % 19 = 3 then 1e12"
            "      when event_id % 23 = 5 then -1e15"
            "      when event_id % 29 = 7 then 1e300"
            " else value end as value) from t"
        ),
        "lineitem": (
            "select * replace ("
            " case when l_orderkey % 31 = 3 then 1e13"
            " else l_quantity end as l_quantity,"
            " case when l_orderkey % 37 = 5 then -1e300"
            " else l_extendedprice end as l_extendedprice) from t"
        ),
    },
    # --- timestamp quantization (boundary + tie collisions) --------------
    "ts_quant60": {
        "events": (
            "select * replace (to_timestamp(60 * (epoch(ts)::bigint // 60)) as ts)"
            " from t"
        ),
    },
    "ts_quant3600": {
        "events": (
            "select * replace (to_timestamp(3600 * (epoch(ts)::bigint // 3600)) as ts)"
            " from t"
        ),
    },
    # --- epoch-domain shifts ---------------------------------------------
    "pre1970": _shift_events("-60 * 365.25 * 86400"),
    "post2100": _shift_events("200 * 365.25 * 86400"),
    # --- text degeneracy --------------------------------------------------
    "identical_docs": {
        "documents": (
            "select cast(range as bigint) as doc_id,"
            " (select text from t limit 1) as text,"
            " (select lang from t limit 1) as lang,"
            " (select source from t limit 1) as source,"
            " (select n_chars from t limit 1) as n_chars"
            " from range(5000)"
        ),
    },
    "degenerate_text": {
        "documents": (
            "select * replace (case doc_id % 7"
            " when 0 then ''"
            " when 1 then '...!!!???'"
            " when 2 then '   '"
            " when 3 then '---- ____ ++++'"
            " else text end as text) from t"
        ),
        "events": (
            "select * replace ((case when event_id % 3 = 0 then -value"
            " else value end)::double as value) from t"
        ),
    },
    "unicode": {
        "documents": (
            "select * replace (case doc_id % 6"
            " when 0 then 'İstanbul DİYARBAKIR kiosk İ ' || text"
            " when 1 then 'Ελληνικά κείμενο μικρό ' || text"
            " when 2 then 'Кириллица тест причём ' || text"
            " when 3 then '🎉 emoji 🚀 soup 🌍 ' || text"
            " when 4 then 'ｆｕｌｌｗｉｄｔｈ　ｔｅｘｔ ' || text"
            " else text end as text) from t"
        ),
    },
    # --- domain extremes --------------------------------------------------
    "big_ids": {
        "documents": (
            "select * replace ((doc_id + (1::bigint << 62)) as doc_id) from t"
        ),
    },
    # r13 class: NEGATIVE ids, order-reversed (x → -(x+1), so 0→-1,
    # 1→-2 — distinctness preserved, id ORDER exactly reversed).
    # Stresses every "survivor/cluster = min id" tie rule, id1<id2
    # pair canonicalization, id-derived keys (span keys doc_id·MUL +
    # pos, salts, LSH bucket members), and any id arithmetic where
    # Spark's `div`/`%` (truncate toward zero) could diverge from
    # DuckDB's `//` (floor) — the engines only agree on non-negative
    # operands (the micros-sum helpers already guard this; id paths
    # were never probed). Scoped to the LLM-pipeline tables; TPC-H
    # keys are FK-coupled across 7 tables and stay positive.
    "negative_ids": {
        "documents": "select * replace (-(doc_id + 1) as doc_id) from t",
        "embeddings": "select * replace (-(vec_id + 1) as vec_id) from t",
        "events": (
            "select * replace (-(event_id + 1) as event_id,"
            " -(user_id + 1) as user_id) from t"
        ),
    },
    "const_values": {
        # maximal aggregate-value ties: every tiebreaker must hold
        "lineitem": (
            "select * replace (10.0::double as l_quantity,"
            " 100.0::double as l_extendedprice, 0.05::double as l_discount,"
            " 0.03::double as l_tax) from t"
        ),
        "orders": "select * replace (1000.0::double as o_totalprice) from t",
        "events": "select * replace (5.0::double as value) from t",
    },
    "card1_dims": {
        "documents": (
            "select * replace ('en' as lang, 'src0' as source) from t"
        ),
        "events": "select * replace ('click' as event_type) from t",
        "embeddings": "select * replace (0 as label) from t",
        "customer": "select * replace ('BUILDING' as c_mktsegment) from t",
    },
    "hot_keys": {
        # fact-join skew: 90% of lineitem rows land on ONE orderkey
        # and 90% of events on ONE user — the shape AQE skew-join and
        # the salted aggregation paths exist for; also duplicates the
        # hot orderkey across orders-side join probes
        "lineitem": (
            "select * replace ("
            " case when l_linenumber % 10 != 0 then 1::bigint"
            " else l_orderkey end as l_orderkey) from t"
        ),
        "events": (
            "select * replace ("
            " case when event_id % 10 != 0 then 1::bigint"
            " else user_id end as user_id) from t"
        ),
    },
    # --- physical row order ------------------------------------------------
    "row_shuffle": {
        # SAME rows, permuted physical order (md5 keyed on the ROW
        # CONTENT — byte-stable across regenerations regardless of
        # DuckDB's scan parallelism; a row_number() over () key was
        # not, since unordered window numbering has no defined
        # order): every catalog query must be ORDER-INDEPENDENT of
        # its input layout. Catches collect_list/array outputs built
        # in arrival order, unpinned sort tie-breaks, and anything
        # leaning on parquet row order — at 100 TB input order is
        # whatever the lake's compaction left behind. Both engines
        # read the same permuted files, so any divergence vs the
        # UNSHUFFLED baseline (or between engines) is a real order
        # dependence. Duplicate-content rows tie under the content
        # key — harmless, they are indistinguishable.
        tbl: (
            "select * from (select * from t) q"
            " order by md5('rs:' || q::varchar)"
        )
        for tbl in TABLES
    },
    # --- degenerate vectors -------------------------------------------------
    "zero_norm": {
        # all-zero embeddings on every 10th vector (superset of the
        # %50/%20 probe-id sets, so zero vectors land on BOTH join
        # sides of the ANN paths): cosine is undefined for a
        # zero-norm vector — the similarity family must DROP them at
        # entry on both engines (r9 contract; previously a 0/0 that
        # raises under Spark ANSI while DuckDB NULL-ranks), while
        # quantize/dim-stats style per-element ops must keep them
        # with well-defined outputs (amax=0 → q=0).
        "embeddings": (
            "select * replace ("
            " case when vec_id % 10 = 0 then"
            "  list_transform(embedding, x -> cast(0.0 as float))"
            " else embedding end as embedding) from t"
        ),
    },
    "ragged_dims": {
        # MIXED embedding dimensionality (every 13th vector truncated
        # to 32 of 64 dims): re-embedding drift and partial-write
        # corruption both produce this. A ragged vector has a
        # self-consistent norm, so entry filters pass it; the Arrow
        # kernels then RAISE the targeted stack_f64 error naming the
        # offending ids (deliberately STRICTER than the JVM/SQL
        # folds, whose zip semantics silently NULL the mismatched
        # pairs — r10 contract, kernel docstrings) while pure-JVM
        # and per-element paths stay engine-identical.
        "embeddings": (
            "select * replace ("
            " case when vec_id % 13 = 4 then embedding[1:32]"
            " else embedding end as embedding) from t"
        ),
    },
    "nonfinite_vec": {
        # IEEE specials inside embedding COMPONENTS (the nonfinite
        # class covers scalar measures only): parser junk and
        # upstream overflow land in vector columns too. A NaN/±Inf
        # component makes the norm non-finite — both engines rank
        # NaN greatest, so unfiltered it wins every top-k — and the
        # per-element ops (quantize/dim-stats) must keep such rows
        # with engine-identical outputs or exclude them identically
        "embeddings": (
            "select * replace ("
            " case when vec_id % 19 = 3 then"
            "  [case when i = 1 then 'NaN'::float"
            "   else embedding[i] end for i in range(1, len(embedding)+1)]"
            " when vec_id % 23 = 5 then"
            "  [case when i = 2 then 'Infinity'::float"
            "   else embedding[i] end for i in range(1, len(embedding)+1)]"
            " when vec_id % 29 = 7 then"
            "  [case when i = 3 then '-Infinity'::float"
            "   else embedding[i] end for i in range(1, len(embedding)+1)]"
            " else embedding end as embedding) from t"
        ),
    },
    # --- pathological single rows ------------------------------------------
    "giant_doc": {
        # ONE ~10^7-token document (5M distinct tokens + a 5M-token
        # single-token run) appended to the normal corpus (r10 verdict
        # item 6): every per-doc explode (shingles, spans, grams,
        # winnowing windows) fans this row out ~10^7×, every
        # whole-doc array op (sort/run-length folds) builds a
        # ~10^7-element array in ONE task, and the run stresses
        # run-length/repetition folds — each path must finish within
        # task memory or raise its documented domain guard; nothing
        # may silently truncate. The distinct-token half keeps LSH/
        # df-cap paths honest (10M distinct shingles from one doc);
        # the run half collapses to 2 distinct shingles, so the
        # minhash family sees both extremes in one row. DuckDB
        # compares are out (probe_sweep.SPARK_ONLY_CLASSES): its
        # list-value model takes 20-30 min per gram oracle over a
        # 10M-element token list and OOMs on the span oracle — a
        # real oracle-side bound this class discovered (r11). Since
        # r12 the gram/span-heavy names are oracle-compared anyway
        # via the bounded-memory Python twins (tools/text_oracle.py),
        # and the class's second find landed: the (mis-generated,
        # 20M-token) row sat on span_dedup's composite-key guard —
        # a legal document class at corpus scale — so SPAN_KEY_MUL
        # widened 1e6 -> 1e8.
        "documents": (
            "select * from t union all "
            "select doc_id, text, lang, source,"
            " length(text)::bigint as n_chars from ("
            "  select (select max(doc_id) + 1 from t) as doc_id,"
            # t(i) names the COLUMN: a bare table alias ('range(...) i')
            # makes unqualified i resolve to the ROW STRUCT, whose
            # varchar render injected 2 extra tokens per element —
            # the corpus was silently 20M tokens, not the documented
            # 10M (found when the r12 span-key widening traced the
            # span count; determinism across DuckDB versions matters
            # more than the accidental extra mass)
            "  (select string_agg('g' || i::varchar, ' ' order by i)"
            "   from range(1, 5000001) t(i))"
            "  || ' ' || repeat('r ', 4999999) || 'r' as text,"
            "  'en' as lang, 'giant' as source)"
        ),
    },
    # --- everything at once ----------------------------------------------
    "torture": {
        "documents": (
            "select * replace ("
            " (doc_id + (1::bigint << 61)) as doc_id,"
            " case when doc_id % 10 = 3 then NULL"
            "      when doc_id % 10 = 4 then ''"
            "      when doc_id % 10 = 5 then 'İstanbul 🎉 Ελληνικά ' || text"
            " else text end as text,"
            " case when doc_id % 17 = 5 then NULL else lang end as lang)"
            " from t"
        ),
        "embeddings": (
            "select * replace ("
            " case when vec_id % 11 = 7 then NULL else embedding end"
            " as embedding) from t"
        ),
        "events": (
            "select * replace ("
            " to_timestamp(60 * (epoch(ts)::bigint // 60)) as ts,"
            " case when event_id % 13 = 2 then NULL else user_id end as user_id,"
            " (case when event_id % 11 = 4 then NULL"
            "       when event_id % 3 = 0 then -value"
            " else value end)::double as value) from t"
        ),
        "lineitem": (
            "select * replace ("
            " case when l_orderkey % 17 = 3 then NULL else l_partkey end as l_partkey,"
            " case when l_orderkey % 13 = 5 then NULL else l_quantity end"
            " as l_quantity) from t"
        ),
    },
}


# --- adversarial SOURCE LAYOUT (r12, VERDICT r11 item 8) ----------------
# Same rows as the base corpus, pathological physical layout: the
# row-identity classes (row_shuffle) probe logical order independence,
# this one probes the SCAN seams — per-file task fan-out, empty part
# files, and many-tiny-row-group files. Every query must produce the
# base corpus's exact answers (value-preserving class, full oracle
# compare): a divergence here is a file-order dependence, an
# empty-split crash, or an Arrow chunk-boundary bug (the batch cousin
# of CLAUDE.md invariant 7's concat-all-chunks rule).
#   tiny:      one file per K rows (K=1 for documents — maximal file
#              fan-out) plus one ZERO-ROW part file in the directory;
#   rowgroups: a single file whose row groups hold K rows each.
LAYOUT_SPEC: dict[str, tuple[str, int]] = {
    "documents": ("tiny", 1),
    "events": ("tiny", 37),
    "lineitem": ("tiny", 101),
    "orders": ("rowgroups", 16),
    "embeddings": ("rowgroups", 8),
}


def _build_layout(d: str, src: str) -> None:
    import pyarrow.parquet as pq

    for tbl in TABLES:
        spec = LAYOUT_SPEC.get(tbl)
        tab = pq.read_table(f"{src}/{tbl}.parquet")
        if spec is None:
            pq.write_table(tab, f"{d}/{tbl}.parquet")
            continue
        kind, k = spec
        if kind == "rowgroups":
            pq.write_table(tab, f"{d}/{tbl}.parquet", row_group_size=k)
            continue
        part_dir = f"{d}/{tbl}.parquet"
        os.makedirs(part_dir, exist_ok=True)
        for old in os.listdir(part_dir):  # deterministic rebuilds
            os.unlink(os.path.join(part_dir, old))
        n = tab.num_rows
        for i, lo in enumerate(range(0, n, k)):
            pq.write_table(tab.slice(lo, k),
                           f"{part_dir}/part-{i:05d}.parquet")
        # one zero-row part: readers must skip it, not crash on it
        pq.write_table(tab.slice(0, 0), f"{part_dir}/part-empty.parquet")


CLASSES["source_layout"] = {}  # handled structurally by _build_layout


def build(cls: str, out_root: str, src: str) -> str:
    """Write one probe corpus; returns its directory."""
    spec = CLASSES[cls]
    d = os.path.join(out_root, cls)
    os.makedirs(d, exist_ok=True)
    if cls == "source_layout":
        _build_layout(d, src)
        return d
    con = duckdb.connect()
    try:
        for tbl in TABLES:
            body = spec.get(tbl, "select * from t")
            if body is None:
                body = "select * from t limit 0"
            sql = body.replace("from t", f"from '{src}/{tbl}.parquet'")
            con.sql(
                f"copy ({sql}) to '{d}/{tbl}.parquet' (format parquet)"
            )
    finally:
        con.close()
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("classes", nargs="*", default=None)
    ap.add_argument("--out", default=".localdata/probes")
    ap.add_argument("--src", default=SRC_DEFAULT)
    args = ap.parse_args()
    names = args.classes or list(CLASSES)
    unknown = [c for c in names if c not in CLASSES]
    if unknown:
        raise SystemExit(f"unknown probe classes: {unknown} "
                         f"(have: {sorted(CLASSES)})")
    for cls in names:
        d = build(cls, args.out, args.src)
        print(f"built {cls} -> {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

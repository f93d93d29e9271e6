"""Run the full Spark-vs-DuckDB oracle gate over every adversarial
probe corpus (tools/gen_probes.py) in ONE Spark session.

    python tools/probe_sweep.py [--classes a,b] [--queries q1,q2] [--out DIR]

This is the repeatable form of the r6 probe campaign (SURVEY §7f):
each class either caught a real divergence or pins a contract.
Expected steady state: every class PASSes. Known, documented
exceptions are listed in EXPECTED_DIVERGENCES — a run flags anything
outside that list.

Wall clock: the full matrix (28 classes × full catalog) is ~2-3 h;
use --classes/--queries while iterating on one bug class.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from gen_probes import CLASSES, SRC_DEFAULT, TABLES, build  # noqa: E402

# (class, query) pairs that are ALLOWED to diverge, each with the
# documented reason (see SURVEY §7f / tests/test_empty_inputs.py).
EXPECTED_DIVERGENCES: dict[tuple[str, str], str] = {
    ("empty", "orders_rollup"): (
        "GROUPING SETS on zero rows: Spark emits no rows, DuckDB emits "
        "the grand-total row — engine semantics, pinned in "
        "tests/test_empty_inputs.py"
    ),
    ("big_ids", "span_dedup"): (
        "doc_ids at 2^62 exceed the doc_id*1e8+span_idx composite-key "
        "domain; the in-plan guard raises the actionable re-key message "
        "BY DESIGN (the r6 'guard upgraded' contract) instead of "
        "silently overflowing"
    ),
    ("torture", "span_dedup"): (
        "same composite-key guard: the torture corpus shifts doc_ids "
        "to 2^61, outside the span-key domain — loud failure is the "
        "documented behavior"
    ),
    **{
        ("dup_rows", q): (
            "vec_id is the vector's IDENTITY: the iterative IVF/k-means "
            "fit's seed and centroid selection is multiplicity-stable "
            "only under unique vec_ids (duplicate rows shift seeds/"
            "means differently through the Spark kernels vs the SQL "
            "twin's CTEs). Duplicate embedding rows are upstream "
            "corruption — dedup_exact/incremental_dedup_exact are the "
            "provided remedy; documented precondition in the query "
            "docstrings"
        )
        for q in ("ivf_topk", "ivf_topk_shuffle", "semantic_clusters")
    },
}

# (class, query) pairs where BOTH engines must raise the same guard
# message (a positive contract, stronger than an expected
# divergence): non-finite or |x| >= 1e9 measures are out of the
# exact-micros-sum domain, and both tpch._finite_or_raise and
# _util._sql_fin raise this exact message instead of silently
# corrupting the sum (Spark's unguarded floor(NaN) is 0, floor(Inf)
# is Long.MaxValue, and a finite 1e15 silently degrades exactness).
# An entry passes if both engines raise with the substring, OR both
# succeed with matching values (e.g. a filter dropped every poisoned
# row at this SF); anything asymmetric fails.
_MICROS_GUARD = "exact micros-sum domain"
_MICROS_QUERIES = (
    # every micros consumer of a poisoned measure column: whether a
    # given query actually raises depends on which poisoned rows
    # survive its filters at the sweep's --src SF (q5/q7/q10 passed
    # vacuously from the sf0.001 source but raise from sf0.01) —
    # list the full family; both-succeed-and-match also passes
    "fold_count tpch_q1 tpch_q3 tpch_q5 tpch_q6 tpch_q7 tpch_q8"
    " tpch_q9 tpch_q10 tpch_q11 tpch_q14 tpch_q15 tpch_q17 tpch_q18"
    " tpch_q19 tpch_q20"
    # the rounded value-sum family rides the same guard since the
    # huge_values class proved plain double sums silently
    # order-diverge past 2^53 (absorption): windows, candles,
    # chunk folds, twap, salted/banded sums
    " tumbling_window tumbling_window_gapfill hopping_window"
    " hopping_window_gapfill session_window candles candles_rollup"
    " chunk_fold chunk_fold_timeout twap_daily salted_sum"
    " range_band_count"
).split()
EXPECTED_RAISE: dict[tuple[str, str], str] = {
    (cls, q): _MICROS_GUARD
    for cls in ("nonfinite", "huge_values")
    for q in _MICROS_QUERIES
}
# non-finite embedding COMPONENTS (nonfinite_vec, r9): per-element
# ops that cannot place a NaN/Inf raise the same loud domain error on
# both engines — quantize has no int8 for NaN (its own guard), and
# dim_stats' micros sums are guarded by invariant 19 already
EXPECTED_RAISE[("nonfinite_vec", "embedding_quantize")] = (
    "finite-component domain")
EXPECTED_RAISE[("nonfinite_vec", "embedding_dim_stats")] = _MICROS_GUARD

# MIXED embedding dimensionality (ragged_dims, r10) is corrupt data
# and OUT OF the similarity contract ("embeddings share one
# dimensionality" — stack_f64's documented stricter-than-JVM
# surface). The Arrow-kernel paths FAIL LOUDLY on the Spark side
# with the targeted mixed-dimensions error naming the offending ids
# (the oracle's SQL folds run — one-sided raise, so these live here
# rather than in EXPECTED_RAISE); the pure-JVM paths do not raise,
# and their zip semantics genuinely differ across engines on ragged
# pairs: Spark's zip_with pads the SHORTER side with NULL (NULL
# cosine, pair silently dropped), while the oracle's
# list_transform(range(1, len(a)+1)) iterates ONE side's length (a
# real 32-term cosine when that side is the short one) — a
# documented engine-semantics divergence on out-of-domain input,
# the same contract shape as big_ids/span_dedup's guard.
_RAGGED_KERNEL = (
    "Arrow kernel raises the targeted stack_f64 mixed-dimensions "
    "error (ids named) BY DESIGN; the SQL twin's folds run"
)
_RAGGED_ZIP = (
    "pure-JVM path: Spark zip_with NULL-pads ragged pairs (dropped) "
    "while DuckDB's one-side-length fold scores them — engine zip "
    "semantics on out-of-contract input"
)
for _q in ("ivf_topk", "ivf_topk_shuffle", "semantic_clusters",
           "ann_lsh_topk_shuffle"):
    EXPECTED_DIVERGENCES[("ragged_dims", _q)] = _RAGGED_KERNEL
for _q in ("ann_lsh_topk", "ann_topk", "embedding_cosine_dup"):
    EXPECTED_DIVERGENCES[("ragged_dims", _q)] = _RAGGED_ZIP


# Classes swept SPARK-ONLY (run to completion / loud documented
# guard; no DuckDB compare): the giant_doc class's 10^7-token row is
# a SPARK task-memory contract probe, and the r11 run found a real
# ORACLE-side bound — DuckDB's list-value model evaluates
# comprehensions/slices over a 10M-element token list in 20-30 min
# per query (several gram oracles) and OOMs outright on the span
# oracle (any shape tried: index-unnest and struct-comprehension
# both), so a DUCKDB compare over this class is not computable on
# this engine. r12 restores an oracle for the gram/span-heavy names
# anyway: tools/text_oracle.py streams per-document token iterators
# with bounded memory (equality vs the SQL oracles pinned by
# tests/test_text_oracle.py), so those names are oracle-COMPARED in
# spark-only classes rather than run-to-completion-only; the
# remaining names keep the run/guard contract (their cheap oracles
# were 5/5 spot-verified at reduced token counts in r11, and their
# per-doc cost does not concentrate in one list comprehension).
SPARK_ONLY_CLASSES = {"giant_doc"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default=".localdata/probes")
    ap.add_argument("--src", default=SRC_DEFAULT)
    args = ap.parse_args()

    classes = args.classes.split(",") if args.classes else list(CLASSES)

    import __spark_entry__ as e
    from oracle_check import canon
    from text_oracle import TEXT_TWIN_NAMES, run_text

    from rstreams_spark.session import get_spark

    spark = get_spark("probe_sweep")
    qs, oracles = e.queries(), e.oracle_sql()
    names = args.queries.split(",") if args.queries else list(qs)

    total_fail = 0
    for cls in classes:
        d = build(cls, args.out, args.src)
        con = duckdb.connect()
        for tbl in TABLES:
            p = f"{d}/{tbl}.parquet"
            # source_layout tables may be DIRECTORIES of part files
            src_expr = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.sql(f"create view {tbl} as select * from {src_expr}")
        failures = []
        expected = []
        import time as _time
        for name in names:
            print(f"#   [{cls}] {name} @ {_time.strftime('%H:%M:%S')}",
                  file=sys.stderr, flush=True)
            raise_sub = EXPECTED_RAISE.get((cls, name))
            sdf = serr = odf = oerr = None
            try:
                sdf = qs[name](spark, d).toPandas()
            except Exception as ex:
                serr = ex
            if cls in SPARK_ONLY_CLASSES:
                # a documented domain-guard raise (EXPECTED_RAISE) is a
                # pass here too — the class contract is "finish within
                # task memory OR raise the documented guard" (r12 fix:
                # this branch previously only honored
                # EXPECTED_DIVERGENCES, whose values mark value-level
                # divergences, not raise substrings)
                if serr is not None and (
                    raise_sub is not None and raise_sub in str(serr)
                ):
                    expected.append(name)
                elif serr is not None and (cls, name) not in EXPECTED_DIVERGENCES:
                    failures.append(
                        (name, f"EXCEPTION {type(serr).__name__}:"
                               f" {str(serr)[:200]}"))
                elif serr is not None:
                    expected.append(name)
                elif name in TEXT_TWIN_NAMES:
                    # gram/span-heavy names get a REAL oracle compare
                    # via the bounded-memory Python twin (r12) — the
                    # 10^7-token row's answers are no longer
                    # self-certified
                    try:
                        tdf = run_text(name, d)
                        ok = (
                            sorted(sdf.columns) == sorted(tdf.columns)
                            and len(sdf) == len(tdf)
                            and canon(sdf).equals(canon(tdf))
                        )
                        if not ok and (cls, name) in EXPECTED_DIVERGENCES:
                            expected.append(name)
                        elif not ok:
                            failures.append((name, "mismatch (py twin)"))
                    except Exception as ex:
                        failures.append(
                            (name, f"EXCEPTION(py twin) "
                                   f"{type(ex).__name__}: {str(ex)[:200]}"))
                continue
            if name not in oracles:
                if serr is not None:
                    failures.append(
                        (name, f"EXCEPTION {type(serr).__name__}:"
                               f" {str(serr)[:200]}"))
                continue
            try:
                odf = con.sql(oracles[name]).df()
            except Exception as ex:
                oerr = ex
            if serr is not None or oerr is not None:
                if (raise_sub is not None
                        and serr is not None and oerr is not None
                        and raise_sub in str(serr)
                        and raise_sub in str(oerr)):
                    why = None  # matched guard raise on BOTH engines
                else:
                    who = "spark" if serr is not None else "oracle"
                    ex = serr if serr is not None else oerr
                    why = (f"EXCEPTION({who}) {type(ex).__name__}:"
                           f" {str(ex)[:200]}")
            else:
                ok = (
                    sorted(sdf.columns) == sorted(odf.columns)
                    and len(sdf) == len(odf)
                    and canon(sdf).equals(canon(odf))
                )
                why = None if ok else "mismatch"
            if why:
                if (cls, name) in EXPECTED_DIVERGENCES:
                    expected.append(name)
                else:
                    failures.append((name, why))
        con.close()
        tag = "PASS" if not failures else "FAIL"
        extra = f" (+{len(expected)} expected-divergence)" if expected else ""
        print(f"[{cls}] {tag}: {len(names) - len(failures)}/{len(names)}{extra}",
              flush=True)
        for name, why in failures:
            print(f"    ✗ {name}: {why}", flush=True)
        total_fail += len(failures)
    print(f"{'FAIL' if total_fail else 'PASS'}: sweep complete, "
          f"{total_fail} unexpected divergences")
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

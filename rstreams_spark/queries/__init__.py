"""Named query catalog: every SURVEY.md §2 row → (spark_fn, oracle_sql).

``REGISTRY`` maps name → callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name → DuckDB SQL string (absent = rows-only check).

Iteration order is DELIBERATE: the driver's correctness artifact
covers the first ~50 insertion-order entries (r01 checked all 46
then-existing, r02-r07 stopped at exactly 50), so ``_FRONT`` rotates
per round. Round 12 = the r11 complement (the 53 entries outside
CORRECTNESS_r11 — VERDICT r11 item 4), ordered: the three sf10
attribution targets this round touches first (dedup_clusters,
source_overlap, decontaminate_fuzzy), then strictly by driver
staleness — distinct_count (last driver-green r7),
map_filter/merge_take/chunk_fold (r8), the five r9 entries, then the
r10 block. source_overlap double-dips (r11-green but an r12
attribution target — changed-first outranks), so 50-slot arithmetic
forces four r10-driver-green, unchanged entries to ride outside on
the replica bridge: tpch_q6, skip_take, cycle_take,
decontaminate_ngrams (each re-verified in this round's full oracle
replicas at sf0.01 AND sf0.1 and in the probe sweep). The union of CORRECTNESS_r01-r12 plus per-round replica runs
still covers every entry every round.
"""

from __future__ import annotations

from . import core, dedupq, textq, tpch

_ALL: dict = {}
_SQL: dict = {}
for mod in (core, tpch, textq, dedupq):
    _ALL.update(mod.QUERIES)
    _SQL.update(mod.SQL_ORACLES)

_FRONT = [
    # — r12 sf10 attribution targets (VERDICT r11 item 1): these are
    #   the entries this round's perf work may touch — changed-first
    #   outranks staleness —
    "dedup_clusters", "source_overlap", "decontaminate_fuzzy",
    # — stalest driver-verified (r7/r8) —
    "distinct_count", "map_filter", "merge_take", "chunk_fold",
    # — r9 block —
    "fold_count", "gap_detect", "lag_window", "stream_table_join",
    "wordcount",
    # — r10 block: core stream shapes —
    "asof_enrich", "latest_per_key", "session_window",
    "pattern_followed_by", "salted_sum", "split_routes",
    "skip_while", "take_while", "parse_json_props",
    "ts_similarity_topk",
    # — r10 block: TPC-H + rollup —
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q5", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q14",
    "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19",
    "tpch_q20", "tpch_q21", "tpch_q22", "orders_rollup",
    # — r10 block: dedup/text/similarity tail —
    "ann_topk", "dedup_minhash", "dedup_keep_best",
    "dedup_winnowing", "doc_winnowing", "doc_commonness",
    "minhash_lsh_topk", "ngram_novelty", "top_terms",
]

_missing = [k for k in _FRONT if k not in _ALL]
if _missing:  # fail at import, not in the driver's gate
    raise RuntimeError(f"_FRONT names absent from catalog: {_missing}")

REGISTRY = {k: _ALL[k] for k in _FRONT}
for _k, _v in _ALL.items():
    REGISTRY.setdefault(_k, _v)
ORACLES = {k: _SQL[k] for k in REGISTRY if k in _SQL}

__all__ = ["REGISTRY", "ORACLES"]

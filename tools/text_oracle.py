"""Bounded-memory Python oracle for the gram/span-heavy text catalog
entries (VERDICT r11 item 3 — the giant_doc regime).

The catalog's DuckDB oracles for the gram family build n-grams with a
list comprehension over the whole token list of each document.
DuckDB's list-value model evaluates that comprehension element-wise
over a 10^7-element list in 20-30 minutes per query and OOMs outright
on the span oracle (both shapes tried in r11), so the giant_doc probe
class was swept Spark-only — the giant row's gram/span answers were
self-certified.

This module mirrors the cc_oracle.py move: compute the IDENTICAL
result with a streaming per-document token iterator (pyarrow batch
reader -> the same normalize/tokenize pipeline -> compact gram-count
/ span-first-occurrence dictionaries), never materializing a
comprehension over the token list. Every output float is a single
division of exactly-represented integers (same operand order as the
SQL), so the doubles are bit-identical by construction — the same
exactness discipline as the catalog (CLAUDE.md invariant 2).

Equality vs the catalog SQL oracles is pinned at sf0.01 (plus an
adversarial mini-corpus: NULL/empty text, duplicate doc_id rows,
single-token docs) by tests/test_text_oracle.py;
tools/probe_sweep.py routes these names here for the giant_doc class
so the 10^7-token row is oracle-compared instead of Spark-only.

Tokenization parity: tokens are whitespace splits of
trim(regexp_replace(lower(translate(text,'İ','I')), '[^a-z0-9]+', ' '))
— textq's SQL_TOKS / functions.text.tokens — reproduced with Python
re on str (code points), which agrees with DuckDB on these corpora
(pinned by the equality test, which includes the İ fold).
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import pandas as pd

sys.path.insert(0, ".")

TEXT_TWIN_NAMES = (
    "quality_repetition", "span_dedup", "doc_commonness",
    "ngram_novelty", "source_overlap", "top_terms", "vocab_coverage",
)

_NONALNUM = re.compile(r"[^a-z0-9]+")


def _norm(text: str | None) -> str | None:
    if text is None:
        return None
    return _NONALNUM.sub(" ", text.replace("İ", "I").lower()).strip()


def _toks(text: str | None) -> list[str]:
    s = _norm(text)
    return s.split(" ") if s else []


def _iter_docs(sf_dir: str, cols: tuple[str, ...]):
    """Stream documents.parquet rows as tuples in file order —
    never holds more than one record batch of texts."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    for batch in pf.iter_batches(batch_size=64, columns=list(cols)):
        d = batch.to_pydict()
        yield from zip(*(d[c] for c in cols))


def _grams3(tk: list[str]):
    return zip(tk, tk[1:], tk[2:])


def _quality_repetition(sf_dir: str) -> pd.DataFrame:
    from rstreams_spark.queries.textq import (
        REP_DUP3_DEN, REP_DUP3_NUM, REP_TOP2_DEN, REP_TOP2_NUM,
    )

    # per-ROW semantics (the SQL groups under a row number): each
    # physical row yields its own stats row, duplicates included
    rows = []
    for doc_id, text in _iter_docs(sf_dir, ("doc_id", "text")):
        s = _norm(text)
        tk = s.split(" ") if s else []
        if not tk:
            continue  # no grams -> absent from the SQL stats group
        nc = max(len(s), 1)
        c1 = Counter(tk)
        w_total, w_distinct = len(tk), len(c1)
        top2 = max(
            (cnt * (len(a) + len(b) + 1)
             for (a, b), cnt in Counter(zip(tk, tk[1:])).items()),
            default=0,
        )
        dup3 = sum(
            cnt * (len(a) + len(b) + len(c) + 2)
            for (a, b, c), cnt in Counter(_grams3(tk)).items()
            if cnt > 1
        )
        rows.append((
            doc_id, w_total,
            float(w_total - w_distinct) / float(max(w_total, 1)),
            float(top2) / float(nc),
            float(dup3) / float(nc),
            (top2 * REP_TOP2_DEN <= nc * REP_TOP2_NUM
             and dup3 * REP_DUP3_DEN <= nc * REP_DUP3_NUM),
        ))
    df = pd.DataFrame(rows, columns=[
        "doc_id", "n_words", "dup_word_frac", "top2gram_char_frac",
        "dup3gram_char_frac", "keep",
    ])
    return df.astype({"doc_id": "int64", "n_words": "int64",
                      "dup_word_frac": "float64",
                      "top2gram_char_frac": "float64",
                      "dup3gram_char_frac": "float64", "keep": "bool"})


def _spans(doc_id: int, tk: list[str]):
    from rstreams_spark.queries.textq import SPAN_SIZE, _SPAN_KEY_MUL

    for i in range(0, (len(tk) - 1) // SPAN_SIZE + 1):
        seg = tk[i * SPAN_SIZE: i * SPAN_SIZE + SPAN_SIZE]
        yield (i, " ".join(seg), len(seg), doc_id * _SPAN_KEY_MUL + i)


def _span_dedup(sf_dir: str) -> pd.DataFrame:
    # pass 1: global first-occurrence key per span text
    first: dict[str, int] = {}
    for doc_id, text in _iter_docs(sf_dir, ("doc_id", "text")):
        for _i, sp_text, _n, key in _spans(doc_id, _toks(text)):
            if sp_text not in first or key < first[sp_text]:
                first[sp_text] = key
    # pass 2: per-doc aggregation (rows of one doc_id merge, exactly
    # like the SQL's final GROUP BY doc_id over all span rows)
    agg: dict[int, list] = {}  # doc -> [n, ndup, ntok_kept, kept list]
    for doc_id, text in _iter_docs(sf_dir, ("doc_id", "text")):
        tk = _toks(text)
        if not tk:
            continue
        a = agg.setdefault(doc_id, [0, 0, 0, []])
        for i, sp_text, n, key in _spans(doc_id, tk):
            a[0] += 1
            if key == first[sp_text]:
                a[2] += n
                a[3].append((i, sp_text))
            else:
                a[1] += 1
    rows = [
        (doc_id, n, ndup, ntok,
         " ".join(s for _, s in sorted(kept, key=lambda x: x[0])))
        for doc_id, (n, ndup, ntok, kept) in agg.items()
    ]
    df = pd.DataFrame(rows, columns=[
        "doc_id", "n_spans", "n_dup_spans", "n_tokens_kept", "dedup_text",
    ])
    return df.astype({"doc_id": "int64", "n_spans": "int64",
                      "n_dup_spans": "int64", "n_tokens_kept": "int64",
                      "dedup_text": "object"})


def _doc_tf(sf_dir: str) -> tuple[dict[int, Counter], int]:
    """(doc_id -> merged term counts, total row count). Duplicate
    doc_id rows merge additively — the SQL's tf groups by doc_id."""
    tf: dict[int, Counter] = {}
    n_rows = 0
    for doc_id, text in _iter_docs(sf_dir, ("doc_id", "text")):
        n_rows += 1
        tk = _toks(text)
        if tk:
            c = tf.setdefault(doc_id, Counter())
            c.update(tk)
    return tf, n_rows


def _doc_commonness(sf_dir: str) -> pd.DataFrame:
    tf, n_docs = _doc_tf(sf_dir)
    df_cnt: Counter = Counter()
    for c in tf.values():
        df_cnt.update(c.keys())
    rows = []
    for doc_id, c in tf.items():
        n_tokens = sum(c.values())
        num = sum(cnt * df_cnt[term] for term, cnt in c.items())
        rows.append((doc_id, n_tokens, len(c),
                     float(num) / float(n_tokens * n_docs)))
    df = pd.DataFrame(rows, columns=[
        "doc_id", "n_tokens", "n_distinct_terms", "commonness"])
    return df.astype({"doc_id": "int64", "n_tokens": "int64",
                      "n_distinct_terms": "int64", "commonness": "float64"})


def _top_terms(sf_dir: str) -> pd.DataFrame:
    import heapq

    from rstreams_spark.queries.textq import TOPTERMS_K

    tf, n_docs = _doc_tf(sf_dir)
    df_cnt: Counter = Counter()
    for c in tf.values():
        df_cnt.update(c.keys())
    nd = float(n_docs + 1)
    rows = []
    for doc_id, c in tf.items():
        scored = (
            (term, cnt, df_cnt[term], float(cnt) * nd / float(df_cnt[term] + 1))
            for term, cnt in c.items()
        )
        top = heapq.nsmallest(TOPTERMS_K, scored,
                              key=lambda x: (-x[3], x[0]))
        rows.extend(
            (doc_id, term, cnt, dfv, score, rank)
            for rank, (term, cnt, dfv, score) in enumerate(top, 1)
        )
    out = pd.DataFrame(rows, columns=[
        "doc_id", "term", "tf", "df", "score", "rank"])
    return out.astype({"doc_id": "int64", "term": "object", "tf": "int64",
                       "df": "int64", "score": "float64", "rank": "int64"})


def _ngram_novelty(sf_dir: str) -> pd.DataFrame:
    # pass 1: first (min) doc_id per distinct 3-gram
    first: dict[tuple, int] = {}
    for doc_id, text in _iter_docs(sf_dir, ("doc_id", "text")):
        for g in set(_grams3(_toks(text))):
            if g not in first or doc_id < first[g]:
                first[g] = doc_id
    # pass 2: per-doc distinct grams (duplicate doc_id rows union,
    # like the SQL's DISTINCT doc_id, gram)
    seen: dict[int, set] = {}
    for doc_id, text in _iter_docs(sf_dir, ("doc_id", "text")):
        gs = set(_grams3(_toks(text)))
        if gs:
            seen.setdefault(doc_id, set()).update(gs)
    rows = []
    for doc_id, gs in seen.items():
        nd = len(gs)
        nn = sum(1 for g in gs if first[g] == doc_id)
        rows.append((doc_id, nd, nn, float(nn) / float(nd)))
    df = pd.DataFrame(rows, columns=[
        "doc_id", "n_distinct_grams", "n_novel_grams", "novelty_frac"])
    return df.astype({"doc_id": "int64", "n_distinct_grams": "int64",
                      "n_novel_grams": "int64", "novelty_frac": "float64"})


def _source_overlap(sf_dir: str) -> pd.DataFrame:
    from itertools import combinations

    src_grams: dict[str, set] = {}
    for source, text in _iter_docs(sf_dir, ("source", "text")):
        gs = set(_grams3(_toks(text)))
        if gs:
            src_grams.setdefault(source, set()).update(gs)
    rows = []
    for a, b in combinations(sorted(src_grams), 2):
        shared = len(src_grams[a] & src_grams[b])
        if shared == 0:
            continue  # the SQL's pair join only emits matching pairs
        ga, gb = len(src_grams[a]), len(src_grams[b])
        rows.append((a, b, shared, ga, gb,
                     float(shared) / float(ga + gb - shared)))
    df = pd.DataFrame(rows, columns=[
        "source_a", "source_b", "shared_grams", "grams_a", "grams_b",
        "jaccard"])
    return df.astype({"source_a": "object", "source_b": "object",
                      "shared_grams": "int64", "grams_a": "int64",
                      "grams_b": "int64", "jaccard": "float64"})


def _vocab_coverage(sf_dir: str) -> pd.DataFrame:
    from rstreams_spark.queries.textq import VOCAB_K

    st: dict[str, Counter] = {}
    for source, text in _iter_docs(sf_dir, ("source", "text")):
        tk = _toks(text)
        if tk:
            st.setdefault(source, Counter()).update(tk)
    gterms: Counter = Counter()
    for c in st.values():
        gterms.update(c)
    import heapq

    topk = {
        t for t, _ in heapq.nsmallest(
            VOCAB_K, gterms.items(), key=lambda x: (-x[1], x[0]))
    }
    rows = []
    for source, c in st.items():
        n_tokens = sum(c.values())
        covered = sum(cnt for t, cnt in c.items() if t in topk)
        rows.append((source, n_tokens, covered,
                     float(covered) / float(n_tokens)))
    df = pd.DataFrame(rows, columns=[
        "source", "n_tokens", "covered_tokens", "coverage"])
    return df.astype({"source": "object", "n_tokens": "int64",
                      "covered_tokens": "int64", "coverage": "float64"})


_RUNNERS = {
    "quality_repetition": _quality_repetition,
    "span_dedup": _span_dedup,
    "doc_commonness": _doc_commonness,
    "ngram_novelty": _ngram_novelty,
    "source_overlap": _source_overlap,
    "top_terms": _top_terms,
    "vocab_coverage": _vocab_coverage,
}


def run_text(name: str, sf_dir: str) -> pd.DataFrame:
    """Compute the catalog oracle result for ``name`` over the
    documents table in ``sf_dir`` with bounded memory."""
    return _RUNNERS[name](sf_dir)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(TEXT_TWIN_NAMES)
    for n in names:
        df = run_text(n, sf)
        print(f"{n}: {len(df)} rows")
        print(df.head(3).to_string())

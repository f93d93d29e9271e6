"""Equality pins for the bounded-memory Python text oracle
(tools/text_oracle.py — VERDICT r11 item 3).

The twins stand in for the catalog's DuckDB gram/span oracles in the
giant_doc probe regime (where DuckDB's list-comprehension evaluation
takes 20-30 min per query and OOMs on the span shape), so their
authority comes entirely from these pins: byte-identical frames vs
the recursive SQL at sf0.01, and on an adversarial mini-corpus with
NULL text, empty text, duplicate doc_id rows, single-token docs, an
İ-fold case, and a multi-source layout (the row shapes the per-doc
streaming fold could plausibly mishandle)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF_ORACLE = "/root/testdata/sf0.01"


def _compare(name: str, sf_dir: str) -> None:
    from oracle_check import canon
    from text_oracle import run_text

    from rstreams_spark.queries import textq

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from '{sf_dir}/documents.parquet'"
    )
    odf = con.sql(textq.SQL_ORACLES[name]).df()
    tdf = run_text(name, sf_dir)
    assert list(odf.columns) == list(tdf.columns)
    assert len(odf) == len(tdf)
    a, b = canon(odf), canon(tdf)
    assert a.equals(b), f"{name}: twin diverges from the SQL oracle"


@pytest.mark.parametrize("name", [
    "quality_repetition", "span_dedup", "doc_commonness",
    "ngram_novelty", "source_overlap", "top_terms", "vocab_coverage",
])
def test_text_twin_matches_sql_oracle_sf001(name):
    _compare(name, SF_ORACLE)


@pytest.mark.parametrize("name", [
    "quality_repetition", "span_dedup", "doc_commonness",
    "ngram_novelty", "source_overlap", "top_terms", "vocab_coverage",
])
def test_text_twin_matches_sql_oracle_adversarial(name, tmp_path):
    """NULL/empty text, duplicate doc_id rows (must merge in per-doc
    groupings but stay per-row in quality_repetition), a 1-token doc,
    an İ fold, punct-only text, and enough cross-source token overlap
    to make source_overlap/vocab_coverage non-vacuous."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
        (2, None, "en", "web"),
        (3, "", "en", "books"),
        (4, "word", "en", "books"),
        (5, "İstanbul alpha beta gamma downstream of the fold", "tr", "books"),
        (6, "!!! ??? ...", "en", "code"),
        (7, "alpha beta gamma repeated alpha beta gamma repeated "
            "alpha beta gamma repeated", "en", "code"),
        (8, " ".join(f"tok{i}" for i in range(40)), "en", "web"),
        (9, "beta gamma delta " * 6 + "unique tail here", "en", "books"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len().astype("float").fillna(0).astype("int64")
    df = df.astype({"doc_id": "int64"})
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    _compare(name, str(tmp_path))

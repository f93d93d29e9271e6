"""Unicode normalizer parity: JVM and DuckDB lowercase tables differ
on exactly two cased BMP codepoints (a 6,009-codepoint scan): İ
(U+0130 — JVM emits 'i'+combining dot, DuckDB plain 'i'; the mark is
a token SPLITTER, so Turkish text tokenized differently per engine)
and Ⱶ-family U+2C2F (both normalizers strip it — benign). The shared
normalizers fold İ→I before lower() on BOTH sides
(functions/text.py::_fold_i ↔ _util.SQL_NORM) and in the Python
streaming kernels (curation.py), making the one token-affecting
divergence disappear by construction.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rstreams_spark.functions.text import bpe_ish_tokens, tokens
from rstreams_spark.queries._util import SQL_TOKS

CASES = [
    "İstanbul ĞÜŞ iı İİ",        # the divergent codepoint, repeated
    "Hello WORLD",
    "ΣΟΦΟΣ σοφος",               # Greek final sigma (stripped — benign)
    "ß STRASSE straße",
    "naïve café résumé",
    "emoji 🙂 mix 123abc",
    "tab\tnewline\nvtab\x0bmix",  # invariant 14's explicit-class case
    "ﬁligature ﬆ Ⱟⱟ",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("create table t(text varchar)")
    con.executemany("insert into t values (?)", [[c] for c in CASES])
    yield con
    con.close()


def test_tokens_match_duckdb_on_unicode(spark, duck):
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    sp = {
        r["text"]: list(r["toks"])
        for r in df.select("text", tokens(F.col("text")).alias("toks")).collect()
    }
    dk = {
        r[0]: list(r[1])
        for r in duck.sql(
            f"select text, {SQL_TOKS.format(c='text')} from t"
        ).fetchall()
    }
    for c in CASES:
        assert sp[c] == dk[c], (c, sp[c], dk[c])
    # the regression that motivated the fold: İstanbul is ONE token
    assert "istanbul" in sp["İstanbul ĞÜŞ iı İİ"]


def test_bpe_token_count_matches_duckdb_on_unicode(spark, duck):
    from rstreams_spark.functions.text import BPE_ISH_PATTERN

    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    sp = {
        r["text"]: len(r["bpe"])
        for r in df.select(
            "text", bpe_ish_tokens(F.col("text")).alias("bpe")
        ).collect()
    }
    dk = {
        r[0]: r[1]
        for r in duck.sql(
            "select text, len(regexp_extract_all(lower(translate(text,"
            f" 'İ', 'I')), '{BPE_ISH_PATTERN}')) from t"
        ).fetchall()
    }
    for c in CASES:
        assert sp[c] == dk[c], (c, sp[c], dk[c])

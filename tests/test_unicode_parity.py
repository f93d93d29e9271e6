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


# catalog-level pin: a unicode-injected corpus (Turkish İ, Greek,
# Cyrillic, emoji, fullwidth, ligatures in documents.text) must stay
# oracle-green — the full 101-query sweep ran clean; CI re-checks the
# text-heavy subset.
UNI_SUBSET = [
    "wordcount", "token_count", "doc_fingerprint", "lang_id",
    "text_quality", "dedup_minhash", "span_dedup", "top_terms",
    "quality_repetition", "dedup_exact",
]
TABLES = ("region nation customer supplier part orders lineitem events"
          " embeddings").split()


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_uni")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"copy (select * from '{src}/{t}.parquet')"
            f" to '{d}/{t}.parquet' (format parquet)"
        )
    con.sql(
        f"""copy (
          select doc_id, source,
            case doc_id % 6
              when 0 then 'İstanbul ĞÜŞ iı ' || text
              when 1 then text || ' naïve café ΣΟΦΟΣ σοφος МОСКВА'
              when 2 then 'emoji 🙂🚀 ' || text || ' ﬁnal'
              when 3 then 'ＦｕｌｌＷｉｄｔｈ１２３ ' || text
              else text end as text,
            lang
          from '{src}/documents.parquet'
        ) to '{d}/documents.parquet' (format parquet)"""
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def uni_oracle(uni_dir):
    con = duckdb.connect()
    for t in TABLES + ["documents"]:
        con.sql(f"create view {t} as select * from '{uni_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", UNI_SUBSET)
def test_unicode_corpus_matches_oracle(spark, uni_dir, uni_oracle, name):
    import pandas as pd

    from rstreams_spark.queries import ORACLES, REGISTRY

    sdf = REGISTRY[name](spark, uni_dir).toPandas()
    odf = uni_oracle.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    a, b = canon(sdf), canon(odf)
    eq = (a == b) | (a.isna() & b.isna())
    assert bool(eq.all().all()), f"{name}: value mismatch on unicode corpus"


def test_span_key_domain_guard_raises_actionably(spark, uni_dir):
    """doc_ids beyond the composite-key domain (~9.2e12) must fail
    with the contract message, not a raw ANSI long overflow (an r6
    probe with 2^62 ids hit the raw overflow here)."""
    from pyspark.sql import functions as F

    from rstreams_spark.queries import REGISTRY

    big = spark.read.parquet(f"{uni_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id") + F.lit(2**62)
    )
    d2 = f"{uni_dir}_bigid"
    big.write.mode("overwrite").parquet(f"{d2}/documents.parquet")
    with pytest.raises(Exception, match="key domain"):
        REGISTRY["span_dedup"](spark, d2).count()

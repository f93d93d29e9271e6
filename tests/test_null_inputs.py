"""NULL-column robustness: documents with NULL text/lang and
embeddings with NULL vectors are valid inputs (a real corpus always
has them), and every query must both survive them and agree with its
DuckDB oracle on them. The full-catalog probe that produced this
subset ran 101/101 green after three fixes:

- extract_meta crashed on the NULL payload that encode(NULL text)
  produces — it now NULL-propagates per column, mirroring the
  oracle's SQL NULL semantics (audio/video builders coalesce NULL
  text instead, per the r6 digest-domain fix; their probe kernels
  are NULL-hardened for API use anyway);
- semantic_clusters / ivf_topk crashed in the numpy assign kernels
  (np.array over a column containing NULL vectors is inhomogeneous)
  — NULL embeddings are now excluded by contract on BOTH sides
  (they can never pair/rank: NULL cosine), with cell sizing kept on
  the unfiltered footer-metadata count.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from rstreams_spark.queries import ORACLES, REGISTRY

TABLES = "region nation customer supplier part orders lineitem events".split()

SUBSET = [
    "multimodal_meta", "audio_meta", "video_meta",
    "semantic_clusters", "ivf_topk", "ann_topk", "ann_lsh_topk",
    "embedding_cosine_dup", "embedding_dim_stats", "embedding_quantize",
    "dedup_exact", "dedup_minhash", "lang_id", "text_quality",
    "token_count", "source_mix", "budget_sample",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls")
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
                 case when doc_id % 10 = 3 then NULL else text end as text,
                 case when doc_id % 17 = 5 then NULL else lang end as lang
          from '{src}/documents.parquet'
        ) to '{d}/documents.parquet' (format parquet)"""
    )
    con.sql(
        f"""copy (
          select vec_id, label,
                 case when vec_id % 11 = 7 then NULL else embedding end
                   as embedding
          from '{src}/embeddings.parquet'
        ) to '{d}/embeddings.parquet' (format parquet)"""
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def oracle(null_dir):
    con = duckdb.connect()
    for t in TABLES + ["documents", "embeddings"]:
        con.sql(f"create view {t} as select * from '{null_dir}/{t}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", SUBSET)
def test_null_columns_match_oracle(spark, null_dir, oracle, name):
    sdf = REGISTRY[name](spark, null_dir).toPandas()
    odf = oracle.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"
    a, b = _canon(sdf), _canon(odf)
    eq = (a == b) | (a.isna() & b.isna())
    assert bool(eq.all().all()), f"{name}: value mismatch on NULL corpus"


# second corpus: NULLs in the FACT tables — join keys (user_id),
# measures (value, l_discount, l_quantity, o_totalprice). This is
# the probe that caught asof_join treating NULL join keys as a
# matchable group (SQL NULL = NULL never matches) and carrying
# per-value fills past genuinely NULL-valued right rows.
FACT_SUBSET = [
    "asof_enrich", "latest_per_key", "tumbling_window", "lag_window",
    "interval_join", "fold_count", "value_percentiles",
    "tpch_q1", "tpch_q6", "orders_rollup", "tpch_q11",
]


@pytest.fixture(scope="module")
def fact_null_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls_fact")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part documents"
              " embeddings").split():
        con.sql(
            f"copy (select * from '{src}/{t}.parquet')"
            f" to '{d}/{t}.parquet' (format parquet)"
        )
    con.sql(
        f"""copy (
          select * replace (
            case when event_id % 13 = 4 then NULL else user_id end
              as user_id,
            case when event_id % 19 = 6 then NULL else value end as value)
          from '{src}/events.parquet'
        ) to '{d}/events.parquet' (format parquet)"""
    )
    con.sql(
        f"""copy (
          select * replace (
            case when (l_orderkey * 10 + l_linenumber) % 23 = 7
                 then NULL else l_discount end as l_discount,
            case when (l_orderkey * 10 + l_linenumber) % 29 = 9
                 then NULL else l_quantity end as l_quantity)
          from '{src}/lineitem.parquet'
        ) to '{d}/lineitem.parquet' (format parquet)"""
    )
    con.sql(
        f"""copy (
          select * replace (
            case when o_orderkey % 31 = 3 then NULL else o_totalprice end
              as o_totalprice)
          from '{src}/orders.parquet'
        ) to '{d}/orders.parquet' (format parquet)"""
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def fact_oracle(fact_null_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part documents embeddings"
              " events lineitem orders").split():
        con.sql(
            f"create view {t} as select * from"
            f" '{fact_null_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", FACT_SUBSET)
def test_fact_nulls_match_oracle(spark, fact_null_dir, fact_oracle, name):
    sdf = REGISTRY[name](spark, fact_null_dir).toPandas()
    odf = fact_oracle.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"
    a, b = _canon(sdf), _canon(odf)
    eq = (a == b) | (a.isna() & b.isna())
    assert bool(eq.all().all()), f"{name}: value mismatch on fact-NULL corpus"


def test_incremental_dedup_keeps_one_null_fp_doc(spark):
    """md5(NULL text) is a NULL fingerprint; GROUP BY keeps it as one
    group but the old min+join-back keeper silently LOST it (NULL
    keys never equi-join). The struct-argmin keeper retains exactly
    one NULL-text doc, matching the oracle's group-then-NOT-EXISTS
    (torture-corpus regression, r6)."""
    from rstreams_spark.functions.dedup import incremental_dedup_exact

    batch = spark.createDataFrame(
        [(4, None), (8, None), (12, "real text")],
        "doc_id bigint, text string",
    )
    seen = spark.createDataFrame([("deadbeef",)], "fp string")
    fresh, _ = incremental_dedup_exact(batch, seen)
    rows = {(r["doc_id"], r["text"]) for r in fresh.collect()}
    assert rows == {(4, None), (12, "real text")}


# third corpus: NULL event TIMES (the null_ts probe class, r7).
# A NULL instant has no position on the time axis: Spark sorts NULLs
# FIRST ascending where DuckDB sorts them LAST, and F.window/
# session_window silently drop them while epoch-arithmetic oracles
# kept a NULL group — 15 catalog divergences when first probed.
# Contract (core.py::_tev): every time-ordered/time-bucketed catalog
# query drops ts IS NULL at entry on BOTH engines.
TS_NULL_SUBSET = [
    "tumbling_window", "hopping_window", "session_window",
    "candles", "candles_rollup", "strat_classify",
    "lag_window", "asof_enrich",
    "chunk_fold", "chunk_fold_timeout", "take_while", "skip_while",
    "cycle_take", "merge_take", "skip_take", "ts_similarity_topk",
]


@pytest.fixture(scope="module")
def ts_null_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls_ts")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part documents"
              " embeddings orders lineitem").split():
        con.sql(
            f"copy (select * from '{src}/{t}.parquet')"
            f" to '{d}/{t}.parquet' (format parquet)"
        )
    con.sql(
        f"""copy (
          select * replace (
            case when event_id % 9 = 2 then NULL else ts end as ts)
          from '{src}/events.parquet'
        ) to '{d}/events.parquet' (format parquet)"""
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def ts_null_oracle(ts_null_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part documents embeddings"
              " events lineitem orders").split():
        con.sql(
            f"create view {t} as select * from"
            f" '{ts_null_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TS_NULL_SUBSET)
def test_ts_nulls_match_oracle(spark, ts_null_dir, ts_null_oracle, name):
    sdf = REGISTRY[name](spark, ts_null_dir).toPandas()
    odf = ts_null_oracle.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"
    a, b = _canon(sdf), _canon(odf)
    eq = (a == b) | (a.isna() & b.isna())
    assert bool(eq.all().all()), f"{name}: value mismatch on NULL-ts corpus"


def test_null_instants_dropped_at_entry(spark, ts_null_dir, ts_null_oracle):
    """The entry filter is the contract, not an accident of window
    semantics: tumbling_window's output counts cover exactly the
    non-NULL-ts rows, and no NULL window-start group appears."""
    from rstreams_spark.queries.core import tumbling_window as q

    pdf = q(spark, ts_null_dir).toPandas()
    assert not pdf["window_start_epoch"].isna().any()
    n_live = ts_null_oracle.sql(
        "select count(ts) from events"
    ).fetchone()[0]
    assert int(pdf["n"].sum()) == n_live

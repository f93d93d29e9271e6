"""Non-finite measures (the nonfinite probe class, r7): NaN/±Inf
land in real corpora via parser junk and upstream overflow.

Two contracts pinned here:

1. The exact-micros-sum domain EXCLUDES non-finite measures, loudly
   and on BOTH engines. Spark's unguarded floor() is the trap:
   floor(NaN) is silently 0 (a NaN row contributes NOTHING to an
   "exact" sum, no error) and floor(Inf) is silently Long.MaxValue
   (corrupts the total; only crashes if a second one overflows the
   long sum — tpch_q20 returned wrong numbers silently when first
   probed). tpch._finite_or_raise and _util._sql_fin raise the same
   actionable message instead.
2. Profiling aggregates that cannot place a non-finite value
   (value_histogram bins, value_percentiles quantiles) exclude them
   by contract on both engines; NULLs keep their engine-identical
   behavior (NULL bin group / ignored by quantiles).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from rstreams_spark.queries import ORACLES, REGISTRY

GUARD_MSG = "exact micros-sum domain"

COPY_TABLES = (
    "region nation customer supplier part orders documents embeddings"
).split()


@pytest.fixture(scope="module")
def nonfinite_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nonfinite")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in COPY_TABLES:
        con.sql(
            f"copy (select * from '{src}/{t}.parquet')"
            f" to '{d}/{t}.parquet' (format parquet)"
        )
    con.sql(
        f"""copy (
          select * replace (
            case when event_id % 19 = 3 then 'NaN'::double
                 when event_id % 23 = 5 then 'Infinity'::double
                 when event_id % 29 = 7 then '-Infinity'::double
            else value end as value)
          from '{src}/events.parquet'
        ) to '{d}/events.parquet' (format parquet)"""
    )
    con.sql(
        f"""copy (
          select * replace (
            case when l_orderkey % 31 = 3 then 'NaN'::double
            else l_quantity end as l_quantity)
          from '{src}/lineitem.parquet'
        ) to '{d}/lineitem.parquet' (format parquet)"""
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def nonfinite_oracle(nonfinite_dir):
    con = duckdb.connect()
    for t in (*COPY_TABLES, "events", "lineitem"):
        con.sql(
            f"create view {t} as select * from"
            f" '{nonfinite_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return (
        df.sort_values(by=list(df.columns))
        .reset_index(drop=True)
        .round(6)
    )


@pytest.mark.parametrize("name", ["fold_count", "tpch_q1"])
def test_micros_guard_raises_on_both_engines(
    spark, nonfinite_dir, nonfinite_oracle, name
):
    with pytest.raises(Exception, match=GUARD_MSG):
        REGISTRY[name](spark, nonfinite_dir).toPandas()
    with pytest.raises(Exception, match=GUARD_MSG):
        nonfinite_oracle.sql(ORACLES[name]).df()


@pytest.mark.parametrize("name", ["value_histogram", "value_percentiles"])
def test_profiling_aggs_exclude_nonfinite(
    spark, nonfinite_dir, nonfinite_oracle, name
):
    sdf = REGISTRY[name](spark, nonfinite_dir).toPandas()
    odf = nonfinite_oracle.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"
    a, b = _canon(sdf), _canon(odf)
    eq = (a == b) | (a.isna() & b.isna())
    assert bool(eq.all().all()), f"{name}: value mismatch"


def test_micros_split_null_passthrough_and_finite_identity(spark):
    """NULL measures must NOT trip the guard (sum skips them, as
    before), and in-domain values must produce the identical hi/lo
    split the unguarded form did."""
    from pyspark.sql import functions as F

    from rstreams_spark.queries.tpch import _hi, _lo

    df = spark.createDataFrame(
        [(1.25,), (None,), (-2.75,)], "x double"
    )
    rows = df.select(
        _hi("x").alias("h"), _lo("x").alias("l")
    ).orderBy(F.col("h").asc_nulls_last()).collect()
    assert [(r["h"], r["l"]) for r in rows] == [
        (-3, 250000),
        (1, 250000),
        (None, None),
    ]


def test_micros_split_rejects_out_of_domain_magnitude(spark):
    """A FINITE 1e15 is outside the micros domain too (hi/lo
    recovery ambiguity): the guard must raise, same message as
    NaN/Inf, on both engines."""
    import duckdb as _d

    from rstreams_spark.queries._util import sql_mhi
    from rstreams_spark.queries.tpch import _hi

    df = spark.createDataFrame([(1e15,)], "x double")
    with pytest.raises(Exception, match=GUARD_MSG):
        df.select(_hi("x")).collect()
    con = _d.connect()
    try:
        with pytest.raises(Exception, match=GUARD_MSG):
            con.sql(f"select {sql_mhi('x')} from (values (1e15)) t(x)").df()
    finally:
        con.close()


# --- non-finite embedding COMPONENTS (nonfinite_vec probe class, r9) ---
#
# 3. The embedding-similarity family drops vectors whose L2 norm is
#    not a positive finite double at ENTRY on both engines
#    (functions/similarity.py::rankable_norm <-> _SQL_NZ's
#    isfinite): NaN compares greater than 0 on BOTH engines, so the
#    zero-norm predicate alone kept NaN/Inf vectors, whose NaN
#    cosine sorts GREATEST under desc and silently occupies top-k.
# 4. Per-element ops that cannot place a NaN/Inf raise the SAME loud
#    domain error on both engines: embedding_quantize's int8 has no
#    NaN (Spark's unguarded floor(NaN) emitted q=0 while DuckDB's
#    bigint cast threw — asymmetric until guarded), and
#    embedding_dim_stats' micros sums ride invariant 19's guard.

VEC_GUARD_MSG = "finite-component domain"


@pytest.fixture(scope="module")
def nanvec_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nanvec")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (*COPY_TABLES[:-1], "events", "lineitem"):
        con.sql(
            f"copy (select * from '{src}/{t}.parquet')"
            f" to '{d}/{t}.parquet' (format parquet)"
        )
    con.sql(
        f"""copy (
          select * replace (
            case when vec_id % 19 = 3 then
              [case when i = 1 then 'NaN'::float
               else embedding[i] end
               for i in range(1, len(embedding)+1)]
            when vec_id % 23 = 5 then
              [case when i = 2 then 'Infinity'::float
               else embedding[i] end
               for i in range(1, len(embedding)+1)]
            else embedding end as embedding)
          from '{src}/embeddings.parquet'
        ) to '{d}/embeddings.parquet' (format parquet)"""
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def nanvec_oracle(nanvec_dir):
    con = duckdb.connect()
    for t in (*COPY_TABLES[:-1], "events", "lineitem", "embeddings"):
        con.sql(
            f"create view {t} as select * from"
            f" '{nanvec_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_similarity_family_drops_nonfinite_norms_at_entry(
    spark, nanvec_dir, nanvec_oracle
):
    sdf = REGISTRY["ann_lsh_topk"](spark, nanvec_dir).toPandas()
    odf = nanvec_oracle.sql(ORACLES["ann_lsh_topk"]).df()
    assert _canon(sdf).equals(_canon(odf))
    # no poisoned vector may appear on either join side
    poisoned = {v for v in sdf["vec_id"] if v % 19 == 3 or v % 23 == 5}
    assert not poisoned
    assert not {
        p for p in sdf["probe_id"] if p % 19 == 3 or p % 23 == 5
    }


def test_quantize_raises_same_guard_on_both_engines(
    spark, nanvec_dir, nanvec_oracle
):
    with pytest.raises(Exception, match=VEC_GUARD_MSG):
        REGISTRY["embedding_quantize"](spark, nanvec_dir).toPandas()
    with pytest.raises(Exception, match=VEC_GUARD_MSG):
        nanvec_oracle.sql(ORACLES["embedding_quantize"]).df()


def test_dim_stats_rides_the_micros_guard_on_both_engines(
    spark, nanvec_dir, nanvec_oracle
):
    with pytest.raises(Exception, match=GUARD_MSG):
        REGISTRY["embedding_dim_stats"](spark, nanvec_dir).toPandas()
    with pytest.raises(Exception, match=GUARD_MSG):
        nanvec_oracle.sql(ORACLES["embedding_dim_stats"]).df()

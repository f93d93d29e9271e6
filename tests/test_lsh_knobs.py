"""The LSH tuning surface (r9, VERDICT item 5): bands / rows-per-band /
bucket-cap / tau are public parameters of the minhash family, sized by
the collision curve P(s) = 1-(1-s^r)^b — and every setting remains
parity-testable because the DuckDB twins take the same (num_perm,
bands). This file pins a NON-DEFAULT setting end to end:

- engine parity of the candidate pairs at (num_perm=32, bands=16, r=2)
  at sf0.1 (the gate SFs only ever run the default 64/16/r=4);
- a recall gate against exact hashed-shingle Jaccard ground truth at
  BOTH the default and the non-default setting;
- the documented tradeoff direction (shallower curve -> more
  candidates) on real data, not just in the formula.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from rstreams_spark.functions.dedup import (
    lsh_collision_probability, minhash_signature, near_dup_pairs,
)
from rstreams_spark.queries._util import t
from rstreams_spark.queries.dedupq import _sql_bands, _sql_shingles, _sql_sig

SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def _spark_pairs(spark, sf_dir, num_perm, bands, cap):
    docs = t(spark, sf_dir, "documents")
    return sorted(
        (r.id1, r.id2)
        for r in near_dup_pairs(
            docs, num_perm=num_perm, bands=bands, bucket_cap=cap
        ).collect()
    )


def _oracle_pairs(sf_dir, num_perm, bands, cap):
    con = duckdb.connect()
    try:
        con.sql(
            f"create view documents as select * from '{sf_dir}/documents.parquet'"
        )
        cap_pred = f"between 2 and {cap}" if cap else ">= 2"
        sql = f"""
            with {_sql_shingles(2)},
            {_sql_sig(num_perm)},
            {_sql_bands(num_perm, bands)},
            bq as (
              select band_idx, band_key from bands
              group by band_idx, band_key having count(*) {cap_pred}
            ),
            bandsq as (
              select bands.* from bands join bq using (band_idx, band_key)
            )
            select distinct a.doc_id as id1, b.doc_id as id2
            from bandsq a join bandsq b
              on a.band_idx = b.band_idx and a.band_key = b.band_key
             and a.doc_id < b.doc_id
        """
        return sorted((r[0], r[1]) for r in con.sql(sql).fetchall())
    finally:
        con.close()


def test_nondefault_setting_engine_parity_sf01_and_sf1(spark):
    """(32, 16, r=2, cap=128) — a setting no gate SF ever runs — must
    be pair-identical between Spark and DuckDB at sf0.01 AND sf0.1."""
    for sf in (SF01, SF1):
        got = _spark_pairs(spark, sf, 32, 16, 128)
        want = _oracle_pairs(sf, 32, 16, 128)
        assert got == want and len(got) > 0


def _ground_truth(spark, sf_dir, s0):
    """Exact hashed-shingle Jaccard >= s0 pairs, LSH-free: all-pairs
    over the per-doc hash sets (fine at sf0.01's ~500 docs)."""
    docs = t(spark, sf_dir, "documents")
    from rstreams_spark.functions.dedup import doc_shingles

    sig = minhash_signature(
        doc_shingles(docs, "text", 2), 1, with_hash_set=True
    ).select("doc_id", "__shset")
    a = sig.select(
        F.col("doc_id").alias("id1"), F.col("__shset").alias("s1")
    )
    b = sig.select(
        F.col("doc_id").alias("id2"), F.col("__shset").alias("s2")
    )
    inter = F.size(F.array_intersect(F.col("s1"), F.col("s2")))
    jac = inter / (F.size("s1") + F.size("s2") - inter)
    return {
        (r.id1, r.id2)
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .where(jac >= s0)
        .select("id1", "id2")
        .collect()
    }


@pytest.mark.parametrize(
    "num_perm,bands,floor",
    [
        (64, 16, 0.95),  # default: P(0.7) = 1-(1-0.7^4)^16 ~ 0.989
        (32, 16, 0.97),  # r=2:     P(0.7) = 1-(1-0.49)^16  ~ 0.99998
    ],
)
def test_recall_vs_exact_ground_truth(spark, num_perm, bands, floor):
    """LSH candidates (uncapped, pure curve) must contain at least
    the theory-implied fraction of true Jaccard >= 0.7 pairs."""
    truth = _ground_truth(spark, SF01, 0.7)
    assert len(truth) >= 10  # corpus actually contains near-dups
    r = num_perm // bands
    assert lsh_collision_probability(0.7, bands, r) >= floor
    cands = set(_spark_pairs(spark, SF01, num_perm, bands, None))
    recall = len(truth & cands) / len(truth)
    assert recall >= floor


def test_shallower_curve_yields_more_candidates(spark):
    """The documented tradeoff on real data: r=2 (shallower curve)
    must produce a superset-scale candidate volume vs r=4 at equal
    bands, and the curve helper must order the same way."""
    c_r4 = _spark_pairs(spark, SF01, 64, 16, None)
    c_r2 = _spark_pairs(spark, SF01, 32, 16, None)
    assert len(c_r2) > len(c_r4)
    for s in (0.1, 0.3, 0.5, 0.7):
        assert lsh_collision_probability(
            s, 16, 2
        ) > lsh_collision_probability(s, 16, 4)


def test_near_dup_pairs_knob_guards_and_tau(spark):
    """num_perm must divide by bands; tau adds the exact-verify cut
    and the jaccard column."""
    docs = t(spark, SF01, "documents")
    with pytest.raises(ValueError, match="not divisible"):
        near_dup_pairs(docs, num_perm=64, bands=10)
    verified = near_dup_pairs(docs, tau=0.7)
    rows = verified.collect()
    assert verified.columns == ["id1", "id2", "jaccard"]
    assert rows and all(r.jaccard >= 0.7 for r in rows)
    # the verified pairs are a subset of the raw candidates
    raw = set(_spark_pairs(spark, SF01, 64, 16, 128))
    assert {(r.id1, r.id2) for r in rows} <= raw

"""Adversarial-skew corpus contract: 5,000 byte-identical documents
(one maximally hot LSH bucket / every shingle at DF = corpus size).
Pins the division of labor the dedup family documents:

- exact dedup owns byte-identical copies — it flags ALL of them;
- the near-dup candidates (minhash/ngram/winnowing) DROP the hot
  bucket by the documented bucket/DF caps (boilerplate defense —
  a 5,000-member bucket would emit 12.5M pairs, the O(m²) shape the
  caps exist to forbid) and return zero pairs WITHOUT going
  quadratic, OOMing, or erroring;
- nothing crashes, and every query returns within a small bound on
  a corpus this size.

If a cap is ever loosened or made lossy in a different way, this
test makes the behavior change loud instead of silent.
"""

from __future__ import annotations

import duckdb
import pytest

from rstreams_spark.queries import REGISTRY

TABLES = "region nation customer supplier part orders lineitem events embeddings".split()
N_DOCS = 5000


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_skew")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"copy (select * from '/root/testdata/sf0.001/{t}.parquet')"
            f" to '{d}/{t}.parquet' (format parquet)"
        )
    con.sql(
        f"""
        copy (
          select cast(range as bigint) as doc_id,
                 (select source from '/root/testdata/sf0.001/documents.parquet' limit 1) as source,
                 (select text from '/root/testdata/sf0.001/documents.parquet' limit 1) as text,
                 (select lang from '/root/testdata/sf0.001/documents.parquet' limit 1) as lang
          from range({N_DOCS})
        ) to '{d}/documents.parquet' (format parquet)
        """
    )
    con.close()
    return str(d)


def test_exact_dedup_owns_identical_docs(spark, skew_dir):
    assert REGISTRY["dedup_exact"](spark, skew_dir).count() == N_DOCS


def test_near_dup_caps_drop_the_hot_bucket(spark, skew_dir):
    # documented cap semantics: the single all-docs bucket exceeds
    # every candidate cap → zero pairs, zero errors, no O(m²) blowup
    for name in ("dedup_minhash", "dedup_ngram_jaccard", "dedup_winnowing"):
        assert REGISTRY[name](spark, skew_dir).count() == 0, name


def test_simhash_still_groups_identical_docs(spark, skew_dir):
    # simhash buckets on the 32-bit signature (no pair explosion in
    # its grouped form) — identical docs share one signature
    assert REGISTRY["dedup_simhash"](spark, skew_dir).count() == N_DOCS

"""Corpus-scale probe sets: the broadcast ANN paths must FAIL loudly
past the cap_probes bound, and the *_shuffle fallbacks must answer the
same probe set with a shuffled hash join (no probe broadcast) — the
SURVEY §6 contract's escape hatch, end-to-end.

sf0.1's embeddings table has 2,000 rows, so probe_mod=1 yields a
probe set ~2× the 1,024 cap — exactly the "probe frame derived from
the corpus" regime the cap exists to catch.
"""

import pytest
from pyspark.sql import functions as F

from rstreams_spark import plans
from rstreams_spark.queries import REGISTRY
from rstreams_spark.queries.dedupq import _ann_lsh_impl, ivf_topk

from conftest import SF_SMOKE

SF01 = "/root/testdata/sf0.1"

# sf0.1 is driver-generated; on hosts without it these tests SKIP like
# the other env-gated tests rather than erroring (ADVICE r7)
import os as _os

pytestmark = pytest.mark.skipif(
    not _os.path.isdir(SF01), reason="sf0.1 corpus absent on this host"
)


def test_lsh_broadcast_fails_loudly_on_corpus_probes(spark):
    """Full-corpus probe set through the BROADCAST path: the in-plan
    assert_true guard kills the job with the actionable message
    instead of silently shipping a corpus-sized broadcast."""
    with pytest.raises(Exception, match="max_probes"):
        _ann_lsh_impl(spark, SF01, probe_mod=1, shuffle=False).collect()


def test_lsh_shuffle_answers_corpus_probes(spark):
    """The same full-corpus probe set through the SHUFFLE fallback
    runs to completion: every corpus vector with a non-empty bucket
    cohort gets ranked neighbors."""
    out = _ann_lsh_impl(spark, SF01, probe_mod=1, shuffle=True)
    rows = out.groupBy().agg(
        F.countDistinct("probe_id").alias("p"), F.count("*").alias("n")
    ).collect()[0]
    assert rows.n > 0 and rows.p > 1024  # more probes than the cap


def test_ivf_broadcast_fails_loudly_on_corpus_probes(spark):
    with pytest.raises(Exception, match="max_probes"):
        ivf_topk(spark, SF01, probe_mod=1, shuffle=False).collect()


def test_ivf_shuffle_answers_corpus_probes(spark):
    out = ivf_topk(spark, SF01, probe_mod=1, shuffle=True)
    assert out.select("probe_id").distinct().count() > 1024


def test_shuffle_variants_match_broadcast_values(spark):
    """The split is physical-plan-only: on an identical (under-cap)
    probe set both modes return row-identical results."""
    a = sorted(
        _ann_lsh_impl(spark, SF_SMOKE, probe_mod=50, shuffle=False).collect()
    )
    b = sorted(
        _ann_lsh_impl(spark, SF_SMOKE, probe_mod=50, shuffle=True).collect()
    )
    assert a == b
    c = sorted(ivf_topk(spark, SF_SMOKE, probe_mod=50, shuffle=False).collect())
    d = sorted(ivf_topk(spark, SF_SMOKE, probe_mod=50, shuffle=True).collect())
    assert c == d


def test_shuffle_plans_have_no_probe_broadcast(spark):
    """Plan pin for the fallback (r10 shape): both sides shuffle once
    on the route key into the bucket-grouped Arrow kernel
    (FlatMapGroupsInPandas) — NO cap guard (uncapped by design) and
    NO probe broadcast. ivf_topk_shuffle still broadcasts the
    `cells`-row centroid table for routing — that broadcast is
    size-bounded by construction, not by a cap."""
    txt = plans.explain_str(REGISTRY["ann_lsh_topk_shuffle"](spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in txt
    assert "max_probes" not in txt
    assert "BroadcastExchange" not in txt  # no cents routing here
    txt = plans.explain_str(REGISTRY["ivf_topk_shuffle"](spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in txt
    assert "max_probes" not in txt

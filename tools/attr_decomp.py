"""sf10 stage attribution for source_overlap and decontaminate_fuzzy
(VERDICT r11 item 1 — the two biggest sf10 absolutes after
dedup_clusters, which tools/cc_decomp.py already decomposes).

Each query is re-run stage-by-stage with EAGER materialization
between stages, so per-stage wall time and the carried row counts
are attributed instead of guessed:

source_overlap (queries/textq.py::source_overlap):
  A. gram explode -> groupBy(gram).collect_set(source) — the one
     corpus-sized shuffle (gram count recorded);
  B. per-source totals + map-side i<j pair expansion + pair agg +
     broadcast joins, from the already-materialized gram-set frame.

decontaminate_fuzzy (queries/dedupq.py::fuzzy_contaminated):
  A. shingles -> minhash signatures (+hash sets) — the signature agg;
  B. band rows -> capped eval buckets -> candidate join (distinct
     candidate count recorded);
  C. exact-jaccard verify joins + best-match window, from the
     materialized candidates/signatures.

The staged pipelines copy the catalog expressions; drift is guarded
by asserting row-identical output vs the fused catalog query at the
first (smallest) SF argument. If stage sums land well under the
fused time, something re-scans in the fused plan (fix); if a single
stage owns the decade step, that stage is the scale seam (fix or
record the counted law in PERF.md).

Timing discipline: run with the machine otherwise idle (CLAUDE.md
host-noise note); results append to the file named by
$ATTR_OUT (default attr_decomp_results.txt) — never scrape stdout.

Usage: python tools/attr_decomp.py [sf_dir ...]
       (default: testdata sf0.1, .localdata/sf1, .localdata/sf10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = [
    "/root/testdata/sf0.1",
    os.path.join(HERE, ".localdata", "sf1"),
    os.path.join(HERE, ".localdata", "sf10"),
]


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _eager(df) -> tuple:
    """Eager checkpoint + count: the next stage starts from
    materialized partitions, never re-running this one."""
    t0 = time.perf_counter()
    out = df.localCheckpoint(eager=True)
    n = out.count()
    return out, time.perf_counter() - t0, n


def _overlap_gsets(spark, sf_dir):
    from pyspark.sql import functions as F

    from rstreams_spark.functions.core import ensure_fanout_parallelism
    from rstreams_spark.functions.dedup import grams
    from rstreams_spark.functions.text import tokens
    from rstreams_spark.queries._util import t
    from rstreams_spark.queries.textq import OVERLAP_N

    docs = t(spark, sf_dir, "documents")
    return (
        ensure_fanout_parallelism(docs)
        .select(
            "source",
            F.explode(grams(tokens(F.col("text")), OVERLAP_N)).alias("gram"),
        )
        .where(F.col("source").isNotNull())
        .groupBy("gram")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )


def _overlap_tail(gsets):
    from pyspark.sql import functions as F

    per_src = (
        gsets.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_grams"))
        .localCheckpoint(eager=False)
    )
    pairs_col = F.flatten(
        F.transform(
            F.col("srcs"),
            lambda a, i: F.transform(
                F.slice(F.col("srcs"), i + 2, F.size(F.col("srcs"))),
                lambda b: F.struct(a.alias("source_a"), b.alias("source_b")),
            ),
        )
    )
    pairs = (
        gsets.select(F.explode(pairs_col).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count("*").alias("shared_grams"))
    )
    pa = per_src.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("grams_a")
    )
    pb = per_src.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("grams_b")
    )
    return (
        pairs.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a", "source_b",
            F.col("shared_grams").cast("long").alias("shared_grams"),
            F.col("grams_a").cast("long").alias("grams_a"),
            F.col("grams_b").cast("long").alias("grams_b"),
            (
                F.col("shared_grams")
                / (F.col("grams_a") + F.col("grams_b") - F.col("shared_grams"))
            ).alias("jaccard"),
        )
    )


def _fuzzy_stages(spark, sf_dir):
    """Returns (sig_builder, bands_from_sig, verify_from) matching
    queries/dedupq.py::fuzzy_contaminated stage-for-stage."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from rstreams_spark.functions.dedup import (
        doc_shingles, lsh_band_rows, minhash_signature,
    )
    from rstreams_spark.queries._util import t
    from rstreams_spark.queries.dedupq import (
        BANDS, DECON_EVAL_SOURCE, DECON_FUZZY_TAU, LSH_BUCKET_CAP, NUM_PERM,
    )
    from rstreams_spark.session import oha_session

    spark = oha_session(spark)
    docs = t(spark, sf_dir, "documents")
    ev_ids = docs.where(
        F.col("source") == DECON_EVAL_SOURCE
    ).select("doc_id").localCheckpoint(eager=False)

    def build_sig():
        sh = doc_shingles(docs, "text", 2, id_col="doc_id")
        return minhash_signature(sh, NUM_PERM, id_col="doc_id",
                                 with_hash_set=True)

    def build_cands(sig):
        bands = lsh_band_rows(sig, NUM_PERM, BANDS, id_col="doc_id")
        wb = Window.partitionBy("band_idx", "band_key")
        ev_bands = (
            bands.join(ev_ids, "doc_id")
            .select(F.col("doc_id").alias("eval_id"), "band_idx", "band_key")
            .withColumn("__m", F.count("*").over(wb))
            .where(F.col("__m") <= LSH_BUCKET_CAP)
            .drop("__m")
        )
        tr_bands = bands.join(ev_ids, "doc_id", "left_anti")
        return (
            tr_bands.join(ev_bands, ["band_idx", "band_key"])
            .select("doc_id", "eval_id")
            .distinct()
        )

    def build_verify(sig, cands):
        sets = sig.select(
            "doc_id",
            F.col("__shset").alias("shset"),
            F.size("__shset").cast("long").alias("n"),
        )
        s1 = sets.select("doc_id", F.col("shset").alias("s1"),
                         F.col("n").alias("n1"))
        s2 = sets.select(
            F.col("doc_id").alias("eval_id"),
            F.col("shset").alias("s2"), F.col("n").alias("n2"),
        )
        inter = F.size(F.array_intersect(F.col("s1"), F.col("s2")))
        jac = inter / (F.col("n1") + F.col("n2") - inter)
        verified = (
            cands.join(s1, "doc_id")
            .join(s2, "eval_id")
            .select("doc_id", "eval_id", jac.alias("jac"))
            .where(F.col("jac") >= DECON_FUZZY_TAU)
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("jac").desc(), F.col("eval_id"))
        return (
            verified.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("doc_id", "eval_id", F.col("jac").alias("jaccard"))
        )

    return build_sig, build_cands, build_verify


def main() -> None:
    from rstreams_spark.queries import REGISTRY
    from rstreams_spark.session import gc_hygiene, get_spark

    out_path = os.environ.get(
        "ATTR_OUT", os.path.join(HERE, "attr_decomp_results.txt"))
    sfs = sys.argv[1:] or [p for p in DEFAULT_SFS if os.path.isdir(p)]
    spark = get_spark("attr_decomp")
    spark.sparkContext.setLogLevel("ERROR")
    lines: list[str] = [f"# attr_decomp @ {time.strftime('%F %T')}"]

    first = True
    for sf in sfs:
        # ---- source_overlap ------------------------------------
        gc_hygiene(spark)
        fused = _noop(REGISTRY["source_overlap"](spark, sf))
        gsets, ta, n_gsets = _eager(_overlap_gsets(spark, sf))
        tb = _noop(_overlap_tail(gsets))
        if first:
            a = REGISTRY["source_overlap"](spark, sf)
            b = _overlap_tail(gsets)
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
                "source_overlap staged tail drifted from the catalog query"
        lines.append(
            f"source_overlap {sf}: fused {fused:.2f}s | "
            f"A gram-sets {ta:.2f}s ({n_gsets} grams) | B tail {tb:.2f}s"
        )
        print(lines[-1], file=sys.stderr, flush=True)

        # ---- decontaminate_fuzzy --------------------------------
        gc_hygiene(spark)
        fused = _noop(REGISTRY["decontaminate_fuzzy"](spark, sf))
        build_sig, build_cands, build_verify = _fuzzy_stages(spark, sf)
        sig, ta, n_sig = _eager(build_sig())
        cands, tb, n_cands = _eager(build_cands(sig))
        tc = _noop(build_verify(sig, cands))
        if first:
            a = REGISTRY["decontaminate_fuzzy"](spark, sf)
            b = build_verify(sig, cands)
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
                "decontaminate_fuzzy staged tail drifted from the catalog query"
        lines.append(
            f"decontaminate_fuzzy {sf}: fused {fused:.2f}s | "
            f"A signatures {ta:.2f}s ({n_sig} docs) | "
            f"B candidates {tb:.2f}s ({n_cands} pairs) | C verify {tc:.2f}s"
        )
        print(lines[-1], file=sys.stderr, flush=True)
        first = False

    with open(out_path, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"# results appended to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""End-to-end training-data curation pipeline over the documents
table — the workflow this engine exists for at 100 TB, runnable at
any SF:

  scan → source-level mirror triage (gram-overlap Jaccard ≥ 0.9
         kills scraped-twice feeds before any per-document work)
       → quality score → language ID → token count   (per-doc stats)
       → repetition cut (Gopher word/n-gram repetition keep-flag)
       → exact dedup (md5 fingerprint, keep min doc_id)
       → minhash-LSH candidate pairs → exact-jaccard verify (≥ 0.5)
       → connected components → keep one canonical doc per cluster
       → decontaminate vs a held-out eval shard (3-gram overlap)
       → pack survivors into fixed-token-budget bins per shard
       → chunk survivors into 64-token training windows

The verify stage is the load-bearing one: raw LSH candidates chain
unrelated docs through band collisions, so clustering them directly
over-merges; verification touches only candidate pairs (never n²).

Every stage is a declarative DataFrame plan from the library: the
whole pipeline is ONE lazy DAG until the final actions, so Catalyst
prunes columns and pushes filters across stage boundaries — there is
no per-stage materialization unless asked for.

Run: python examples/llm_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from rstreams_spark.functions.dedup import (
    connected_components, doc_shingles, lsh_band_pairs, minhash_signature,
)
from rstreams_spark.functions.text import (
    hash64, md5_fingerprint, token_chunks, tokens,
)
from rstreams_spark.queries._util import t
from rstreams_spark.queries.dedupq import fuzzy_contaminated
from rstreams_spark.queries.textq import (
    CHUNK_OVERLAP, CHUNK_SIZE, SPAN_KEY_MUL, SPAN_SIZE, SPLIT_SALT,
    SPLIT_TRAIN_PCT, SPLIT_VAL_PCT, TOKEN_BUDGET, budget_prefix,
)
from rstreams_spark.session import get_spark


MIRROR_TAU = 0.9  # gram-set Jaccard above which two sources are mirrors


def run(spark, sf_dir: str) -> dict:
    docs = t(spark, sf_dir, "documents")
    n_raw = docs.count()

    # source-level mirror triage FIRST: a scraped-twice feed is
    # cheapest to kill wholesale before any per-document work (the
    # overlap matrix is two gram-keyed shuffles; near-dupping 10⁹ of
    # a mirror's documents is not). Keep the lexicographically-first
    # source of each mirror pair; the drop list is ≤ S rows.
    from rstreams_spark.queries.textq import source_overlap

    mirror_drop = (
        source_overlap(spark, sf_dir)
        .where(F.col("jaccard") >= MIRROR_TAU)
        .select(F.col("source_b").alias("source"))
        .distinct()
    )
    n_mirror_sources = mirror_drop.count()
    if n_mirror_sources:
        docs = docs.join(F.broadcast(mirror_drop), "source", "left_anti")

    # per-doc stats + a simple keep-gate (the real pipeline would
    # threshold on the full text_quality score)
    toks = tokens(F.col("text"))
    stats = docs.select(
        "doc_id", "text",
        F.size(toks).alias("n_tokens"),
        md5_fingerprint(F.col("text")).alias("fp"),
    ).where(F.col("n_tokens") >= 5)

    # repetition cut: Gopher-style keep flag (top-2-gram / dup-3-gram
    # char shares) — boilerplate and degenerate repeats go first so
    # the dedup stages never shingle them
    from rstreams_spark.queries.textq import quality_repetition

    keep_ids = quality_repetition(spark, sf_dir).where("keep").select("doc_id")
    # stats feeds every later stage (exact dedup, shingling, counts):
    # materialize once so the repetition subplan (explode + 2 shuffle
    # aggs) doesn't re-run per downstream action (invariant #9)
    stats = stats.join(keep_ids, "doc_id", "left_semi").localCheckpoint(eager=False)
    n_rep = stats.count()

    # exact dedup: keep the min doc_id per content fingerprint.
    # exact feeds the LSH shingling/signature subtree AND the
    # survivors join below — materialize once (invariant 9)
    exact = (
        stats.groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(stats, ["fp", "doc_id"])
        .drop("fp")
        .localCheckpoint(eager=False)
    )
    n_exact = exact.count()

    # near-dup: LSH candidates -> exact-jaccard verify (candidate
    # pairs only, via in-row array_intersect over hashed shingle
    # sets) -> components -> keep cluster minimum
    sh = doc_shingles(exact, "text", 2)
    pairs = lsh_band_pairs(minhash_signature(sh, 16), 16, 8)
    sets = (
        sh.select("doc_id", hash64(F.col("shingle")).alias("h"))
        .groupBy("doc_id")
        .agg(F.array_distinct(F.collect_list("h")).alias("hs"))
        .withColumn("n", F.size("hs"))
    )
    s1 = sets.select(F.col("doc_id").alias("id1"), F.col("hs").alias("hs1"), F.col("n").alias("n1"))
    s2 = sets.select(F.col("doc_id").alias("id2"), F.col("hs").alias("hs2"), F.col("n").alias("n2"))
    inter = F.size(F.array_intersect(F.col("hs1"), F.col("hs2")))
    verified = (
        pairs.join(s1, "id1").join(s2, "id2")
        .where(inter / (F.col("n1") + F.col("n2") - inter) >= 0.5)
        .select("id1", "id2")
    )
    clusters = connected_components(verified)
    losers = clusters.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    survivors = exact.join(losers, "doc_id", "left_anti")
    n_near = survivors.count()

    # decontaminate: drop survivors sharing any 3-gram with the
    # held-out eval shard (src0 stands in for the benchmark set)
    full = t(spark, sf_dir, "documents")
    eval_grams = (
        doc_shingles(full.where(F.col("source") == "src0"), "text", 3)
        .select("shingle")
        .distinct()
    )
    # train feeds the contamination 3-gram subtree AND the clean
    # anti-join — materialize once (invariant 9)
    train = (
        survivors.join(full.select("doc_id", "source"), "doc_id")
        .where(F.col("source") != "src0")
        .localCheckpoint(eager=False)
    )
    contaminated = (
        doc_shingles(train, "text", 3)
        .join(eval_grams, "shingle")
        .select("doc_id")
        .distinct()
    )
    # fuzzy decontamination: near-DUPLICATES of eval docs that exact
    # n-gram overlap misses (paraphrased/lightly-edited
    # contamination). The frame-parameterized operator runs on
    # exactly (train survivors ∪ eval shard) — the signature pass
    # never re-scans docs the earlier funnel stages already dropped
    # (at 100 TB a full-corpus re-shingle would dominate the stage);
    # flagged ids union with the exact-overlap set before the
    # anti-join
    corpus = train.select("doc_id", "text").unionByName(
        full.where(F.col("source") == "src0").select("doc_id", "text")
    )
    fuzzy_flagged = fuzzy_contaminated(
        corpus, full.where(F.col("source") == "src0").select("doc_id")
    ).select("doc_id")
    contaminated = contaminated.unionByName(fuzzy_flagged).distinct()
    # clean feeds four downstream actions (span stats, packing,
    # chunking, split counts) — materialize once or each action
    # re-runs the whole dedup/decontamination pipeline (invariant 9;
    # same rationale as the stats checkpoint above)
    clean = train.join(contaminated, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    n_clean = clean.count()

    # span-level exact substring dedup (Lee et al.) over the clean
    # corpus: remove 16-token spans whose text occurred earlier, and
    # account for the tokens it reclaims (catalog constants — this
    # demonstrates the same operator as queries/textq.py::span_dedup)
    spans = clean.select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    ).select(  # materialized tokens: invariant 5 (per-chunk lambda)
        "doc_id",
        F.explode(token_chunks(F.col("__toks"), SPAN_SIZE, 0)).alias("c"),
    ).select(
        "doc_id",
        F.col("c.chunk_idx").cast("long").alias("span_idx"),
        F.col("c.chunk_text").alias("span_text"),
        F.col("c.n_tokens").cast("long").alias("span_tokens"),
    ).where(
        # same in-plan key-domain guard as the catalog span_dedup: a
        # >= SPAN_KEY_MUL span index would silently collide composite
        # keys across documents and corrupt the dup-span/token counts
        F.assert_true(
            F.col("span_idx") < SPAN_KEY_MUL,
            F.lit("span_idx overflows the composite-key domain; "
                  "raise SPAN_KEY_MUL for multi-1.6B-token documents"),
        ).isNull()
    ).withColumn(
        "__key", F.col("doc_id") * SPAN_KEY_MUL + F.col("span_idx")
    ).localCheckpoint(eager=False)  # feeds first_span AND the join probe
    first_span = spans.groupBy("span_text").agg(F.min("__key").alias("__fk"))
    span_cut = (
        spans.join(first_span, "span_text")
        .where(F.col("__key") != F.col("__fk"))
        .agg(F.count("*").alias("dup_spans"),
             F.coalesce(F.sum("span_tokens"), F.lit(0)).alias("dup_tokens"))
        .collect()[0]
    )

    # pack the clean docs into 512-token bins, per source shard
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = clean.select(
        "doc_id", "source", "n_tokens",
        F.floor(cum / 512).cast("long").alias("bin_id"),
    )
    n_bins = packed.select("source", "bin_id").distinct().count()
    survivors = clean

    # chunk survivors into training windows
    chunks = survivors.select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    ).select(  # materialized tokens: invariant 5 (per-chunk lambda)
        "doc_id",
        F.explode(
            token_chunks(F.col("__toks"), CHUNK_SIZE, CHUNK_OVERLAP)
        ).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.n_tokens")
    n_chunks = chunks.count()

    # sampling mix over the surviving corpus: α=0.5 temperature
    # weights per source (what the data loader would draw with)
    mix = (
        clean.groupBy("source")
        .agg(F.sum("n_tokens").alias("n_tokens"))
        .select("source", F.sqrt("n_tokens").alias("w"))
    )
    top_mix = [
        (r["source"], r["w"])
        for r in mix.orderBy(F.desc("w"), "source").limit(3).collect()
    ]

    # per-source token-budget sampling over the final corpus: the
    # mixing step that turns weights into an actual training subset
    # (hash-ordered greedy prefix per source — retry-stable; the ONE
    # shared formulation, budget_prefix, applied to the pipeline's
    # own frame)
    budgeted = budget_prefix(clean, TOKEN_BUDGET)
    n_budget = budgeted.count()

    # deterministic train/val/test split over the final corpus — the
    # pre-training sanity gate (stable under retries: content hash,
    # never random())
    bucket = hash64(F.col("doc_id").cast("string"), salt=SPLIT_SALT) % 100
    split_col = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    splits = {
        r["split"]: r["n"]
        for r in clean.groupBy(split_col.alias("split"))
        .agg(F.count("*").alias("n"))
        .collect()
    }

    return {
        "raw": n_raw, "mirror_sources_dropped": n_mirror_sources,
        "after_repetition": n_rep, "after_exact": n_exact,
        "after_near_dup": n_near, "after_decontam": n_clean,
        "budget_sampled": n_budget,
        "dup_spans": span_cut["dup_spans"], "dup_tokens": span_cut["dup_tokens"],
        "bins": n_bins, "chunks": n_chunks, "top_mix": top_mix,
        "splits": splits,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    c = run(spark, sf_dir)
    print(
        f"docs: {c['raw']} raw "
        f"({c['mirror_sources_dropped']} mirror sources dropped) "
        f"-> {c['after_repetition']} after repetition cut "
        f"-> {c['after_exact']} after exact dedup "
        f"-> {c['after_near_dup']} after near-dup clustering "
        f"-> {c['after_decontam']} after decontamination (exact+fuzzy) "
        f"-> {c['budget_sampled']} in the per-source token budget "
        f"-> {c['bins']} packed bins, {c['chunks']} training chunks; "
        f"span dedup reclaims {c['dup_tokens']} tokens "
        f"({c['dup_spans']} duplicate spans); "
        f"top sampling sources: {[s for s, _ in c['top_mix']]}; "
        f"split: {c['splits']}"
    )


if __name__ == "__main__":
    main()

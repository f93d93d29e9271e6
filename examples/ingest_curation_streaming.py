"""Training-data curation AT INGEST — the llm_corpus_pipeline's
front gates running live on a document stream:

  document stream → repetition cut (stateless Gopher scorer)
                  → exact dedup (watermarked state, first copy wins)
                  → near-dup suppression vs the corpus LSH index
                    (foreachBatch signature + jaccard verify)
                  → eval decontamination (native in-plan n-gram gate,
                    exact InSet + Bloom-probed large-shard variant)
                  → per-source token-budget admission (r5)
                  → (sink: what a lakehouse writer would commit)

Everything here is streaming-legal and shuffle-light: the
repetition scorer is a stateless Arrow ``mapInPandas`` (no state, no
watermark — pure per-batch parallelism), and the dedup stage keeps
one fingerprint per seen document inside the watermark horizon.
Batch re-curation (the full pipeline with near-dup clustering and
decontamination) stays in ``llm_corpus_pipeline.py``; this is the
day-0 gate that keeps obvious junk from ever landing.

Run: python examples/ingest_curation_streaming.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from rstreams_spark.queries._util import t
from rstreams_spark.session import get_spark
from rstreams_spark.sinks import writers
from rstreams_spark.streaming.curation import (
    eval_gram_bloom, eval_gram_hashes, stream_budget_sample,
    stream_decontaminate_ngrams_bloom,
    stream_decontaminate_ngrams_native, stream_quality_repetition,
)
from rstreams_spark.streaming.dedup import (
    minhash_index, stream_dedup_exact, stream_dedup_minhash,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest-curation")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp(prefix="ingest_curation_"))

    # replay the documents table as a file stream of arriving docs
    docs_dir = work / "docs"
    docs = t(spark, sf_dir, "documents")
    n_raw = docs.count()
    (
        docs.selectExpr(
            "doc_id", "text", "source",
            "timestamp '2024-01-01' + interval 1 second * doc_id as ts",
        ).write.json(str(docs_dir))
    )
    stream = spark.readStream.schema(
        "doc_id bigint, text string, source string, ts timestamp"
    ).json(str(docs_dir))

    # gate 1: repetition cut — stateless, per-batch parallel
    scored = stream_quality_repetition(stream)
    kept_ids = scored.where("keep")
    q1 = writers.stream_to_memory(kept_ids, "rep_kept", "append")
    q1.processAllAvailable()
    q1.stop()
    n_rep = spark.sql("select count(*) n from rep_kept").collect()[0]["n"]

    # gate 2: live exact dedup over the full doc stream (first copy
    # of identical normalized content wins; state bounded by horizon)
    deduped = stream_dedup_exact(stream, "text", "ts", horizon="1 hour")
    q2 = writers.stream_to_memory(deduped, "dedup_kept", "append")
    q2.processAllAvailable()
    q2.stop()
    n_dedup = spark.sql("select count(*) n from dedup_kept").collect()[0]["n"]

    # gate 2b: NEAR-dup suppression against the existing corpus —
    # batch-built LSH index (here: the src0 shard stands in for the
    # lake), each microbatch signatured + jaccard-verified against it
    # via foreachBatch; only survivors reach the sink callback
    ib, iset = minhash_index(docs.where(F.col("source") == "src0"))
    ib, iset = ib.localCheckpoint(), iset.localCheckpoint()
    neardup_kept = []
    q2b = stream_dedup_minhash(
        stream.where(F.col("source") != "src0").select("doc_id", "text"),
        ib, iset,
        sink=lambda df, epoch: neardup_kept.append(df.count()),
    ).start()
    q2b.processAllAvailable()
    q2b.stop()
    n_neardup = sum(neardup_kept)

    # gate 3: eval decontamination at ingest — NATIVE r6 gate: the
    # eval shard's gram xxhash64 set becomes an in-plan InSet probe,
    # so tokenize + gram assembly + membership all run inside
    # whole-stage codegen (no Python per row, no broadcast variable)
    ev_docs = docs.where(F.col("source") == "src0")
    gram_set = eval_gram_hashes(spark, ev_docs, n=3)
    decon = stream_decontaminate_ngrams_native(
        stream.where(F.col("source") != "src0"), gram_set
    )
    q3 = writers.stream_to_memory(decon, "decon_kept", "append")
    q3.processAllAvailable()
    q3.stop()
    n_decon = spark.sql("select count(*) n from decon_kept").collect()[0]["n"]

    # gate 3b: same gate, Bloom-probed — k getbit lookups against one
    # packed-long array literal; O(1) per-microbatch planning and ~4×
    # the exact InSet's eval-shard capacity, at ~5e-4 FPR (false
    # positives over-drop, the safe direction for decontamination)
    bloom = eval_gram_bloom(spark, ev_docs, n=3)
    decon_b = stream_decontaminate_ngrams_bloom(
        stream.where(F.col("source") != "src0"), bloom
    )
    q3b = writers.stream_to_memory(decon_b, "decon_bloom_kept", "append")
    q3b.processAllAvailable()
    q3b.stop()
    n_decon_b = spark.sql(
        "select count(*) n from decon_bloom_kept"
    ).collect()[0]["n"]

    # gate 4: per-source token-budget admission — one long of state
    # per source; arrival order is the admission order
    budgeted = stream_budget_sample(
        stream.withColumn(
            "n_tokens",
            F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))).cast("long"),
        ),
        budget=600,
    )
    q4 = writers.stream_to_memory(budgeted, "budget_kept", "append")
    q4.processAllAvailable()
    q4.stop()
    n_budget = spark.sql("select count(*) n from budget_kept").collect()[0]["n"]

    print(
        f"[ingest] {n_raw} arriving docs -> {n_rep} past the repetition "
        f"gate, {n_dedup} past exact dedup, {n_neardup} past near-dup "
        f"suppression vs the corpus index, {n_decon} past eval "
        f"decontamination ({n_decon_b} past the Bloom-probed variant), "
        f"{n_budget} admitted by the per-source token budget (gates run "
        "independently here; chain them behind one sink in production)"
    )


if __name__ == "__main__":
    main()

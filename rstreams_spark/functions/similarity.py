"""Vector similarity over `array<float>` embedding columns.

JVM-side math: ``zip_with`` + ``aggregate`` compute dot products as
sequential folds inside codegen — deterministic summation order
(matches the DuckDB oracle) and no Python in the loop.

Scale paths:
- ``cosine_pairs``: all-pairs only behind a bucketing key (caller
  supplies block/bucket column) — default usage buckets the join.
- ``brute_topk``: probes are broadcast; per-partition partial top-k
  via window rank after AQE-coalesced join (probe count ≪ corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["dot", "l2_norm", "cosine", "cosine_pairs", "brute_topk"]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays (as double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pairs(
    vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """Pairs (id1<id2) with cosine ≥ threshold.

    With ``bucket_col`` the self-join distributes on the bucket
    (LSH/IVF cell, label, …); without it this is an explicit
    all-pairs — correct but only for small/filtered inputs.
    """
    a = vecs.alias("a")
    b = vecs.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if bucket_col:
        cond = cond & (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
    sim = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            sim.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def brute_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k nearest corpus vectors per probe (cosine).

    Probes are broadcast (small side); ranking is a per-probe window
    — partitions by probe id, so parallelism = #probes × corpus
    partitioning upstream of the final rank.
    """
    p = probes.select(
        F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__probe_vec")
    )
    joined = corpus.crossJoin(F.broadcast(p)).where(
        F.col(id_col) != F.col(probe_id_col)
    )
    scored = joined.select(
        F.col(probe_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__probe_vec")).alias("cosine"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )

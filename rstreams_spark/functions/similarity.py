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

__all__ = [
    "dot", "l2_norm", "cosine", "cosine_pairs", "brute_topk",
    "hyperplanes", "lsh_bucket",
]


def hyperplanes(n_bits: int, dims: int, seed: int = 20240813) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes for sign-LSH (inlined into
    the DuckDB oracle, so parity is by construction)."""
    import random

    rnd = random.Random(seed)
    return [[float(rnd.choice((1.0, -1.0))) for _ in range(dims)] for _ in range(n_bits)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit j = (v · hp_j > 0). Vectors in the
    same bucket are likely cosine-similar; bucket count = 2^n_bits.
    Pure Catalyst folds — no Python per row."""
    bucket = None
    for j, hp in enumerate(planes):
        lit = F.array([F.lit(x) for x in hp])
        bit = F.when(dot(vec_col, lit) > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


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

    Scale shape: the (small, bounded) probe matrix ships to every
    task; each corpus partition computes a vectorized Arrow-batch
    matmul (numpy float64) and keeps only its LOCAL top-k per probe,
    so the final global rank sees ≤ partitions × k × probes rows —
    never the full corpus × probes cross product. This is the
    (b)-tier pattern from the design rules: built-in ops can't
    express a matmul efficiently, so it's a vectorized batch UDF,
    never per-row Python.
    """
    import numpy as np
    import pandas as pd

    probe_rows = probes.select(id_col, vec_col).collect()  # bounded by contract
    pids = np.array([r[id_col] for r in probe_rows], dtype=np.int64)
    pmat = np.array([list(r[vec_col]) for r in probe_rows], dtype=np.float64)
    pmat = pmat / np.linalg.norm(pmat, axis=1, keepdims=True)

    schema = f"{probe_id_col} long, {id_col} long, cosine double"

    def local_topk(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ pmat.T  # (corpus_rows, probes)
            ids = pdf[id_col].to_numpy()
            out_p, out_i, out_c = [], [], []
            for j, pid in enumerate(pids):
                col = sims[:, j]
                mask = ids != pid  # exclude self
                cand_ids, cand_cos = ids[mask], col[mask]
                # deterministic local order: cosine desc, id asc
                order = np.lexsort((cand_ids, -cand_cos))[:k]
                out_p.extend([pid] * len(order))
                out_i.extend(cand_ids[order])
                out_c.extend(cand_cos[order])
            yield pd.DataFrame(
                {probe_id_col: out_p, id_col: out_i, "cosine": out_c}
            )

    # respects upstream partitioning: at scale the corpus scan is
    # already many tasks; forcing a repartition here only shuffles
    # the vectors and cold-starts extra Python workers
    local = corpus.select(id_col, vec_col).mapInPandas(local_topk, schema)
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return local.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)

"""Vector similarity over `array<float>` embedding columns.

JVM-side math: ``zip_with`` + ``aggregate`` compute dot products as
sequential folds inside codegen — deterministic summation order
(matches the DuckDB oracle) and no Python in the loop.

Scale paths:
- ``cosine_pairs``: all-pairs only behind a bucketing key (caller
  supplies block/bucket column) — default usage buckets the join.
- ``brute_topk``: the exact baseline. Probes ride a broadcast join
  (never a driver collect) behind a hard plan-side cap; the scored
  set is projected to scalar triplets before the rank shuffle. The
  *scale* answers for ANN are the LSH/IVF paths — brute force is
  inherently corpus × probes work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "dot", "l2_norm", "cosine", "cosine_pairs", "cosine_pairs_np",
    "brute_topk", "cap_probes", "hyperplanes", "lsh_bucket",
    "bucketed_topk_np", "lsh_topk", "rankable_norm",
    "routed_cosine_np", "stack_f64",
]

MAX_PROBES = 1024


def stack_f64(values, ids, caller: str):
    """Build the float64 (rows × dims) matrix every Arrow kernel
    needs, with a TARGETED error on ragged (mixed-dimension) inputs:
    a bare ``np.array(list(...))`` raises numpy's opaque
    "inhomogeneous shape" ValueError, while the JVM twins' zip_with
    dot silently yields NULL and drops the pair — dimension mismatch
    is corrupt data either way, so the kernels are deliberately
    STRICTER and name the offending ids (degenerate NORMS, by
    contrast, are filtered per invariant 20, not raised — see
    ``cosine_pairs_np``).

    ``values``/``ids`` are aligned sequences (pandas columns ok);
    NULL vectors must already be filtered (callers do)."""
    import numpy as np

    lens = [len(v) for v in values]
    if lens and len(set(lens)) > 1:
        from collections import Counter

        common = Counter(lens).most_common(1)[0][0]
        bad = [i for i, (v, n) in enumerate(zip(values, lens)) if n != common]
        bad_ids = [ids[i] if ids is not None else i for i in bad][:10]
        raise ValueError(
            f"{caller}: mixed embedding dimensions {sorted(set(lens))} "
            f"in one kernel batch — ids with non-majority dims "
            f"(first 10): {bad_ids}; embeddings must share one "
            "dimensionality (the JVM twin would silently NULL these "
            "pairs — filter or re-embed upstream)"
        )
    return np.array(list(values), dtype=np.float64)


def cap_probes(
    probes: DataFrame,
    max_probes: int,
    order_col: str,
    caller: str,
) -> DataFrame:
    """In-plan hard cap on a probe frame that is about to ride a
    ``F.broadcast()`` join: a row_number + ``assert_true`` guard
    fails the job the moment the probe side exceeds ``max_probes``,
    instead of silently shipping a corpus-scaling broadcast to every
    task (at 100× data a ``corpus/50`` "probe" frame is multi-GB —
    the guard turns that silent degradation into a loud error).

    Probe sets are user-query-sized BY CONTRACT (SURVEY §6): the
    catalog's ``vec_id % 50`` probe sets are bench stand-ins, and at
    every tested SF they sit far below the cap. The guard filter uses
    ``assert_true(...).isNull()`` (keeps every legal row) rather than
    a dropped column so column pruning cannot eliminate it; the
    single-partition row_number is itself bounded — it only ever
    sorts the probe frame whose size the cap is asserting.
    Callers above the cap should shuffle-join on bucket/cell instead
    of broadcasting.
    """
    guard = Window.orderBy(order_col)
    return (
        probes.withColumn("__pn", F.row_number().over(guard))
        .where(
            F.assert_true(
                F.col("__pn") <= max_probes,
                F.lit(
                    f"{caller}: probe set exceeds max_probes={max_probes}; "
                    "probes are user-query-sized by contract — shuffle-join "
                    "on the bucket/cell key for corpus-scale probe sets"
                ),
            ).isNull()
        )
        .drop("__pn")
    )


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


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    shuffle: bool = False,
    max_probes: int = MAX_PROBES,
) -> DataFrame:
    """Sign-LSH bucketed cosine top-k as a LIBRARY surface: rank the
    ``k`` most-cosine-similar corpus vectors per probe, comparing only
    within shared LSH buckets (candidate set shrinks ~2^bits×). The
    catalog's ``ann_lsh_topk``/``ann_lsh_topk_shuffle`` entries are
    this composition with the corpus-derived probe sets; user code
    calls it directly on its own (id, embedding) frames.

    Physical strategy per the probe-set contract (SURVEY §6):

    - ``shuffle=False``: probe side broadcasts behind ``cap_probes``'s
      in-plan guard — for user-query-sized probe sets (≤ max_probes).
    - ``shuffle=True``: both sides shuffle on the bucket key
      (``shuffle_hash`` hint, probe side builds the hash table),
      uncapped — the corpus-scale probe shape.

    Output: (probe_id, id_col, cosine, rank). Cosines are sequential
    JVM folds with norms hoisted above the join (one dot per candidate
    pair); ranking ties break on the corpus id. A probe never matches
    itself when both frames share ids (``id != probe_id``); NULL
    buckets (NULL embeddings) match nothing on either side, and
    ZERO-NORM vectors are dropped at entry on both sides — cosine is
    undefined for them, and the NaN a 0/0 division yields would sort
    GREATEST under desc on Spark, silently occupying top-k slots."""
    from pyspark.sql.window import Window as W

    pre = lambda df: df.select(  # noqa: E731 — tiny local shaping fn
        F.col(id_col), F.col(vec_col)
    ).withColumn("__bkt", lsh_bucket(F.col(vec_col), planes)).withColumn(
        "__nrm", l2_norm(F.col(vec_col))
    ).where(rankable_norm(F.col("__nrm")))  # NULL norm (NULL vec) also drops here
    c = pre(corpus)
    p = pre(probes).select(
        F.col(id_col).alias(probe_id_col),
        F.col(vec_col).alias("__p_vec"),
        F.col("__bkt").alias("__p_bkt"),
        F.col("__nrm").alias("__p_nrm"),
    )
    if shuffle:
        joined = c.join(p.hint("shuffle_hash"), F.col("__bkt") == F.col("__p_bkt"))
    else:
        p = cap_probes(p, max_probes, probe_id_col, "lsh_topk")
        joined = c.join(F.broadcast(p), F.col("__bkt") == F.col("__p_bkt"))
    scored = joined.where(F.col(id_col) != F.col(probe_id_col)).select(
        probe_id_col, id_col,
        (dot(F.col(vec_col), F.col("__p_vec"))
         / (F.col("__nrm") * F.col("__p_nrm"))).alias("cosine"),
    )
    w = W.partitionBy(probe_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(probe_id_col, id_col, "cosine",
                F.col("rank").cast("long").alias("rank"))
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays (as double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def rankable_norm(norm: Column) -> Column:
    """Entry predicate for every embedding-similarity op: a vector
    participates only when its L2 norm is positive AND finite.
    NULL (NULL vec — NULL compares false), zero (no direction, 0/0
    cosine), and non-finite norms (one NaN/±Inf component poisons
    the fold — nonfinite_vec probe class, r9) are all excluded by
    the same two comparisons on both engines: Spark and DuckDB both
    ORDER NaN greater than +Inf (total ordering, not IEEE unordered
    semantics), so ``norm < inf`` is false for NaN and +Inf alike —
    and an unfiltered NaN cosine would sort GREATEST under desc,
    silently occupying top-k slots. DuckDB twin:
    queries/dedupq.py::_SQL_NZ (norm > 0 and isfinite(norm) —
    isfinite selects the same set)."""
    return (norm > 0) & (norm < F.lit(float("inf")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pairs(
    vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Pairs (id1<id2) with cosine ≥ threshold.

    With ``bucket_col`` the self-join distributes on the bucket
    (LSH/IVF cell, label, …); without it this is an explicit
    all-pairs — correct but only for small/filtered inputs. The
    within-bucket join is inherently quadratic in bucket size (the
    SemDeDup inner loop is exactly this), so ``max_bucket`` installs
    an in-plan ``assert_true`` guard (cf. ``brute_topk``'s probe
    cap): the job fails loudly when a bucket outgrows the exact
    path, instead of silently shipping O(m²) work — the scale answer
    is finer buckets (k-means cells sized so m stays bounded), not a
    bigger cap.

    Norms are hoisted to the vector rows BEFORE the join — one fold
    per pair instead of three, same sqrt(Σx²) expression on the same
    data so the cosine doubles are bit-identical to the inline form
    (and to the oracle's per-pair computation).

    Entry contract (invariant 20): rows whose norm is not rankable
    (NULL vec, zero norm, NaN/±Inf component) are dropped at entry —
    they cannot form a defined cosine, and an unfiltered NaN cosine
    would pass ``>= threshold`` silently under Spark's NaN-greatest
    total ordering. Catalog callers pre-filter with ``rankable_norm``
    already; this in-function guard closes the direct-library
    surface (r9 advice).
    """
    from pyspark.sql.window import Window

    if max_bucket and not bucket_col:
        # the unbucketed all-pairs path is the dangerous quadratic
        # case — a caller passing only max_bucket would get silence
        # instead of protection
        raise ValueError(
            "cosine_pairs: max_bucket requires bucket_col (the cap "
            "guards within-bucket pair counts; the all-pairs path "
            "has no bucket to bound)"
        )
    pre = vecs.withColumn("__n", l2_norm(F.col(vec_col))).where(
        rankable_norm(F.col("__n"))
    )
    if bucket_col and max_bucket:
        w = Window.partitionBy(bucket_col).orderBy(id_col)
        pre = (
            pre.withColumn("__bn", F.row_number().over(w))
            .where(
                F.assert_true(
                    F.col("__bn") <= max_bucket,
                    F.lit(
                        f"cosine_pairs: bucket exceeds max_bucket="
                        f"{max_bucket}; use finer cells for the exact "
                        "within-bucket pair join"
                    ),
                ).isNull()
            )
            .drop("__bn")
        )
    # `pre` (norm fold + optional guard-window shuffle + any caller-
    # side bucketing work, e.g. the IVF cell argmin) feeds BOTH sides
    # of the self-join; per invariant 9 the per-branch-pruned subplans
    # do not canonicalize equal, so without materialization every
    # upstream pass runs twice. Lazy localCheckpoint, not persist().
    pre = pre.localCheckpoint(eager=False)
    a = pre.alias("a")
    b = pre.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if bucket_col:
        cond = cond & (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
    sim = dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        F.col("a.__n") * F.col("b.__n")
    )
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            sim.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def cosine_pairs_np(
    vecs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
    max_bucket: int | None = None,
) -> DataFrame:
    """Arrow/numpy twin of the bucketed ``cosine_pairs`` — identical
    pairs and identical cosine doubles, one grouped kernel instead
    of an interpreted-fold self-join. The JVM path's per-pair HOF
    dot fold is the SemDeDup inner loop's dominant cost (r5 verdict:
    ~6 s of semantic_clusters' sf1 wall); here each bucket becomes
    ONE ``applyInPandas`` group whose m×m dot matrix accumulates
    DIM-SEQUENTIALLY (``acc += v_d ⊗ v_d`` in a d-loop), so every
    pair's dot product reproduces the JVM/oracle fold's add order
    bit-for-bit — same doubles, same ``>= threshold`` keeps, no
    oracle change (CLAUDE.md invariant 2). Norms are the same
    dim-sequential self-dot + sqrt; the cosine divides by the
    (n_i·n_j) product exactly like the hoisted-norm JVM form.

    Scale shape: one shuffle on the bucket key (same as the
    self-join it replaces); the bucket cap is enforced in-kernel —
    a bucket past ``max_bucket`` raises and fails the job as loudly
    as the JVM path's assert_true (finer cells, not bigger caps, is
    the scale answer). Peak kernel memory is O(max_bucket²) doubles
    (~134 MB at the 4096 default) per concurrent group task.
    ``cosine_pairs`` stays as the all-JVM expression and the parity
    oracle for this path (row-level equality in
    tests/test_skew_similarity.py).

    Edge parity with the JVM self-join (exact, not approximate):

    - NULL buckets pair with NOTHING — the JVM join condition
      ``a.bucket == b.bucket`` is NULL for them, while a bare
      ``groupBy`` would collect all NULL-bucket rows into one group
      and pair them with each other. Filtered in-plan before the
      shuffle.
    - NULL vectors pair with nothing — the JVM dot over a NULL
      array is NULL, so ``NULL >= τ`` drops the pair; a NULL row
      would also crash the kernel's float64 stack. Same filter.
    - Degenerate norms (zero or non-finite) are EXCLUDED at entry,
      exactly like the JVM twin's ``rankable_norm`` guard
      (invariant 20): a zero-norm member has no defined cosine and a
      NaN/±Inf component poisons the fold, so such members simply
      never pair; the remaining members still do. The in-kernel mask
      computes the same dim-sequential norm the JVM filter does, so
      both paths exclude the identical member set and the surviving
      pairs stay bit-equal. The bucket cap counts SURVIVING members
      on both paths (JVM filters before the row_number guard).
    """
    import numpy as np
    import pandas as pd

    def score(key, pdf):
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        V = stack_f64(list(pdf[vec_col]), ids, "cosine_pairs_np")
        # rankable_norm twin (invariant 20): dim-sequential self-dot
        # first, mask degenerate members out BEFORE the O(m²) pair
        # accumulation and before the cap count — the JVM path
        # filters before its row_number guard the same way
        nacc = np.zeros(len(ids))
        for d in range(V.shape[1]):
            nacc += V[:, d] * V[:, d]
        n = np.sqrt(nacc)
        keepm = (n > 0.0) & np.isfinite(n)
        ids, V, n = ids[keepm], V[keepm], n[keepm]
        m = len(ids)
        if max_bucket and m > max_bucket:
            raise ValueError(
                f"cosine_pairs_np: bucket {key} has {m} members, "
                f"exceeds max_bucket={max_bucket}; use finer cells "
                "for the exact within-bucket pair kernel"
            )
        acc = np.zeros((m, m))
        for d in range(V.shape[1]):
            col = V[:, d]
            acc += col[:, None] * col[None, :]
        cos = acc / (n[:, None] * n[None, :])
        iu = np.triu_indices(m, k=1)
        c = cos[iu]
        keep = c >= threshold
        return pd.DataFrame(
            {
                "id1": ids[iu[0]][keep],
                "id2": ids[iu[1]][keep],
                "cosine": c[keep],
            }
        )

    return (
        vecs.select(id_col, vec_col, bucket_col)
        .where(F.col(bucket_col).isNotNull() & F.col(vec_col).isNotNull())
        .groupBy(bucket_col)
        .applyInPandas(score, "id1 bigint, id2 bigint, cosine double")
    )


def routed_cosine_np(
    corpus: DataFrame,
    probe_rows,
    route_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    norm_col: str = "v_norm",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Arrow/numpy twin of the broadcast probe⋈corpus cosine scoring
    stage shared by the routed ANN paths (IVF cells, LSH buckets):
    identical (probe_id, id, cosine) triplets to the
    ``join(F.broadcast(probes), route==p_route)`` + ``dot``-fold
    composition, ONE corpus Arrow pass instead of an interpreted HOF
    fold per candidate pair. The fold was the dominant cost of
    ``ivf_topk`` at sf10 (~19.6 s of 23.1 s — 2.56M pairs × 64-dim
    interpreted ``aggregate``; the fit + assign stages were 2.7 s).

    ``probe_rows`` are the ALREADY-ROUTED probe rows — plain driver
    rows with fields (probe_id_col, p_emb, p_norm, p_route) —
    collected from the routed probe frame, so the in-plan
    ``cap_probes`` assert_true guard executes inside that bounded
    collect job and the loud probe-cap contract is unchanged (the
    collect is ≤ max_probes × nprobe rows by the same guard — the
    bounded-driver-rows pattern the IVF fit established in r8).

    FP parity is EXACT (CLAUDE.md invariant 2), same argument as the
    sibling kernels: each pair's dot accumulates DIM-SEQUENTIALLY
    (``acc += v_d · p_d`` in a d-loop over float64 operands — the
    identical add order and 0.0 init as the ``zip_with``+``aggregate``
    fold), and the cosine divides by the ``n_v · n_p`` product of the
    SAME hoisted-norm doubles the JVM form multiplies (``norm_col``
    rides in from the corpus frame; ``p_norm`` from the collected
    probe rows — both JVM folds). No oracle change.

    Scale shape: zero new exchanges — the kernel inherits the corpus
    frame's partitioning; per task the probe matrix is
    O(Σ routed probes × dims) doubles (cap-bounded), per batch the
    score block is O(batch × probes-in-route) doubles. Self-pairs
    are NOT excluded here — callers filter ``id != probe_id`` after,
    exactly where the JVM composition filters.

    NULL/degenerate corpus vectors must be filtered upstream
    (callers do, per invariant 20 — a NULL would crash the float64
    stack exactly like the assign kernels, which is the documented
    STRICTER-than-JVM contract of ``stack_f64``)."""
    import numpy as np
    import pandas as pd

    by_route: dict = {}
    for r in probe_rows:
        by_route.setdefault(r["p_route"], []).append(r)
    routes = {}
    for route, rows in by_route.items():
        pids = np.array([r[probe_id_col] for r in rows], dtype=np.int64)
        P = stack_f64([r["p_emb"] for r in rows], pids, "routed_cosine_np")
        pn = np.array([r["p_norm"] for r in rows], dtype=np.float64)
        routes[route] = (pids, P, pn)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for route, sub in pdf.groupby(route_col, sort=False):
                hit = routes.get(route)
                if hit is None:
                    continue
                pids, P, pn = hit
                ids = sub[id_col].to_numpy()
                V = stack_f64(list(sub[vec_col]), ids, "routed_cosine_np")
                if V.shape[1] != P.shape[1]:
                    raise ValueError(
                        f"routed_cosine_np: corpus dims {V.shape[1]} "
                        f"!= probe dims {P.shape[1]} in route {route} "
                        "— both sides must share one embedding "
                        "dimensionality"
                    )
                vn = sub[norm_col].to_numpy(dtype=np.float64)
                m, p = len(ids), len(pids)
                acc = np.zeros((m, p))
                for d in range(V.shape[1]):
                    acc += V[:, d, None] * P[None, :, d]
                cos = acc / (vn[:, None] * pn[None, :])
                c = cos.ravel()
                # NaN→NULL across Arrow (invariant 22) would demote a
                # NaN cosine from rank-FIRST to rank-LAST downstream —
                # flag and restore JVM-side (library surface: callers
                # supply norm_col, so NaN cosines are reachable)
                nf = np.isnan(c)
                outs.append(
                    pd.DataFrame(
                        {
                            probe_id_col: np.tile(pids, m),
                            id_col: np.repeat(ids, p),
                            "cosine": np.where(nf, 0.0, c),
                            "__nan": nf,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    raw = corpus.select(id_col, vec_col, norm_col, route_col).mapInPandas(
        score,
        f"{probe_id_col} bigint, {id_col} bigint, cosine double, "
        "__nan boolean",
    )
    return raw.select(
        probe_id_col, id_col,
        F.when(F.col("__nan"), F.lit(float("nan")))
        .otherwise(F.col("cosine")).alias("cosine"),
    )


BUCKETED_TOPK_CHUNK = 4096


def bucketed_topk_np(
    corpus: DataFrame,
    probe_routed: DataFrame,
    k: int,
    route_col: str = "cell",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    norm_col: str = "v_norm",
    probe_id_col: str = "probe_id",
    max_members: int | None = None,
    chunk: int = BUCKETED_TOPK_CHUNK,
) -> DataFrame:
    """Corpus-scale probe scoring as ONE bucket-grouped Arrow stage:
    both sides shuffle on the route key (the same single exchange the
    ShuffledHashJoin paid), each vector crosses Arrow ONCE per routed
    bucket (the r10 pair kernel still shipped both embeddings PER
    PAIR — ~35 s of Arrow transfer at sf30's 58M ivf pairs), the
    bipartite cosine block computes dim-sequentially in-kernel, and
    only the per-(probe, bucket) top-(k+1) candidates are emitted —
    the downstream global rank window sees ≤ (k+1)·nprobe rows per
    probe, never the pair count. Exact: per-probe global top-k is a
    subset of its per-bucket top-(k+1)s (at most ONE self-pair per
    bucket can drop), the candidate order replicates the JVM rank's
    total order EXACTLY — cosine DESC with NaN GREATEST (Spark's
    double total ordering; a plain ``argsort(-cos)`` would bury NaN
    LAST and silently drop such rows from the candidate set — r10
    advice), ties id-ASC — and the cosines are the same
    dim-sequential accumulation the fold computes, divided by the
    same hoisted-norm product (invariant 2 — bit-identical doubles,
    no oracle change). Pinned row-equal against the retained JVM
    join+window composition in tests/test_kernel_parity.py.

    Memory contract: one task materializes one bucket's MEMBER FRAME
    (O(bucket_members × dims) — inherent to applyInPandas grouping),
    but the score block is CHUNKED (``BUCKETED_TOPK_CHUNK`` corpus
    rows × routed probes doubles at a time, per-chunk top-(k+1)
    candidates merged under the same total order — exact, since a
    global top-(k+1) row is its own chunk's top-(k+1)), so the
    quadratic term never materializes (r10 advice). ``max_members``
    adds a LOUD in-kernel cap on either side of the bipartite block
    (same pattern as cosine_pairs_np): a fixed-bucket index (LSH with
    constant bits) grows buckets linearly with the corpus, and past
    the cap the answer is more bits / corpus-sized cells, not a
    bigger task.

    Self-pairs (shared ids across sides) are excluded in-kernel —
    emitting them with a sentinel score would let a sparse bucket
    rank a fake row. NULL/degenerate vectors are filtered upstream
    by contract (rankable_norm on both sides)."""
    import numpy as np
    import pandas as pd

    c_tag = corpus.select(
        F.col(route_col).alias("__r"), F.lit(True).alias("__is_c"),
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
        F.col(norm_col).alias("__n"),
    )
    p_tag = probe_routed.select(
        F.col(route_col).alias("__r"), F.lit(False).alias("__is_c"),
        F.col(probe_id_col).alias("__id"), F.col(vec_col).alias("__v"),
        F.col(norm_col).alias("__n"),
    )

    def _sel_topk(ids2d, cos, take):
        # per-probe-column top-`take` under the JVM rank's TOTAL
        # order: cosine DESC NaN-GREATEST, ties id ASC. np.lexsort's
        # last key is primary; NaN is neutralized in the secondary
        # key because the primary (~isnan — False sorts first) has
        # already segregated it to the front.
        nanm = np.isnan(cos)
        negc = np.where(nanm, 0.0, -cos)
        order = np.lexsort((ids2d.T, negc.T, (~nanm).T))  # p × m
        return order[:, :take].T  # take × p

    def score(key, pdf):
        cm = pdf["__is_c"].to_numpy()
        cpdf = pdf[cm]
        ppdf = pdf[~cm]
        if not len(cpdf) or not len(ppdf):
            return pd.DataFrame(
                {probe_id_col: [], id_col: [], "cosine": [], "__nan": []}
            ).astype({probe_id_col: "int64", id_col: "int64",
                      "cosine": "float64", "__nan": "bool"})
        m, p = len(cpdf), len(ppdf)
        if max_members and max(m, p) > max_members:
            raise ValueError(
                f"bucketed_topk_np: route {key} has {m} corpus / {p} "
                f"probe members, exceeds max_members={max_members}; "
                "fixed-width buckets grow with the corpus — use more "
                "LSH bits or corpus-proportional cells for this path"
            )
        # id-ASC presort so candidate merge ties break toward the
        # smaller corpus id with ids as the explicit tertiary key
        cpdf = cpdf.sort_values("__id")
        pids = ppdf["__id"].to_numpy()
        P = stack_f64(list(ppdf["__v"]), pids, "bucketed_topk_np")
        pn = ppdf["__n"].to_numpy(dtype=np.float64)
        take = min(k + 1, m)
        cand_ids, cand_cos = [], []
        for lo in range(0, m, chunk):
            sub = cpdf.iloc[lo:lo + chunk]
            ids = sub["__id"].to_numpy()
            V = stack_f64(list(sub["__v"]), ids, "bucketed_topk_np")
            if V.shape[1] != P.shape[1]:
                raise ValueError(
                    f"bucketed_topk_np: corpus dims {V.shape[1]} != "
                    f"probe dims {P.shape[1]} in route {key} — both "
                    "sides must share one embedding dimensionality"
                )
            vn = sub["__n"].to_numpy(dtype=np.float64)
            mc = len(ids)
            acc = np.zeros((mc, p))
            for d in range(V.shape[1]):
                acc += V[:, d, None] * P[None, :, d]
            cos = acc / (vn[:, None] * pn[None, :])
            sel = _sel_topk(
                np.broadcast_to(ids[:, None], cos.shape),
                cos, min(take, mc),
            )
            cand_ids.append(ids[sel])
            cand_cos.append(np.take_along_axis(cos, sel, axis=0))
        aid = np.concatenate(cand_ids, axis=0)  # C × p
        aco = np.concatenate(cand_cos, axis=0)
        sel = _sel_topk(aid, aco, min(take, len(aid)))
        out_pid = np.repeat(pids, sel.shape[0])
        out_id = np.take_along_axis(aid, sel, axis=0).T.ravel()
        out_cos = np.take_along_axis(aco, sel, axis=0).T.ravel()
        keep = out_id != out_pid  # self-pairs excluded, like the JVM
        oc = out_cos[keep]
        # a NaN cosine would degrade to NULL crossing Arrow
        # (invariant 22's NULL/NaN fold) and then rank LAST in the
        # downstream desc window where the JVM twin ranks it FIRST —
        # carry the flag, restore NaN JVM-side
        nf = np.isnan(oc)
        return pd.DataFrame(
            {
                probe_id_col: out_pid[keep],
                id_col: out_id[keep],
                "cosine": np.where(nf, 0.0, oc),
                "__nan": nf,
            }
        )

    raw = (
        c_tag.unionByName(p_tag)
        .groupBy("__r")
        .applyInPandas(
            score,
            f"{probe_id_col} bigint, {id_col} bigint, cosine double, "
            "__nan boolean",
        )
    )
    return raw.select(
        probe_id_col, id_col,
        F.when(F.col("__nan"), F.lit(float("nan")))
        .otherwise(F.col("cosine")).alias("cosine"),
    )


def brute_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    max_probes: int = 1024,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per probe (cosine).

    Scale shape: the probe set rides a ``broadcast()`` join — it
    never touches the driver (no ``collect``), so executor memory is
    the only bound, and that bound is enforced *inside the plan*: a
    row_number + ``assert_true`` guard fails the job the moment the
    probe side exceeds ``max_probes``, instead of silently shipping
    an unbounded matrix to every task. The scored set is projected
    to (probe_id, id, cosine) scalar triplets, and Spark's
    WindowGroupLimit pushes the rank<=k cut BELOW the exchange — each
    partition ships only its local top-k per probe (≤ partitions × k
    × probes rows), never corpus × probes (pinned by
    tests/test_plans.py). Cosines are JVM sequential folds — same op
    order as the DuckDB oracle, bit-identical doubles, no per-row
    rounding needed. NULL and zero-norm vectors are dropped at entry
    on both sides (cosine undefined; same contract as ``lsh_topk``).
    """
    probe_sel = probes.select(
        F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__p_vec")
    )
    # NULL/zero-norm vectors drop at entry on BOTH sides (same
    # contract as lsh_topk): cosine is undefined for them and the
    # 0/0 division would raise under ANSI. Probe-side filter sits
    # BELOW the cap count-wise: only rankable probes count
    probe_sel = probe_sel.withColumn(
        "__p_norm", l2_norm(F.col("__p_vec"))
    ).where(rankable_norm(F.col("__p_norm")))
    # plan-side hard cap (shared guard): probes are small by
    # contract, so the single-partition row_number is itself bounded
    probe_sel = cap_probes(probe_sel, max_probes, probe_id_col, "brute_topk")
    # norms once per ROW, not per pair: l2_norm(v) is a pure fold, so
    # hoisting it above the join yields the identical double while
    # cutting the per-pair work to one dot product
    corpus_n = corpus.select(id_col, vec_col).withColumn(
        "__c_norm", l2_norm(F.col(vec_col))
    ).where(rankable_norm(F.col("__c_norm")))
    scored = (
        corpus_n.join(F.broadcast(probe_sel), F.col(id_col) != F.col(probe_id_col))
        .select(
            probe_id_col,
            id_col,
            (
                dot(F.col(vec_col), F.col("__p_vec"))
                / (F.col("__c_norm") * F.col("__p_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)

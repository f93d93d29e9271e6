"""Keyed joins, Spark-first.

Parity targets:
- ``interval_join`` — reference src/join.rs:21-140
  (``inner_join_streams``): records from two keyed streams match
  when keys are equal AND ``|t_left - t_right| < high_water_mark``
  (``within_window``, reference src/lib.rs:38-41, strict ``<``).
- ``stream_table_join`` — reference src/join.rs:142-156
  (``join_stream_table``): enrich each record with the latest table
  value for its key (left join; misses yield NULL, the reference's
  ``Option<T>``).
- ``asof_join`` — scale-friendly generalization: latest right-side
  record at-or-before each left record (what the reference's
  pruning loop approximates for ordered streams).

Scale notes: the interval join is an *equi*-join on the key — one
hash shuffle per side, range predicate evaluated post-match, AQE
skew-join splits hot keys. The table side of ``stream_table_join``
is latest-per-key (bounded by key cardinality) and is explicitly
``broadcast()`` so the fact stream never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["interval_join", "stream_table_join", "asof_join", "range_join"]


def range_join(
    points: DataFrame,
    point_col: str,
    ranges: DataFrame,
    lo_col: str,
    hi_col: str,
    cell_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-range join (lo ≤ p ≤ hi) as an equi-join, not a
    nested loop.

    Spark has no native range join: a plain non-equi condition plans
    as BroadcastNestedLoopJoin — O(|points|·|ranges|), dead at scale.
    Grid-bucketing fixes the plan shape: every range explodes into
    the grid cells it overlaps (⌈span/cell_width⌉ rows), every point
    maps to exactly ONE cell, and the join runs hash-partitioned on
    the cell id with the exact between-predicate evaluated after the
    match. Pick ``cell_width`` near the typical range span so range
    duplication stays O(1) per range. Points match each range at most
    once (single cell per point ⇒ no dedup needed). Only ``inner``
    and ``left`` (points-preserving) joins are supported: a range row
    is exploded per overlapped cell, so right/full would emit each
    unmatched range once per cell.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left' (points side), got {how!r}: "
            "exploded ranges would duplicate unmatched range rows per grid cell"
        )
    cell = lambda c: F.floor(c / F.lit(cell_width)).cast("long")  # noqa: E731
    r_cells = ranges.withColumn(
        "__cell",
        F.explode(F.sequence(cell(F.col(lo_col)), cell(F.col(hi_col)))),
    )
    p_cells = points.withColumn("__cell", cell(F.col(point_col)))
    cond = (
        (p_cells["__cell"] == r_cells["__cell"])
        & (p_cells[point_col] >= r_cells[lo_col])
        & (p_cells[point_col] <= r_cells[hi_col])
    )
    return p_cells.join(r_cells, cond, how).drop("__cell")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    high_water_mark: str,
    how: str = "inner",
) -> DataFrame:
    """Keyed join within a time band: |t_l - t_r| < high_water_mark.

    ``high_water_mark`` is an SQL interval string (e.g. ``'1 hour'``).
    Strict inequality matches reference ``within_window``
    (src/lib.rs:38-41). Columns from both sides are kept; ambiguous
    names get ``l_``/``r_`` disambiguation only when they collide.
    """
    lcols = set(left.columns)
    # guaranteed-unique disambiguation: keep prefixing until the new
    # name collides with neither side (a left column named r_<x>
    # would otherwise produce duplicate output names)
    taken = lcols | set(right.columns)
    rename: dict[str, str] = {}
    for c in right.columns:
        if c in lcols:
            new = f"r_{c}"
            while new in taken:
                new = f"r_{new}"
            rename[c] = new
            taken.add(new)
    r = right
    for c, new in rename.items():
        r = r.withColumnRenamed(c, new)
    r_key = rename.get(right_key, right_key)
    r_ts = rename.get(right_ts, right_ts)

    band = F.expr(f"INTERVAL {high_water_mark}")
    cond = (
        (F.col(left_key) == F.col(r_key))
        & (F.col(left_ts) > F.col(r_ts) - band)
        & (F.col(left_ts) < F.col(r_ts) + band)
    )
    return left.join(r, cond, how)


def stream_table_join(
    stream: DataFrame,
    stream_key: str,
    table: DataFrame,
    table_key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich stream records with table values for their key.

    The table is broadcast: latest-per-key tables are bounded by key
    cardinality, so shipping them to every executor avoids shuffling
    the (unbounded) fact side entirely — the Spark analog of the
    reference's shared in-memory ``RTable`` lookup.
    """
    cond = stream[stream_key] == table[table_key]
    return stream.join(F.broadcast(table), cond, how).drop(table[table_key])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    tolerance: str | None = None,
    right_tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Latest right record at-or-before each left record (per key).

    Composition of existing ops: union the two sides tagged by
    origin, one window sort per key carries right-side values forward
    (``last(..., ignorenulls)``) — a single shuffle on ``key``, no
    per-row lookups. ``tolerance`` (interval string) drops matches
    older than ``left_ts - tolerance``. When multiple right rows
    share a (key, ts), ``right_tiebreakers`` orders them (ascending;
    the LAST one wins — mirroring ``latest_per_key``); without
    tiebreakers their relative order is undefined.
    """
    tbs = list(right_tiebreakers)
    # JOIN-key semantics: NULL keys never match (SQL NULL = NULL is
    # false). The window composition would otherwise collect every
    # NULL-key row into one partition and happily "match" them —
    # dropping NULL-key RIGHT rows restores join semantics, while
    # NULL-key LEFT rows still ride their (right-free) partition and
    # emit with NULL fills, as a left join must.
    right = right.where(F.col(key).isNotNull())
    # the carried state is ONE struct per right row (values + match
    # ts), NOT per-value columns: the struct wrapper is non-NULL for
    # every right row even when individual values are NULL, so the
    # ignorenulls fill below skips only left rows — a genuinely
    # NULL-valued right row still matches (and yields NULL), exactly
    # like a true ASOF join. Per-value fills instead skipped NULLs
    # (stale value carried past a NULL-valued event) and could mix
    # values from DIFFERENT right rows.
    row_struct = F.struct(
        *[F.col(v).alias(v) for v in right_vals],
        F.col(right_ts).alias("__rt"),
    )
    row_type = right.select(row_struct.alias("s")).schema["s"].dataType
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("__t"), F.lit(1).alias("__is_left"),
        F.lit(None).cast(row_type).alias("__r_row"),
        *[F.lit(None).cast(right.schema[tb].dataType).alias(f"__tb_{tb}") for tb in tbs],
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
    )
    r_tagged = right.select(
        F.col(key), F.col(right_ts).alias("__t"), F.lit(0).alias("__is_left"),
        row_struct.alias("__r_row"),
        *[F.col(tb).alias(f"__tb_{tb}") for tb in tbs],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, left_ts)],
    )

    unioned = l_tagged.unionByName(r_tagged)
    # rights sort before lefts at equal timestamps → at-or-before;
    # tiebreakers order equal-(ts) right rows so `last` is
    # deterministic (left rows carry NULL tiebreakers and are already
    # ordered after rights by the __is_left term)
    w = Window.partitionBy(key).orderBy(
        "__t", "__is_left", *[f"__tb_{tb}" for tb in tbs]
    ).rowsBetween(Window.unboundedPreceding, 0)
    matched = F.last("__r_row", ignorenulls=True).over(w)
    filled = unioned.select(
        "*",
        *[matched[v].alias(f"r_{v}") for v in right_vals],
        matched["__rt"].alias("__match_t"),
    )
    out = filled.where(F.col("__is_left") == 1)
    if tolerance:
        tol = F.expr(f"INTERVAL {tolerance}")
        keep = F.col("__match_t") >= F.col("__t") - tol
        out = out.withColumns({f"r_{v}": F.when(keep, F.col(f"r_{v}")) for v in right_vals})
    return out.select(
        F.col(key),
        F.col("__t").alias(left_ts),
        *[c for c in left.columns if c not in (key, left_ts)],
        *[F.col(f"r_{v}") for v in right_vals],
    )

"""Streaming event-time windows (Structured Streaming).

The live-stream counterpart of ``operators.windows``: same grouped
aggregation on (key, window), driven by the microbatch engine with a
watermark bounding state — the role the reference's per-key KV-store
buffers play in ``tumbling_window``/``hopping_window``
(reference src/window.rs:42-177), but with distributed, spillable,
checkpointed state instead of a single-process map.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._chunks import concat_time_ordered

__all__ = [
    "stream_tumbling_window",
    "stream_hopping_window",
    "stream_tumbling_window_gapfill",
    "stream_hopping_window_gapfill",
    "stream_session_window",
]


def _stream_windowed(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    size: str,
    hop: str | None,
    watermark: str,
    *aggs: Column,
) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    win = F.window(F.col(ts), size, hop) if hop else F.window(F.col(ts), size)
    out = (
        df.withWatermark(ts, watermark)
        .groupBy(*keys, win.alias("window"))
        .agg(*aggs)
    )
    return out.select(
        *keys,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c not in (*keys, "window")],
    )


def stream_tumbling_window(
    df: DataFrame, key: str | Sequence[str], ts: str, size: str,
    *aggs: Column, watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling windows; append-mode emits a window once
    the watermark passes its end (late data beyond it is dropped —
    the scalable stand-in for the reference's emit-on-next-window)."""
    return _stream_windowed(df, key, ts, size, None, watermark, *aggs)


def stream_hopping_window(
    df: DataFrame, key: str | Sequence[str], ts: str, size: str, hop: str,
    *aggs: Column, watermark: str = "10 minutes",
) -> DataFrame:
    return _stream_windowed(df, key, ts, size, hop, watermark, *aggs)


def stream_session_window(
    df: DataFrame, key: str | Sequence[str], ts: str, gap: str,
    *aggs: Column, watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows on a live stream — the streaming twin
    of the batch ``session_window`` catalog entry. A session closes
    (and, in append mode, emits) once the watermark passes its end +
    gap; state per open session is one window struct + partial
    aggregates, merged by the engine when late rows bridge sessions.
    """
    keys = [key] if isinstance(key, str) else list(key)
    out = (
        df.withWatermark(ts, watermark)
        .groupBy(*keys, F.session_window(F.col(ts), gap).alias("window"))
        .agg(*aggs)
    )
    return out.select(
        *keys,
        F.col("window.start").alias("session_start"),
        F.col("window.end").alias("session_end"),
        *[c for c in out.columns if c not in (*keys, "window")],
    )


def stream_tumbling_window_gapfill(
    df: DataFrame, key: str, ts: str, size_seconds: int, value_col: str
) -> DataFrame:
    """Live empty-window emission — the streaming counterpart of
    ``operators.windows.tumbling_window(gap_fill=True)`` and the
    faithful realization of the reference's gap behavior
    (src/window.rs:71-84: crossing into a new window flushes the
    buffer AND emits one empty record per silent window between).

    Watermarked streaming aggregations can't emit windows no event
    ever touched, so this is a custom stateful operator
    (``applyInPandasWithState``): per-key state is the open window's
    index + running (n, sum); when a row lands in a later window the
    open window flushes, every skipped index emits ``(n=0,
    sum_value=0.0)``, and the new window opens. Epoch-aligned
    ``ts // size`` indices match both the batch operator's
    ``F.window`` grid and the reference's integer-division indexing.
    State is three scalars per key; rows later than an already-flushed
    window are dropped (the watermarked-agg late-data contract). The
    still-open final window stays buffered — same emit-on-next-event
    semantics as the reference, so a bounded replay never emits each
    key's last window (tests compare against batch minus final
    window).
    """
    out_schema = (
        f"{key} string, window_start timestamp, n long, sum_value double"
    )
    state_schema = "widx long, n long, s double"

    def fn(group_key, pdfs, state):
        import pandas as pd

        widx, n, s = state.get if state.exists else (None, 0, 0.0)
        starts: list[int] = []
        ns: list[int] = []
        sums: list[float] = []
        # concat chunks before sorting (CLAUDE invariant #7)
        whole = concat_time_ordered([pdf for pdf in pdfs if len(pdf)], ts)
        if len(whole):
            # vectorized: per-row work is one groupby over the window
            # index; the flush/gap-fill walk below runs over DISTINCT
            # windows (≪ rows), not raw events
            w_arr = whole[ts].astype("int64") // 1_000_000_000 // size_seconds
            if widx is not None:
                late = w_arr < widx  # beyond the open window: drop
                if late.any():
                    w_arr, whole = w_arr[~late], whole[~late]
            # count='size' counts every row (NaN included) to match
            # the batch twin's F.count("*"); 'sum' skips NaN like
            # F.sum. Caveat (documented, not enforced): pandas sum
            # may accumulate pairwise rather than in row order —
            # last-bit parity with the batch fold on huge per-window
            # groups is not guaranteed (CLAUDE invariant #2 applies
            # to oracle-gated batch paths; streaming parity tests
            # compare exact values only at test-sized groups).
            per_w = (
                whole[value_col].astype(float).groupby(w_arr.to_numpy())
                .agg(count="size", sum="sum")
                .sort_index()
            )
            for w, (cnt, sm) in per_w.iterrows():
                w = int(w)
                if widx is None:
                    widx = w
                elif w > widx:
                    starts.append(widx * size_seconds)
                    ns.append(n)
                    sums.append(s)
                    for g in range(widx + 1, w):  # silent windows
                        starts.append(g * size_seconds)
                        ns.append(0)
                        sums.append(0.0)
                    widx, n, s = w, 0, 0.0
                n += int(cnt)
                s += float(sm)
        if widx is not None:
            state.update((widx, n, s))
        yield pd.DataFrame(
            {
                key: [group_key[0]] * len(starts),
                "window_start": pd.to_datetime(starts, unit="s"),
                "n": ns,
                "sum_value": sums,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        df.select(F.col(key).cast("string").alias(key), ts, value_col)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def stream_hopping_window_gapfill(
    df: DataFrame,
    key: str,
    ts: str,
    size_seconds: int,
    hop_seconds: int,
    value_col: str,
) -> DataFrame:
    """Live empty-HOP emission — streaming counterpart of
    ``operators.windows.hopping_window(gap_fill=True)`` and of the
    reference's hopping gap behavior (src/window.rs:147-163: hops the
    stream skipped entirely still yield a record).

    ``size`` must be an integer multiple of ``hop`` (k = size/hop).
    Per-key state is a ring of the last k elementary hop-sized bucket
    accumulators (idx, n, sum) plus the last emitted window index —
    bounded at k entries per key regardless of event rate, because a
    bucket aggregate (not the events) is what's buffered. A hopping
    window w covers buckets [w, w+k-1]; it emits as soon as an event
    lands in bucket ≥ w+k (its content can no longer change — events
    are processed in event-time order per key, the reference's
    stream-order assumption). Windows whose buckets are all absent
    emit (n=0, sum_value=0.0). Trailing windows that are still open
    when a bounded replay ends stay unemitted — the same
    emit-on-progress contract as the tumbling variant (tests compare
    against batch minus each key's incomplete tail).
    """
    if size_seconds % hop_seconds:
        raise ValueError(
            f"size ({size_seconds}s) must be an integer multiple of "
            f"hop ({hop_seconds}s) for bucketed streaming gap-fill"
        )
    k = size_seconds // hop_seconds
    out_schema = (
        f"{key} string, window_start timestamp, n long, sum_value double"
    )
    state_schema = (
        "last_emitted long, bidx array<long>, bn array<long>, bs array<double>"
    )

    def fn(group_key, pdfs, state):
        import pandas as pd

        if state.exists:
            le_raw, bidx, bn, bs = state.get
            last_emitted = None if le_raw is None else int(le_raw)
            buckets = {
                int(i): [int(n), float(s)]
                for i, n, s in zip(bidx, bn, bs)
            }
        else:
            last_emitted, buckets = None, {}
        starts: list[int] = []
        ns: list[int] = []
        sums: list[float] = []

        def emit_through(w_hi: int) -> None:
            # emit every window w in (last_emitted, w_hi], in order
            nonlocal last_emitted
            for w in range(last_emitted + 1, w_hi + 1):
                n = sum(buckets[b][0] for b in range(w, w + k) if b in buckets)
                s = sum(buckets[b][1] for b in range(w, w + k) if b in buckets)
                starts.append(w * hop_seconds)
                ns.append(int(n))
                sums.append(float(s))
                last_emitted = w

        whole = concat_time_ordered([pdf for pdf in pdfs if len(pdf)], ts)
        if len(whole):
            # vectorized: rows collapse to per-bucket aggregates via
            # one groupby; the emission walk below visits DISTINCT
            # hop buckets (≪ rows). Equivalent to the row walk
            # because emission state only advances on bucket
            # transitions and buckets are visited in ascending order.
            b_arr = whole[ts].astype("int64") // 1_000_000_000 // hop_seconds
            # count='size' / NaN semantics: see the tumbling twin above
            per_b = (
                whole[value_col].astype(float).groupby(b_arr.to_numpy())
                .agg(count="size", sum="sum")
                .sort_index()
            )
            for b, (cnt, sm) in per_b.iterrows():
                b = int(b)
                if last_emitted is not None and b <= last_emitted:
                    # every window this bucket belongs to already
                    # emitted — drop (watermarked-agg late contract)
                    continue
                complete_hi = b - k  # windows ≤ this can't change
                if buckets:
                    if last_emitted is None:
                        # the grid starts at the earliest window
                        # containing a seen bucket (batch gap_fill grid)
                        first_w = min(buckets) - k + 1
                        if complete_hi >= first_w:
                            last_emitted = first_w - 1
                            emit_through(complete_hi)
                    elif complete_hi > last_emitted:
                        emit_through(complete_hi)
                cell = buckets.setdefault(b, [0, 0.0])
                cell[0] += int(cnt)
                cell[1] += float(sm)
                # prune buckets no unemitted window can reference
                if last_emitted is not None:
                    for old in [x for x in buckets if x <= last_emitted]:
                        del buckets[old]
        items = sorted(buckets.items())
        state.update((
            last_emitted,
            [i for i, _ in items],
            [v[0] for _, v in items],
            [v[1] for _, v in items],
        ))
        yield pd.DataFrame(
            {
                key: [group_key[0]] * len(starts),
                "window_start": pd.to_datetime(starts, unit="s"),
                "n": ns,
                "sum_value": sums,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        df.select(F.col(key).cast("string").alias(key), ts, value_col)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )

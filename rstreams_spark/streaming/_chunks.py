"""Shared group-chunk assembly for stateful Arrow kernels.

Every applyInPandasWithState kernel must CONCAT a group's Arrow
chunks before sorting (CLAUDE.md invariant 7 — per-chunk sorts
process a multi-chunk group out of time order and corrupt carried
state). This helper is that contract plus two measured fast paths:
a single-chunk group skips the copying ``pd.concat``, and an
already-monotonic batch skips the sort entirely (tied timestamps
have no defined order in either engine — the batch twins' Spark
sorts are equally non-stable — so monotonic == sorted).
"""

from __future__ import annotations

import pandas as pd


def concat_time_ordered(chunks: list, ts: str) -> "pd.DataFrame":
    """Concatenate a group's non-empty chunks and return them in
    ascending ``ts`` order (empty frame for no chunks).

    READ-ONLY CONTRACT: on the single-monotonic-chunk fast path the
    return value IS the caller's input frame (no copy) — an Arrow-
    backed buffer Spark owns. Kernels must treat the result as
    immutable: derive new columns on a copy (``df.assign`` / slice
    into new frames), never ``out[col] = ...`` in place, or the fast
    path would silently corrupt the input batch. All current
    consumers are read-only; the no-copy fast path is pinned by
    tests/test_streaming_disorder.py::test_concat_time_ordered_contract.
    """
    if not chunks:
        return pd.DataFrame()
    whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    if not whole[ts].is_monotonic_increasing:
        whole = whole.sort_values(ts)
    return whole

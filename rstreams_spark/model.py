"""RStream: keyed-stream fluent API over Spark DataFrames.

The reference models records as ``ParsedMessage<T> {key, value}``
(reference src/lib.rs:20-24) and builds pipelines by chaining
stream combinators. Here the same surface is a *thin declarative
wrapper* around a DataFrame plus a designated key column (and
optionally an event-time column, the analog of the reference's
``Dated`` trait, src/lib.rs:66-68). Every method immediately
delegates to DataFrame/Column expressions so Catalyst sees the whole
plan — the wrapper adds zero execution machinery (the reference's
Actor/executor role is played by Spark itself).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators import joins as _joins
from .operators import table as _table
from .operators import windows as _windows


class RStream:
    """A keyed (optionally timed) view over a DataFrame.

    ``key``: column name acting as the message key.
    ``ts``: event-time column (``Dated::timestamp`` analog); required
    by time-windowed operators.
    """

    def __init__(self, df: DataFrame, key: str, ts: str | None = None):
        self.df = df
        self.key = key
        self.ts = ts

    # -- construction -------------------------------------------------
    @classmethod
    def from_df(cls, df: DataFrame, key: str, ts: str | None = None) -> "RStream":
        return cls(df, key, ts)

    def _with(self, df: DataFrame) -> "RStream":
        return RStream(df, self.key, self.ts)

    # -- stateless ops (tokio-stream/futures StreamExt analogs) -------
    def map(self, *cols: Column | str) -> "RStream":
        """Projection; the ``StreamExt::map`` analog (declarative)."""
        return self._with(self.df.select(*cols))

    def with_column(self, name: str, col: Column) -> "RStream":
        return self._with(self.df.withColumn(name, col))

    def filter(self, cond: Column | str) -> "RStream":
        return self._with(self.df.where(cond))

    def filter_map(self, cond: Column | str, *cols: Column | str) -> "RStream":
        return self._with(self.df.where(cond).select(*cols))

    def merge(self, *others: "RStream") -> "RStream":
        """``StreamExt::merge``: interleave streams → union (order-free)."""
        out = self.df
        for o in others:
            out = out.unionByName(o.df, allowMissingColumns=False)
        return self._with(out)

    def take(self, n: int, order_by: Sequence[Column | str] | None = None) -> "RStream":
        df = self.df.orderBy(*order_by) if order_by else self.df
        return self._with(df.limit(n))

    def skip(self, n: int, order_by: Sequence[Column | str]) -> "RStream":
        """``StreamExt::skip``: ordered offset via row_number > n."""
        from pyspark.sql.window import Window

        w = Window.orderBy(*order_by)
        df = (
            self.df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > n)
            .drop("__rn")
        )
        return self._with(df)

    def chunk(self, size: int, order_by: Sequence[str]) -> "RStream":
        """``StreamExt::chunks``: tag each row with a ``__chunk`` id of
        ``size`` consecutive rows in ``order_by`` order; ``fold`` by
        ``__chunk`` downstream."""
        from .operators import stateless

        return self._with(stateless.chunk(self.df, size, order_by))

    def cycle(self, n: int, order_by: Sequence[str]) -> "RStream":
        """``StreamExt::cycle`` (bounded reading): tag each row with
        its round-robin slot ``__cycle`` = position mod ``n``."""
        from .operators import stateless

        return self._with(stateless.cycle_index(self.df, n, order_by))

    def throttle_sample(self, one_in: int, on: str | None = None) -> "RStream":
        """Deterministic 1-in-N down-sampling (batch analog of
        ``StreamExt::throttle`` back-pressure: bound the record rate).
        Uses the portable md5-based ``hash64`` (the same hash the
        catalog's oracle-checked ``throttle_sample`` uses), so the
        kept set is stable across runs AND across engines.
        """
        from .functions.text import hash64

        col = F.col(on or self.key).cast("string")
        return self.filter(F.pmod(hash64(col), F.lit(one_in)) == 0)

    def split(self, *conds: Column) -> list["RStream"]:
        """fork/split: one logical scan, N filtered branches."""
        return [self._with(self.df.where(c)) for c in conds]

    def fold(self, *aggs: Column, by: Sequence[str] | None = None) -> DataFrame:
        """``StreamExt::fold`` analog: aggregation (grouped if ``by``)."""
        if by:
            return self.df.groupBy(*by).agg(*aggs)
        return self.df.agg(*aggs)

    # -- stateful ops (reference src/window.rs, src/join.rs) ----------
    def tumbling_window(
        self, size: str, *aggs: Column, gap_fill: bool = False
    ) -> DataFrame:
        return _windows.tumbling_window(
            self.df, self.key, self.ts, size, *aggs, gap_fill=gap_fill
        )

    def hopping_window(
        self, size: str, hop: str, *aggs: Column, gap_fill: bool = False
    ) -> DataFrame:
        return _windows.hopping_window(
            self.df, self.key, self.ts, size, hop, *aggs, gap_fill=gap_fill
        )

    def lag_window(self, lag: int, value_cols: Sequence[str]) -> DataFrame:
        return _windows.lag_window(self.df, self.key, self.ts, lag, value_cols)

    def session_window(self, gap: str, *aggs: Column) -> DataFrame:
        return _windows.session_window(self.df, self.key, self.ts, gap, *aggs)

    def interval_join(self, other: "RStream", high_water_mark: str) -> DataFrame:
        return _joins.interval_join(
            self.df, other.df, self.key, other.key, self.ts, other.ts, high_water_mark
        )

    def asof_join(
        self, other: "RStream", right_vals: Sequence[str], tolerance: str | None = None
    ) -> DataFrame:
        return _joins.asof_join(
            self.df, other.df, self.key, self.ts, other.ts, right_vals, tolerance
        )

    def join_table(self, table: DataFrame, table_key: str, how: str = "left") -> "RStream":
        return self._with(
            _joins.stream_table_join(self.df, self.key, table, table_key, how=how)
        )

    def to_table(self, value_cols: Sequence[str] | None = None) -> DataFrame:
        """Changelog-table materialization: latest value per key."""
        return _table.latest_per_key(self.df, self.key, self.ts, value_cols)

    # -- escape hatch -------------------------------------------------
    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "RStream":
        return self._with(fn(self.df))

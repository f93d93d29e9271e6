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

    def skip(self, n: int, order_by: Sequence[str]) -> "RStream":
        """``StreamExt::skip``: ordered offset over the DISTRIBUTED
        global ordinal (range shards + offset stitch — never a
        single-task sort; see ``operators.stateless.ordinal``)."""
        from .operators import stateless

        df = (
            stateless.ordinal(self.df, order_by)
            .where(F.col("__ord") >= n)
            .drop("__ord")
        )
        return self._with(df)

    def take_while(self, cond: Column | str, order_by: Sequence[str]) -> "RStream":
        """``StreamExt::take_while``: rows strictly before the FIRST
        row (in ``order_by`` order) failing ``cond``. The stop point
        is a one-row min-ordinal aggregate broadcast back over the
        ordinal frame; the frame feeds both consumers through one
        lazy materialization (invariant #9)."""
        from .operators import stateless

        if isinstance(cond, str):
            cond = F.expr(cond)
        o = stateless.ordinal(self.df, order_by).localCheckpoint(eager=False)
        stop = o.where(~cond).agg(F.min("__ord").alias("__stop"))
        df = (
            o.join(F.broadcast(stop))
            .where(F.col("__stop").isNull() | (F.col("__ord") < F.col("__stop")))
            .drop("__ord", "__stop")
        )
        return self._with(df)

    def skip_while(self, cond: Column | str, order_by: Sequence[str]) -> "RStream":
        """``StreamExt::skip_while``: drop the ordered prefix where
        ``cond`` holds; everything from the first failing row on
        survives (including later rows where ``cond`` holds again)."""
        from .operators import stateless

        if isinstance(cond, str):
            cond = F.expr(cond)
        o = stateless.ordinal(self.df, order_by).localCheckpoint(eager=False)
        stop = o.where(~cond).agg(F.min("__ord").alias("__stop"))
        df = (
            o.join(F.broadcast(stop))
            .where(F.col("__ord") >= F.col("__stop"))
            .drop("__ord", "__stop")
        )
        return self._with(df)

    def chain(self, other: "RStream") -> "RStream":
        """``StreamExt::chain``: this stream exhausted first, then the
        other. Batch reading: a STRING ``__src`` path column — lead
        any downstream ``order_by`` with it. The encoding is
        prefix-free ('0'+left path, '1'+right path), so repeated
        chaining stays totally ordered: a.chain(b).chain(c) yields
        paths '00' < '01' < '1' (a plain integer tag would collapse
        a and b onto the same value on the second chain)."""
        def _tagged(df: DataFrame, bit: str) -> DataFrame:
            if "__src" in df.columns:
                return df.withColumn("__src", F.concat(F.lit(bit), F.col("__src")))
            return df.withColumn("__src", F.lit(bit))

        return self._with(
            _tagged(self.df, "0").unionByName(_tagged(other.df, "1"))
        )

    def zip(
        self,
        other: "RStream",
        order_by: Sequence[str],
        other_order_by: Sequence[str] | None = None,
        suffix: str = "_r",
    ) -> "RStream":
        """``StreamExt::zip``: pair the i-th rows of two ordered
        streams (inner join on the distributed ordinal — ends at the
        shorter stream, like the reference). Colliding column names
        on the right side get ``suffix``."""
        from .operators import stateless

        a = stateless.ordinal(self.df, order_by)
        b = stateless.ordinal(other.df, list(other_order_by or order_by))
        for c in other.df.columns:
            if c in self.df.columns:
                b = b.withColumnRenamed(c, c + suffix)
        b = b.withColumnRenamed("__ord", "__ord_r")
        df = (
            a.join(b, a["__ord"] == b["__ord_r"])
            .drop("__ord", "__ord_r")
        )
        return self._with(df)

    def flat_map(self, col: Column, alias: str) -> "RStream":
        """``StreamExt::flat_map`` (array reading): one output row per
        element of ``col``, other columns carried along — a narrow
        explode that pipelines with the scan."""
        return self._with(self.df.select("*", F.explode(col).alias(alias)))

    def chunk_timeout(
        self, size: int, gap_seconds: int, order_by: Sequence[str]
    ) -> "RStream":
        """``StreamExt::chunks_timeout``: chunks close at ``size`` rows
        OR a ``gap_seconds`` event-time silence (requires ``ts``);
        distributed like ``chunk`` (see ``stateless.chunk_timeout``).
        ``order_by`` is forced to lead with ``ts`` — the distributed
        boundary gap test is only correct under event-time order."""
        from .operators import stateless

        if not self.ts:
            raise ValueError("chunk_timeout requires an event-time column (ts)")
        order = list(order_by)
        if not order or order[0] != self.ts:
            order = [self.ts, *[c for c in order if c != self.ts]]
        return self._with(
            stateless.chunk_timeout(self.df, size, gap_seconds, self.ts, order)
        )

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

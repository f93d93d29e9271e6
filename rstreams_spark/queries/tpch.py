"""TPC-H-style analytics on the driver's star schema (SURVEY §2 #16-18).

Bench headliners: they exercise the engine's scan + shuffle + join
machinery the way a 100 TB warehouse would. Broadcast discipline:
only genuine dimensions (region/nation/supplier/part — bounded or
sublinear in SF) carry an explicit ``broadcast()`` hint. Fact-sized
sides (orders, customer, lineitem — linear in SF) are joined with no
hint so Catalyst/AQE picks shuffle joins, or dynamically broadcasts
when the *runtime* size qualifies; a static hint there would OOM
executors at 100×. Aggregations are single hash shuffles with
map-side partials. Adapted to the driver's schema (orders has
``o_orderpriority``, not ``o_shippriority``; dates span 1995-2001).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import epoch, sql_mhi, sql_mlo, sql_msum, sql_mtot, t

Q1_CUTOFF = "2001-08-06"
Q3_DATE = "1998-03-15"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


def _col(c) -> F.Column:
    return c if isinstance(c, F.Column) else F.col(c)


# ── exact integer-micros sums ────────────────────────────────────
# Rounded aggregates of ≤6dp-exact per-row doubles (1-2dp base
# columns and their 2-way/3-way products) must be order-independent
# and bit-identical across engines at ANY scale: double sums
# accumulate last-ulp error per partial-aggregation tree shape, and
# the r6 sf1 sweep proved group sums DO land exactly on half-cent
# boundaries (tpch_q5: 71626750.045 rounded opposite ways). The r6
# decimal(38,6)-sum fix was exact but slow — per-row BigDecimal adds
# cost ~5× on q1 (1.9 s of 2.2 at sf0.1; interpreted mode is worse).
#
# This is the fast exact form: split each value into two LONGS —
#   hi = floor(x)                      (whole units, signed)
#   lo = floor((x - floor(x))·1e6 + .5) (micros remainder ∈ [0, 1e6))
# so x ≡ hi + lo/1e6 exactly, sum both sides as plain long columns
# (whole-stage-codegen'd, overflow fails loudly under ANSI), and
# recombine only on the handful of aggregated rows. Recovery is
# unambiguous while |x| ≤ ~1e9: x−floor(x) is exact (Sterbenz) and
# the repr error of a 6dp-exact double ≤ 0.5·ulp(1e9)·1e6 ≈ 0.12
# < 0.5 micros. Overflow headroom: lo < 1e6/row and hi ≤ |x| → a
# group needs >9.2e12 rows of 1e6-unit values before a long sum
# overflows — beyond 100 TB, and ANSI raises rather than wraps.
#
# Rounding to nd ≤ 4 decimals is then INTEGER algebra on the sums
# (H = Σhi, L = Σlo ≥ 0, d = 10^(6−nd)):
#   round(total, nd)·10^nd = H·10^nd + (L + d/2) div d
# exact for signed totals because H·1e6 is divisible by d and L ≥ 0
# (div = floor on non-negative operands in BOTH engines; DuckDB //
# and Spark div truncate identically). Convention: halves round
# toward +inf — both engines compute the identical integer, which is
# the whole game (CLAUDE.md invariant 2). The DuckDB twins mirror
# the same algebra via _util.sql_msum/sql_mtot (HUGEINT sums there;
# equal values < 2^63 cast to the same double).


MICROS_DOMAIN = 1e9  # |x| bound for unambiguous hi/lo recovery


def _finite_or_raise(col: F.Column, out: F.Column) -> F.Column:
    """``out`` when ``col`` is in the micros-sum domain (finite,
    |x| < 1e9), else a loud per-row error.

    Spark's floor() is NOT ANSI-guarded: floor(NaN) is silently 0 and
    floor(Inf) is silently Long.MaxValue — a single NaN measure
    would contribute zero to an "exact" micros sum with NO error at
    all, and one Inf corrupts the total unless a second one happens
    to overflow the long sum (nonfinite probe class, r7). Beyond
    |x| ≈ 1e9 the hi/lo recovery itself turns ambiguous (see the
    design note above) — a finite 1e15 junk row would silently
    degrade the exactness claim, and floor(1e300) overflows the long
    asymmetrically between engines (huge_values probe class). One
    ``abs(x) < 1e9`` compare covers NaN, ±Inf and the domain (NaN
    compares false on both engines); out-of-domain measures raise —
    sanitize upstream. The DuckDB twins raise the same message
    (_util.sql_mhi/sql_mlo). One codegen'd branch per row — free
    next to the floor/multiply it guards (PERF.md)."""
    in_domain = F.abs(col) < F.lit(MICROS_DOMAIN)
    return F.when(in_domain | col.isNull(), out).otherwise(
        F.raise_error(
            F.format_string(
                "measure outside exact micros-sum domain"
                " (finite, |x| < 1e9 required): %s",
                col.cast("string"),
            )
        )
    )


def _hi(c) -> F.Column:
    """Whole-units long of a ≤6dp-exact per-row double (floor)."""
    col = _col(c)
    return _finite_or_raise(col, F.floor(col))


def _lo(c) -> F.Column:
    """Non-negative micros remainder (long ∈ [0, 1e6)) of the same."""
    col = _col(c)
    return _finite_or_raise(
        col,
        F.floor((col - F.floor(col)) * F.lit(1000000.0) + F.lit(0.5)).cast(
            "long"
        ),
    )


def _msum_parts(c, tag: str) -> list:
    """The two aggregate columns (Σhi, Σlo) for one micros sum."""
    return [F.sum(_hi(c)).alias(f"__h_{tag}"), F.sum(_lo(c)).alias(f"__l_{tag}")]


def _mround(tag: str, nd: int = 2) -> F.Column:
    """Rounded-nd-dp double from the (Σhi, Σlo) pair — integer
    algebra, then ONE cast+division both engines share."""
    d = 10 ** (6 - nd)
    scaled = F.col(f"__h_{tag}") * F.lit(10**nd) + F.expr(
        f"(__l_{tag} + {d // 2}) div {d}"
    )
    return scaled.cast("double") / F.lit(float(10**nd))


def _mtot_d(tag: str) -> F.Column:
    """Total as double (avg/ratio numerators): H + L/1e6 with the
    identical op order in the SQL twin → identical double."""
    return F.col(f"__h_{tag}").cast("double") + F.col(f"__l_{tag}").cast(
        "double"
    ) / F.lit(1000000.0)


def _mdec(tag: str) -> F.Column:
    """Exact total micros as decimal(38,0) — for threshold algebra /
    equality on totals that could outgrow a long when recombined
    (q11, q15). Per-GROUP rows only, so the decimal cost is nil."""
    return F.col(f"__h_{tag}").cast("decimal(38,0)") * F.lit(1000000) + F.col(
        f"__l_{tag}"
    ).cast("decimal(38,0)")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """
    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *_msum_parts("l_quantity", "q"),
            *_msum_parts("l_extendedprice", "ep"),
            *_msum_parts(disc_price, "dp"),
            *_msum_parts(charge, "ch"),
            *_msum_parts("l_discount", "di"),
            F.count("l_quantity").alias("__cn"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            _mround("q").alias("sum_qty"),
            _mround("ep").alias("sum_base_price"),
            _mround("dp").alias("sum_disc_price"),
            _mround("ch").alias("sum_charge"),
            # avgs: exact micros total as double → ONE division by
            # the count, so both engines round the identical double
            F.round(_mtot_d("q") / F.col("__cn"), 4).alias("avg_qty"),
            F.round(_mtot_d("ep") / F.col("__cn"), 4).alias("avg_price"),
            F.round(_mtot_d("di") / F.col("__cn"), 6).alias("avg_disc"),
            "count_order",
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """
    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum
    """
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(*_msum_parts(revenue, "r"))
        .select(
            "l_orderkey", "o_orderdate", "o_orderpriority",
            _mround("r").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            epoch(F.col("o_orderdate")).alias("o_orderdate_epoch"),
            "o_orderpriority",
            "revenue",
        )
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """
    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum
    """
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(*_msum_parts(revenue, "r"))
        .select("n_name", _mround("r").alias("revenue"))
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """
    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit(Q5_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q5_END).cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            *_msum_parts(F.col("l_extendedprice") * F.col("l_discount"), "r"),
            F.count("*").alias("n_items"),
        )
        .select(_mround("r").alias("revenue"), "n_items")
    )


Q10_START, Q10_END = "1997-01-01", "1997-04-01"
Q18_QTY = 250


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue by customer (q10 shape, adapted to the
    driver's schema: no address/phone columns).

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(*_msum_parts(revenue, "r"))
        .select(
            "c_custkey", "c_name", "c_acctbal", "n_name",
            _mround("r").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: orders whose total quantity exceeds a
    threshold (semi-join on a grouped HAVING).

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the having cut is an exact
    integer-quantity sum
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            epoch(F.col("o_orderdate")).alias("o_orderdate_epoch"),
            "o_totalprice", "total_qty",
        )
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations by year (q7 shape):
    supplier-nation ↔ customer-nation flows.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum
    """
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(*_msum_parts(revenue, "r"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            _mround("r").alias("revenue"),
        )
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: lineitem ⋈ part with a conditional
    aggregate. Part is the broadcast side; the single-row result is
    two sums in one pass.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the promo share divides two
    micros totals once, identically on both engines
    """
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q5_END).cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        *_msum_parts(promo, "p"),
        *_msum_parts(rev, "r"),
        F.count("*").alias("n_items"),
    ).select(
        _mround("p").alias("promo_revenue"),
        _mround("r").alias("total_revenue"),
        "n_items",
    )


Q4_START, Q4_END = "1996-07-01", "1996-10-01"
Q12_START, Q12_END = "1996-01-01", "1997-01-01"
HIGH_PRIO = ("1-URGENT", "2-HIGH")


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (q4 shape): orders in a quarter that had
    at least one late-shipped lineitem, counted by priority.

    The driver's lineitem has no commit/receipt dates, so "late" is
    ``l_shipdate > o_orderdate`` — same EXISTS(semi-join) plan shape.
    Left-semi join: the orders side never duplicates, lineitem is
    shuffled on its join key only; no fact broadcast. The
    shuffle_hash hint ENFORCES that: left-semi's build side is the
    fact table here, and the 2-column pruned lineitem sits under the
    local broadcast threshold, so Catalyst picked
    BroadcastHashJoin(BuildRight) — a single-threaded 6M-row hashed-
    relation build that was the whole r4 4.7× decade step (sf1:
    5.6 s broadcast vs 0.9 s shuffled; sf0.1: 1.1 vs 0.8 — the hint
    wins at every SF AND is the only shape that exists at 100 TB,
    where a fact broadcast simply OOMs).

    Contract: NULL join keys never match (SQL equi-join semantics on
    both engines)
    """
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").hint(
        "shuffle_hash"
    )
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority classes (q12 shape): for one ship-year, count
    high- vs low-priority orders per lineitem return flag (the driver's
    lineitem has no l_shipmode; l_returnflag plays the grouping role).
    One shuffled join + one hash agg with two conditional sums.

    Contract: NULL join keys never match (SQL equi-join semantics on
    both engines)
    """
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q12_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_END).cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin(*HIGH_PRIO)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (q13 shape): customers left-
    joined to their non-low-priority orders, then the histogram of
    per-customer order counts. Exercises outer join with an extra join
    predicate + a two-level aggregation; customers with zero orders
    survive with c_count = 0.

    Contract: NULL o_comment never matches the exclusion regex;
    customers with no orders count with c_count = 0
    """
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q17_BRAND = "Brand#3"


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (q17 shape): lineitems of one brand
    whose quantity is below half that part's average quantity.

    The correlated scalar subquery becomes a per-part aggregate joined
    back to the brand-filtered lineitems: the threshold table has at
    most |part| rows (sublinear in SF) so AQE may broadcast it; the
    brand filter itself rides a broadcast of the genuine `part` dim.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the avg threshold is the
    multiplication-only 2*sum > 7*count*price form — no division
    """
    part_b = t(spark, sf_dir, "part").where(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(F.broadcast(part_b), F.col("l_partkey") == F.col("p_partkey"))
    thresh = li_b.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_thresh")
    )
    return (
        li_b.join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            *_msum_parts("l_extendedprice", "ep"),
            F.count("*").alias("n_small"),
        )
        .select(
            F.round(_mtot_d("ep") / 7.0, 2).alias("avg_yearly"), "n_small"
        )
    )


Q19_BANDS = [
    ("Brand#1", 1, 15, 1.0, 30.0),
    ("Brand#2", 10, 30, 10.0, 60.0),
    ("Brand#3", 20, 50, 20.0, 80.0),
]


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under disjunctive brand/size/quantity bands
    (q19 shape, p_size standing in for p_container). The OR-of-ANDs
    predicate spans both sides of a broadcast equi-join; the part-only
    disjuncts (brand+size) are pushed below the join by Catalyst.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum
    """
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    band = None
    for brand, smin, smax, qmin, qmax in Q19_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )
        band = c if band is None else (band | c)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(band)
        .agg(
            *_msum_parts(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "r"
            ),
            F.count("*").alias("n_items"),
        )
        .select(_mround("r").alias("revenue"), "n_items")
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant rich customers (q22 shape): customers with above-average
    positive balance and no URGENT order, summarized per nation (the
    driver's dense data gives every customer ~10 orders, so "no orders
    at all" would be vacuous; the urgent-order filter keeps the
    anti-join selective at every SF). Anti-join on the orders fact
    (shuffled, never broadcast) + a one-row scalar-aggregate broadcast
    for the balance threshold.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the balance threshold is the
    micros-total/count idiom (one division on identical doubles)
    """
    cust = t(spark, sf_dir, "customer")
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    # exact micros total → one double division: the threshold double
    # is bit-identical across engines, so the > cut admits the same set
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            *_msum_parts("c_acctbal", "b"),
            F.count("c_acctbal").alias("__cn"),
        )
        .select((_mtot_d("b") / F.col("__cn")).alias("bal_thresh"))
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("bal_thresh"))
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            *_msum_parts("c_acctbal", "t"),
        )
        .select("c_nationkey", "numcust", _mround("t").alias("totacctbal"))
    )


Q8_TYPE = "LARGE"
Q8_NATION = "NATION_1"
Q8_REGION = "ASIA"


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (q8 shape): NATION_1's slice of LARGE-part
    revenue sold into ASIA, by order year. The widest join in the
    catalog — lineitem ⋈ part ⋈ orders ⋈ customer ⋈ nation ⋈ region
    (customer side) ⋈ supplier ⋈ nation (supplier side) — with only
    the genuine dims hinted; orders/customer shuffle. The share is a
    ratio of two conditional sums in ONE aggregation pass, rounded
    only at the aggregate (invariant #2).

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the share division happens once
    per year on the identical micros-derived doubles
    """
    part = t(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE).select("p_partkey")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    nation_c = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rk")
    )
    nation_s = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == Q8_NATION, volume).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rk") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(*_msum_parts(nation_vol, "nv"), *_msum_parts(volume, "v"))
        .select(
            "o_year",
            F.round(_mtot_d("nv") / _mtot_d("v"), 6).alias("mkt_share"),
            _mround("v").alias("total_volume"),
        )
    )


Q15_START, Q15_END = "1997-01-01", "1997-04-01"


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (q15 shape): suppliers whose quarterly revenue
    equals the maximum quarterly revenue — the correlated scalar-max
    subquery done as a one-row aggregate broadcast back over the
    per-supplier revenue frame (itself one shuffle of partial sums).
    Equality on an UNROUNDED double is safe here because both sides
    come from the same Spark aggregation — the max IS one of the
    values; only the reported revenue is rounded.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the max-revenue threshold
    compares micros longs recombined in decimal(38,0) — no division
    """
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    )
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("r_suppkey"))
        # exact micros sums: the max/equality compare below and the
        # oracle's argmax then agree on ties and near-ties at any SF
        .agg(
            *_msum_parts(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "r"
            )
        )
        .select(
            "r_suppkey", "__h_r", "__l_r", _mdec("r").alias("__vmic")
        )
        .localCheckpoint(eager=False)
    )  # feeds mx AND the join — without
    # it each consumer re-scans + re-aggregates the fact (invariant 9;
    # the frame itself is |suppliers| rows, trivially materializable)
    mx = rev.agg(F.max("__vmic").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("__vmic") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("r_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", _mround("r").alias("total_rev"))
    )


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level totals in one pass: ROLLUP (status, priority) →
    per-(status,priority), per-status and grand-total rows with a
    grouping-id disambiguating the NULL levels. One shuffle computes
    every level (Catalyst expands grouping sets before the hash agg —
    no per-level rescan of the fact table).

    Known engine divergence, empty input only: SQL-standard ROLLUP
    (DuckDB, Postgres) emits the grand-total () grouping-set row even
    over an empty table; Spark (DataFrame API AND SQL) emits zero
    rows. Pinned in tests/test_empty_inputs.py; irrelevant at any
    driver SF (orders is never empty).

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; ROLLUP grouping-set semantics
    pinned on empty input by the empty probe class
    """
    orders = t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            *_msum_parts("o_totalprice", "tp"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders",
            _mround("tp").alias("total_price"),
        )
    )


Q9_PART = "widget"
Q16_SIZES = [1, 3, 9, 14, 19, 23, 36, 45]


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit rollup (q9 shape, adapted: no partsupp in
    the driver schema, so supply cost is a retail-price fraction).
    The widest join in the set — two fact tables (lineitem, orders)
    plus three broadcast dims — grouped by nation × order-year.
    Fact sides stay shuffle-joined (linear in SF); part/supplier/
    nation ride broadcasts.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; signed profit terms ride the
    hi/lo micros split (cancelling sums are exact)
    """
    part = t(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_PART)
    ).select("p_partkey", "p_retailprice")
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    # signed terms cancel, so the double sum's accumulation-order
    # error (~1e-4 here) dwarfs the 2dp rounding window and the
    # engines WILL disagree at boundaries. The base columns are 1-2dp
    # → per-row profit is exact at ≤4dp → the hi/lo micros split
    # recovers it exactly (signed hi, non-negative lo) and the long
    # sums are order-independent. (r6: the "all-positive sums don't
    # need this" claim this comment used to make was WRONG — a
    # 4dp-exact positive sum lands exactly on a half-cent with real
    # probability, where last-ulp noise decides the rounding; tpch_q5
    # hit 71626750.045 at sf1. Every rounded sum of ≥3dp-exact terms
    # now rides _msum_parts.)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(*_msum_parts(profit, "pf"))
        .select("nation", "o_year", _mround("pf").alias("sum_profit"))
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock value (q11 shape, adapted: lineitem volume
    stands in for partsupp stock; the cut is 2× the average per-part
    value, which keeps selectivity SF-independent — TPC-H's
    fraction/SF scaling, restated). The threshold is a 1-row scalar
    aggregate broadcast across the per-part frame
    (BroadcastNestedLoopJoin — same pattern as q22's scalar avg), so
    the fact table is scanned and aggregated exactly once per side;
    no driver-side collect.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the group-vs-total threshold is
    multiplication-only integer algebra in decimal(38,0) (no division
    — invariant 2)
    """
    li = t(spark, sf_dir, "lineitem")
    # exact micros sums (2dp per-row products) so the threshold
    # comparison below is bit-identical across engines; the cut
    # itself is multiplication-only (2·v·n > 3·total ⟺ v > 1.5·avg)
    # to keep even the threshold free of division rounding. The fact
    # scan sums plain longs; recombination to decimal(38,0) micros
    # happens on the |parts|-sized frame only (sublinear in SF).
    pv = (
        li.groupBy("l_partkey")
        .agg(
            *_msum_parts(
                F.col("l_extendedprice") * F.col("l_quantity"), "v"
            )
        )
        .select("l_partkey", "__h_v", "__l_v", _mdec("v").alias("__vmic"))
        .localCheckpoint(eager=False)
    )  # feeds total AND the threshold
    # filter — one fact scan+agg instead of two (invariant 9)
    total = pv.agg(
        F.sum("__vmic").alias("__total"), F.count("*").alias("__cnt")
    )
    return (
        pv.join(F.broadcast(total))
        .where(
            F.col("__vmic") * F.lit(2) * F.col("__cnt")
            > F.col("__total") * F.lit(3)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            _mround("v").alias("value"),
        )
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-count by part attribute (q16 shape, adapted:
    lineitem is the part↔supplier link instead of partsupp). The
    distinct-aggregate shuffles once on the group key after the
    broadcast part join; count(distinct) expands internally to a
    two-phase exact aggregation — no approx sketch, same result as
    the oracle's count(distinct).

    Contract: NULL join keys never match (SQL equi-join semantics on
    both engines); the supplier exclusion is an anti-join (NULL-safe
    on both engines)
    """
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("SMALL"))
        & (F.col("p_size").isin(Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q2_SIZE = 7
Q2_TYPE = "STANDARD"
Q2_REGION = "EUROPE"


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (q2 shape, adapted: no partsupp in the
    driver schema, so supply cost is the minimum observed unit price
    ``l_extendedprice / l_quantity`` per (part, supplier) link from
    lineitem). For every STANDARD part of one size, the EUROPE
    supplier(s) offering the component at that part's minimum cost.

    The correlated min subquery is a window-min over the part key —
    ONE extra shuffle on l_partkey after the (part, supplier) cost
    aggregate, no self-join and no second scan of the fact table
    (q17's join-back shape would recompute the upstream agg).
    The broadcast part filter sits BELOW the cost aggregation, so
    only lineitems of qualifying parts (one type × one size,
    ~0.5% of the fact) are ever aggregated — Catalyst does not
    reorder groupBy past a join on its own.
    Part and the supplier⋈nation⋈region chain are genuine dims —
    broadcast; cost equality on doubles is safe because both sides
    come from the same aggregation (the min IS one of the values).

    Contract: NULL join keys never match (SQL equi-join semantics on
    both engines); min-cost supplier ties break deterministically via
    the ordered output columns
    """
    from pyspark.sql.window import Window

    part_f = t(spark, sf_dir, "part").where(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") == Q2_SIZE)
    ).select("p_partkey")
    ps = (
        t(spark, sf_dir, "lineitem")
        # LEFT SEMI, not inner: part_f is a FILTER, and semi-join set
        # semantics keep the plan multiplicity-correct even if the
        # dim carries duplicate rows (dup_rows probe, r7 — an inner
        # join below the agg collapsed part multiplicity that the
        # oracle's join above the agg preserved). Oracle twin: IN.
        .join(
            F.broadcast(part_f),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"), "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
        )
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = ps.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    mc = F.min("supplycost").over(Window.partitionBy("p_partkey"))
    return (
        eligible.withColumn("__mc", mc)
        .where(F.col("supplycost") == F.col("__mc"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q20_PREFIX = "red "
Q20_YEAR_START, Q20_YEAR_END = "1997-01-01", "1998-01-01"
Q20_NATIONS = ("NATION_1", "NATION_2", "NATION_3")


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surge-part suppliers (q20 shape, adapted: no partsupp, so the
    availability test becomes "majority of this (part, supplier)
    link's all-time volume shipped inside the target year"). Both the
    all-time and in-year quantity sums come out of ONE aggregation
    pass (a conditional sum beside the unconditional one — never two
    scans); the threshold is multiplication-only decimal algebra
    (2·year > all), exact on both engines. The part-name filter rides
    a broadcast ahead of the aggregate so only matching links are
    ever shuffled; suppliers of qualifying links are reduced to
    distinct keys BEFORE the (broadcast) supplier⋈nation probe.

    Contract: summed measures must be finite with |v| < 1e9 — both
    engines raise the same micros-guard message otherwise (invariant
    19); NULL measures skip the sum; the availqty threshold is
    multiplication-only micros algebra
    """
    part_f = t(spark, sf_dir, "part").where(
        F.col("p_name").startswith(Q20_PREFIX)
    ).select("p_partkey")
    li = t(spark, sf_dir, "lineitem")
    in_year = (
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
    )
    qty_yr = F.when(in_year, F.col("l_quantity")).otherwise(F.lit(0.0))
    ps = (
        li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            *_msum_parts("l_quantity", "a"),
            *_msum_parts(qty_yr, "y"),
        )
        # per-link micros fit a long with room to spare (quantities,
        # not prices); the compare is exact integer algebra
        .where(
            (F.col("__h_y") * F.lit(1000000) + F.col("__l_y")) * 2
            > F.col("__h_a") * F.lit(1000000) + F.col("__l_a")
        )
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").where(F.col("n_name").isin(*Q20_NATIONS))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        ps.select("l_suppkey").distinct()
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
    )


Q21_LATE_DAYS = 60


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (q21 shape, adapted: the
    driver's lineitem has no commit/receipt dates, so "late" is
    shipping more than 60 days after the order date). A supplier
    accumulates a wait when it was the ONLY late supplier on a
    finished multi-supplier order — the original's
    EXISTS(other supplier) / NOT EXISTS(other late supplier) pair.

    Both existential subqueries collapse into a TWO-LEVEL
    aggregation: per-(order, supplier) late-flags first, then
    per-order distinct counts as plain counts over that reduced
    frame. Two distinct-aggregates in one groupBy would instead
    plan a 3× row Expand through the shuffle (Spark's
    multi-distinct rewrite); the pre-aggregation keeps every
    shuffle at ≤ |order×supplier| rows and needs no Expand.

    Both aggregation levels ride ONE corpus-sized exchange: the
    joined frame repartitions by l_orderkey, which satisfies the
    clustering requirement of groupBy(l_orderkey, l_suppkey) AND of
    groupBy(l_orderkey), so Catalyst inserts no second exchange.
    Letting the first groupBy pick its own partitioning instead
    (hash(l_orderkey, l_suppkey)) scatters each order's suppliers
    across partitions, so the per-order agg re-shuffles a frame that
    is still ≈|lineitem| rows (~1 line per (order,supplier) pair —
    map-side partials merge almost nothing on either key): two
    corpus exchanges. Measured (r12, min across reps and both run
    orders): sf10 10.7 → 5.7 s, sf0.1 2.5 → 2.0 s, sf1 3.2 vs 3.6 s
    (the one scale with a small inversion, inside the host band).
    Two shuffles total (orderkey corpus exchange, per-supplier
    pair-sized exchange) and no fact self-joins.

    Contract: supplier names are unique by construction (key-derived);
    NULL join keys never match (SQL equi-join semantics on both
    engines)
    """
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    per_pair = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("__late"))
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("__ns"),
            F.sum("__late").alias("__nl"),
            F.max(F.when(F.col("__late") == 1, F.col("l_suppkey"))).alias("__lone"),
        )
        .where((F.col("__ns") > 1) & (F.col("__nl") == 1))
    )
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # group AND tie-break on the supplier KEY: s_name is a non-key
    # attribute (the r6 sf1 tiling proved names can collide), so an
    # oracle grouping by name would merge suppliers, and a
    # (numwait, s_name) sort is not a total order — the LIMIT cut
    # would be engine-dependent at ties
    return (
        per_order.groupBy("__lone")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier), F.col("__lone") == F.col("s_suppkey"))
        .orderBy(F.col("numwait").desc(), "s_name", "s_suppkey")
        .limit(100)
        .select("s_name", "numwait")
    )


QUERIES = {
    "orders_rollup": orders_rollup,
    "tpch_q2": tpch_q2, "tpch_q20": tpch_q20, "tpch_q21": tpch_q21,
    "tpch_q9": tpch_q9, "tpch_q11": tpch_q11, "tpch_q16": tpch_q16,
    "tpch_q1": tpch_q1, "tpch_q3": tpch_q3, "tpch_q4": tpch_q4, "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6, "tpch_q7": tpch_q7, "tpch_q8": tpch_q8,
    "tpch_q10": tpch_q10, "tpch_q12": tpch_q12, "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14, "tpch_q15": tpch_q15, "tpch_q17": tpch_q17,
    "tpch_q18": tpch_q18, "tpch_q19": tpch_q19, "tpch_q22": tpch_q22,
}

SQL_ORACLES = {
    "tpch_q2": f"""
        with ps as (
          -- IN = semi-join set semantics, mirroring the Spark side's
          -- LEFT SEMI part filter (multiplicity-correct under
          -- duplicate dim rows)
          select l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) as supplycost
          from lineitem
          where l_partkey in (
            select p_partkey from part
            where p_type = '{Q2_TYPE}' and p_size = {Q2_SIZE})
          group by l_partkey, l_suppkey
        ),
        el as (
          select l_partkey as p_partkey, s_acctbal, s_name, n_name,
                 supplycost,
                 min(supplycost) over (partition by l_partkey) as mc
          from ps
          join supplier on l_suppkey = s_suppkey
          join nation on s_nationkey = n_nationkey
          join region on n_regionkey = r_regionkey
          where r_name = '{Q2_REGION}'
        )
        select s_acctbal, s_name, n_name, p_partkey, supplycost
        from el where supplycost = mc
        order by s_acctbal desc, n_name, s_name, p_partkey
        limit 100
    """,
    "tpch_q20": f"""
        with ps as (
          select l_partkey, l_suppkey,
                 {sql_mhi("l_quantity")} as ha,
                 {sql_mlo("l_quantity")} as la,
                 {sql_mhi(
                     f"case when l_shipdate >= timestamp '{Q20_YEAR_START}'"
                     f" and l_shipdate < timestamp '{Q20_YEAR_END}'"
                     " then l_quantity else 0.0 end"
                 )} as hy,
                 {sql_mlo(
                     f"case when l_shipdate >= timestamp '{Q20_YEAR_START}'"
                     f" and l_shipdate < timestamp '{Q20_YEAR_END}'"
                     " then l_quantity else 0.0 end"
                 )} as ly
          from lineitem join part on l_partkey = p_partkey
          where p_name like '{Q20_PREFIX}%'
          group by l_partkey, l_suppkey
        )
        select s_suppkey, s_name
        from (select distinct l_suppkey from ps
              where (hy * 1000000 + ly) * 2 > ha * 1000000 + la)
        join supplier on l_suppkey = s_suppkey
        join nation on s_nationkey = n_nationkey
        where n_name in ({", ".join(f"'{n}'" for n in Q20_NATIONS)})
    """,
    "tpch_q21": f"""
        with per_o as (
          select l_orderkey,
                 count(distinct l_suppkey) as ns,
                 count(distinct case when l_shipdate >
                       o_orderdate + interval {Q21_LATE_DAYS} days
                       then l_suppkey end) as nl,
                 max(case when l_shipdate >
                     o_orderdate + interval {Q21_LATE_DAYS} days
                     then l_suppkey end) as lone
          from lineitem join orders on l_orderkey = o_orderkey
          where o_orderstatus = 'F'
          group by l_orderkey
        )
        , per_s as (
          select lone, count(*) as numwait
          from per_o where ns > 1 and nl = 1
          group by lone
        )
        select s_name, numwait
        from per_s join supplier on lone = s_suppkey
        order by numwait desc, s_name, s_suppkey
        limit 100
    """,
    "tpch_q9": f"""
        select n_name as nation,
               cast(year(o_orderdate) as bigint) as o_year,
               {sql_msum(
                   "l_extendedprice * (1 - l_discount)"
                   " - 0.5 * p_retailprice * l_quantity"
               )} as sum_profit
        from lineitem
        join part on l_partkey = p_partkey
        join supplier on l_suppkey = s_suppkey
        join nation on s_nationkey = n_nationkey
        join orders on l_orderkey = o_orderkey
        where contains(p_name, '{Q9_PART}')
        group by n_name, year(o_orderdate)
    """,
    "tpch_q11": f"""
        with pv as (
          select l_partkey,
                 {sql_mhi("l_extendedprice * l_quantity")} as h,
                 {sql_mlo("l_extendedprice * l_quantity")} as l
          from lineitem group by l_partkey
        ),
        tot as (
          select sum(h * 1000000 + l) as total, count(*) as cnt from pv
        )
        select l_partkey as p_partkey,
               cast((h * 100 + (l + 5000) // 10000) as double) / 100.0
                 as value
        from pv, tot
        where (h * 1000000 + l) * 2 * cnt > total * 3
    """,
    "tpch_q16": f"""
        select p_brand, p_type, cast(p_size as bigint) as p_size,
               count(distinct l_suppkey) as supplier_cnt
        from lineitem join part on l_partkey = p_partkey
        where p_brand != 'Brand#5'
          and p_type not like 'SMALL%'
          and p_size in ({", ".join(str(s) for s in Q16_SIZES)})
        group by p_brand, p_type, p_size
    """,
    "tpch_q1": f"""
        select l_returnflag, l_linestatus,
               {sql_msum("l_quantity")} as sum_qty,
               {sql_msum("l_extendedprice")} as sum_base_price,
               {sql_msum("l_extendedprice * (1 - l_discount)")} as sum_disc_price,
               {sql_msum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} as sum_charge,
               round({sql_mtot("l_quantity")} / count(l_quantity), 4) as avg_qty,
               round({sql_mtot("l_extendedprice")} / count(l_quantity), 4) as avg_price,
               round({sql_mtot("l_discount")} / count(l_quantity), 6) as avg_disc,
               count(*) as count_order
        from lineitem
        where l_shipdate <= timestamp '{Q1_CUTOFF}'
        group by l_returnflag, l_linestatus
    """,
    "tpch_q3": f"""
        select l_orderkey,
               cast(floor(epoch(o_orderdate)) as bigint) as o_orderdate_epoch,
               o_orderpriority,
               {sql_msum("l_extendedprice * (1 - l_discount)")} as revenue
        from customer
        join orders on c_custkey = o_custkey
        join lineitem on l_orderkey = o_orderkey
        where c_mktsegment = 'BUILDING'
          and o_orderdate < timestamp '{Q3_DATE}'
          and l_shipdate > timestamp '{Q3_DATE}'
        group by l_orderkey, o_orderdate, o_orderpriority
        order by revenue desc, o_orderdate, l_orderkey
        limit 10
    """,
    "tpch_q5": f"""
        select n_name,
               {sql_msum("l_extendedprice * (1 - l_discount)")} as revenue
        from region
        join nation on n_regionkey = r_regionkey
        join supplier on s_nationkey = n_nationkey
        join customer on c_nationkey = s_nationkey
        join orders on o_custkey = c_custkey
        join lineitem on l_orderkey = o_orderkey and l_suppkey = s_suppkey
        where r_name = 'ASIA'
          and o_orderdate >= timestamp '{Q5_START}'
          and o_orderdate < timestamp '{Q5_END}'
        group by n_name
    """,
    "tpch_q6": f"""
        select {sql_msum("l_extendedprice * l_discount")} as revenue,
               count(*) as n_items
        from lineitem
        where l_shipdate >= timestamp '{Q5_START}'
          and l_shipdate < timestamp '{Q5_END}'
          and l_discount >= 0.05 and l_discount <= 0.07
          and l_quantity < 24
    """,
    "tpch_q10": f"""
        select c_custkey, c_name, c_acctbal, n_name,
               {sql_msum("l_extendedprice * (1 - l_discount)")} as revenue
        from customer
        join orders on c_custkey = o_custkey
        join lineitem on l_orderkey = o_orderkey
        join nation on c_nationkey = n_nationkey
        where o_orderdate >= timestamp '{Q10_START}'
          and o_orderdate < timestamp '{Q10_END}'
          and l_returnflag = 'R'
        group by c_custkey, c_name, c_acctbal, n_name
        order by revenue desc, c_custkey
        limit 20
    """,
    "tpch_q18": f"""
        with big as (
          select l_orderkey, sum(l_quantity) as total_qty
          from lineitem group by l_orderkey
          having sum(l_quantity) > {Q18_QTY}
        )
        select c_custkey, c_name, o_orderkey,
               cast(floor(epoch(o_orderdate)) as bigint) as o_orderdate_epoch,
               o_totalprice, total_qty
        from orders
        join big on o_orderkey = l_orderkey
        join customer on o_custkey = c_custkey
    """,
    "tpch_q7": f"""
        select supp_nation, cust_nation, l_year,
               {sql_msum("volume")} as revenue
        from (
          select n1.n_name as supp_nation, n2.n_name as cust_nation,
                 year(l_shipdate) as l_year,
                 l_extendedprice * (1 - l_discount) as volume
          from supplier
          join lineitem on s_suppkey = l_suppkey
          join orders on o_orderkey = l_orderkey
          join customer on c_custkey = o_custkey
          join nation n1 on s_nationkey = n1.n_nationkey
          join nation n2 on c_nationkey = n2.n_nationkey
          where (n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
             or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1')
        )
        group by supp_nation, cust_nation, l_year
    """,
    "tpch_q14": f"""
        select {sql_msum(
            "case when p_type = 'PROMO'"
            " then l_extendedprice * (1 - l_discount)"
            " else 0.0 end"
        )} as promo_revenue,
               {sql_msum("l_extendedprice * (1 - l_discount)")} as total_revenue,
               count(*) as n_items
        from lineitem join part on l_partkey = p_partkey
        where l_shipdate >= timestamp '{Q5_START}'
          and l_shipdate < timestamp '{Q5_END}'
    """,
    "tpch_q4": f"""
        select o_orderpriority, count(*) as order_count
        from orders
        where o_orderdate >= timestamp '{Q4_START}'
          and o_orderdate < timestamp '{Q4_END}'
          and exists (select 1 from lineitem
                      where l_orderkey = o_orderkey
                        and l_shipdate > o_orderdate)
        group by o_orderpriority
    """,
    "tpch_q12": f"""
        select l_returnflag,
               cast(sum(case when o_orderpriority in ('1-URGENT','2-HIGH')
                        then 1 else 0 end) as bigint) as high_line_count,
               cast(sum(case when o_orderpriority not in ('1-URGENT','2-HIGH')
                        then 1 else 0 end) as bigint) as low_line_count
        from lineitem join orders on l_orderkey = o_orderkey
        where l_shipdate >= timestamp '{Q12_START}'
          and l_shipdate < timestamp '{Q12_END}'
        group by l_returnflag
    """,
    "tpch_q13": """
        select c_count, count(*) as custdist
        from (
          select c_custkey, count(o_orderkey) as c_count
          from customer
          left join orders on c_custkey = o_custkey
                          and o_orderpriority <> '5-LOW'
          group by c_custkey
        )
        group by c_count
    """,
    "tpch_q17": f"""
        select round({sql_mtot("l_extendedprice")} / 7.0, 2) as avg_yearly,
               count(*) as n_small
        from lineitem join part on p_partkey = l_partkey
        where p_brand = '{Q17_BRAND}'
          and l_quantity < (select 0.5 * avg(l2.l_quantity)
                            from lineitem l2
                            where l2.l_partkey = p_partkey)
    """,
    "tpch_q19": f"""
        select {sql_msum("l_extendedprice * (1 - l_discount)")} as revenue,
               count(*) as n_items
        from lineitem join part on p_partkey = l_partkey
        where (p_brand = 'Brand#1' and p_size between 1 and 15
               and l_quantity between 1.0 and 30.0)
           or (p_brand = 'Brand#2' and p_size between 10 and 30
               and l_quantity between 10.0 and 60.0)
           or (p_brand = 'Brand#3' and p_size between 20 and 50
               and l_quantity between 20.0 and 80.0)
    """,
    "tpch_q8": f"""
        select cast(year(o_orderdate) as bigint) as o_year,
               round({sql_mtot(
                   f"case when n2.n_name = '{Q8_NATION}'"
                   " then l_extendedprice * (1 - l_discount)"
                   " else 0.0 end"
               )}
                     / {sql_mtot("l_extendedprice * (1 - l_discount)")}, 6)
                 as mkt_share,
               {sql_msum("l_extendedprice * (1 - l_discount)")} as total_volume
        from lineitem
        join part on l_partkey = p_partkey
        join orders on l_orderkey = o_orderkey
        join customer on o_custkey = c_custkey
        join nation n1 on c_nationkey = n1.n_nationkey
        join region on n1.n_regionkey = r_regionkey
        join supplier on l_suppkey = s_suppkey
        join nation n2 on s_nationkey = n2.n_nationkey
        where p_type = '{Q8_TYPE}' and r_name = '{Q8_REGION}'
        group by year(o_orderdate)
    """,
    "tpch_q15": f"""
        with rev as (
          select l_suppkey,
                 {sql_mhi("l_extendedprice * (1 - l_discount)")} as h,
                 {sql_mlo("l_extendedprice * (1 - l_discount)")} as l
          from lineitem
          where l_shipdate >= timestamp '{Q15_START}'
            and l_shipdate < timestamp '{Q15_END}'
          group by l_suppkey
        )
        select s_suppkey, s_name,
               cast((h * 100 + (l + 5000) // 10000) as double) / 100.0
                 as total_rev
        from rev join supplier on l_suppkey = s_suppkey
        where h * 1000000 + l = (select max(h * 1000000 + l) from rev)
    """,
    "orders_rollup": f"""
        select o_orderstatus, o_orderpriority,
               cast(grouping(o_orderstatus, o_orderpriority) as bigint) as gid,
               count(*) as n_orders,
               {sql_msum("o_totalprice")} as total_price
        from orders
        group by rollup (o_orderstatus, o_orderpriority)
    """,
    "tpch_q22": f"""
        select cast(c_nationkey as bigint) as c_nationkey,
               count(*) as numcust,
               {sql_msum("c_acctbal")} as totacctbal
        from customer
        where c_acctbal > (select {sql_mtot("c2.c_acctbal")}
                                    / count(c_acctbal)
                           from customer c2 where c2.c_acctbal > 0)
          and not exists (select 1 from orders
                          where o_custkey = c_custkey
                            and o_orderpriority = '1-URGENT')
        group by c_nationkey
    """,
}

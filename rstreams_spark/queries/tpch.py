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

from ._util import t

Q1_CUTOFF = "2001-08-06"
Q3_DATE = "1998-03-15"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            "o_orderpriority",
            "revenue",
        )
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


Q10_START, Q10_END = "1997-01-01", "1997-04-01"
Q18_QTY = 250


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue by customer (q10 shape, adapted to the
    driver's schema: no address/phone columns)."""
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
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: orders whose total quantity exceeds a
    threshold (semi-join on a grouped HAVING)."""
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
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            "o_totalprice", "total_qty",
        )
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations by year (q7 shape):
    supplier-nation ↔ customer-nation flows."""
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
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: lineitem ⋈ part with a conditional
    aggregate. Part is the broadcast side; the single-row result is
    two sums in one pass."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q5_END).cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(F.sum(promo), 2).alias("promo_revenue"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
        F.count("*").alias("n_items"),
    )


QUERIES = {
    "tpch_q1": tpch_q1, "tpch_q3": tpch_q3, "tpch_q5": tpch_q5, "tpch_q6": tpch_q6,
    "tpch_q7": tpch_q7, "tpch_q10": tpch_q10, "tpch_q14": tpch_q14,
    "tpch_q18": tpch_q18,
}

SQL_ORACLES = {
    "tpch_q1": f"""
        select l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) as sum_qty,
               round(sum(l_extendedprice), 2) as sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
               round(avg(l_quantity), 4) as avg_qty,
               round(avg(l_extendedprice), 4) as avg_price,
               round(avg(l_discount), 6) as avg_disc,
               count(*) as count_order
        from lineitem
        where l_shipdate <= timestamp '{Q1_CUTOFF}'
        group by l_returnflag, l_linestatus
    """,
    "tpch_q3": f"""
        select l_orderkey,
               cast(floor(epoch(o_orderdate)) as bigint) as o_orderdate_epoch,
               o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
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
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
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
        select round(sum(l_extendedprice * l_discount), 2) as revenue,
               count(*) as n_items
        from lineitem
        where l_shipdate >= timestamp '{Q5_START}'
          and l_shipdate < timestamp '{Q5_END}'
          and l_discount >= 0.05 and l_discount <= 0.07
          and l_quantity < 24
    """,
    "tpch_q10": f"""
        select c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
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
    "tpch_q7": """
        select supp_nation, cust_nation, l_year,
               round(sum(volume), 2) as revenue
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
        select round(sum(case when p_type = 'PROMO'
                         then l_extendedprice * (1 - l_discount)
                         else 0.0 end), 2) as promo_revenue,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as total_revenue,
               count(*) as n_items
        from lineitem join part on l_partkey = p_partkey
        where l_shipdate >= timestamp '{Q5_START}'
          and l_shipdate < timestamp '{Q5_END}'
    """,
}

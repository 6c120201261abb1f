"""TPC-H suite completion: the remaining classic query shapes adapted to
the testdata star schema (which has no ``partsupp``; cost-side queries use
``part.p_retailprice`` as the unit-cost stand-in — noted per query).

With these, ALL 22 TPC-H query shapes have a catalog twin: Q1 `tpch_q1`,
Q2 `correlated_min_subquery`, Q3/Q4/Q5/Q6 `tpch_q3/q4/q5/q6_*`,
Q7-Q9/Q11/Q13/Q15/Q16/Q20 here, Q10/Q12/Q14/Q17/Q18/Q19/Q21/Q22
`tpch_q*`. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..plans.catalog import register
from ..sources.registry import load_table


@register(
    "tpch_q7_nation_volume",
    oracle="""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30, 6))), 2)::DOUBLE AS revenue
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_nationkey <> n2.n_nationkey
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    doc="TPC-H Q7 shape: cross-nation trade volume by year (two nation "
    "aliases joined on different keys; supplier and customer nations must "
    "differ)",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(F.col("nk1") != F.col("nk2"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    oracle="""
        SELECT CAST(o_year AS BIGINT) AS o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_4' THEN volume ELSE 0 END)
                     / sum(volume), 6) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = n1.n_regionkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n2 ON n2.n_nationkey = s_nationkey
            WHERE r_name = 'EUROPE'
        )
        GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share of a region's order "
    "volume per year (conditional share of a grouped ratio). Supplier "
    "nation n04 plays the 'BRAZIL' role.",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("nr1"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("nr1"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(F.when(F.col("supp_nation") == "NATION_4", F.col("volume")).otherwise(0)) / F.sum(
        "volume"
    )
    return base.groupBy("o_year").agg(F.round(share, 6).alias("mkt_share"))


@register(
    "tpch_q9_product_profit",
    oracle="""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(CAST(l_extendedprice * (1 - l_discount)
                         - 0.01 * p_retailprice * l_quantity AS DECIMAL(30, 6))), 2)::DOUBLE AS profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%a%'
        GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and year. The testdata "
    "has no partsupp, so unit cost is proxied as 1% of p_retailprice "
    "(the shape — revenue minus quantity-scaled cost over a 5-way join — "
    "is what's exercised).",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%a%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.01 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit.cast("decimal(30,6)")), 2).cast("double").alias("profit"))
    )


@register(
    "tpch_q11_value_concentration",
    oracle="""
        WITH part_value AS (
            SELECT l_partkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30, 6))) AS value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, round(value, 2)::DOUBLE AS value
        FROM part_value
        WHERE value > (SELECT 0.0002 * sum(value) FROM part_value)
    """,
    doc="TPC-H Q11 shape (partsupp-free adaptation): parts holding more "
    "than a fixed fraction of total traded value — grouped aggregate "
    "filtered by a scalar aggregate over itself",
    tags=("agg", "subquery", "tpch"),
)
def q_tpch_q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
        ).alias("value")
    )
    total = pv.agg((0.0002 * F.sum("value")).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 2).cast("double").alias("value"))
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON o_custkey = c_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count histogram (left join keeps "
    "zero-order customers, double aggregation)",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(l_extendedprice * (1 - l_discount)) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, round(total_rev, 2) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 shape: supplier(s) achieving the quarter's maximum "
    "revenue (aggregate view + scalar max filter; revenues are continuous "
    "doubles so the max is unique)",
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_revenue"))
    )


@register(
    "tpch_q16_supplier_variety",
    oracle="""
        SELECT p_brand, p_type,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_type NOT LIKE 'PROMO%'
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape: distinct supplier variety per part attribute "
    "combo, excluding brands/types and a NOT-IN supplier denylist "
    "(count distinct over a filtered join with an anti join)",
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") != "Brand#13") & (~F.col("p_type").like("PROMO%")))
        .select("p_partkey", "p_brand", "p_type")
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_dominant_suppliers",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN (
                SELECT l_partkey AS pk, sum(l_quantity) AS part_total
                FROM lineitem GROUP BY l_partkey
            ) t ON pk = l_partkey
            GROUP BY l_suppkey, l_partkey, part_total
            HAVING sum(l_quantity) > 0.2 * part_total
        )
    """,
    doc="TPC-H Q20 shape (partsupp-free adaptation): suppliers who shipped "
    "more than 20% of some part's total volume (10 suppliers share each part, so half is unreachable) — IN over a grouped "
    "HAVING subquery that itself joins a grouped aggregate (the nested "
    "subquery-chain shape). Completes all 22 TPC-H query shapes.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    part_totals = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("part_total")
    )
    dominant = (
        li.join(F.broadcast(part_totals), F.col("pk") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey", "part_total")
        .agg(F.sum("l_quantity").alias("supp_qty"))
        .where(F.col("supp_qty") > 0.2 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return s.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi").select(
        "s_suppkey", "s_name"
    )

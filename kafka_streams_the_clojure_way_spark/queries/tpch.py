"""TPC-H-flavored pack over the driver's slimmed star schema: the query
*shapes* of Q13/Q14/Q17/Q19/Q21/Q22 adapted to the columns that exist
(no partsupp/phone/commitdate here — see TESTDATA.md). These exercise the
decorrelation patterns Catalyst applies to real-world subqueries: outer
join with join-side predicates, disjunctive filter pushdown, correlated
aggregate subqueries, EXISTS/NOT-EXISTS self-joins, and scalar subquery
broadcast.

Scale conventions follow queries/relational.py: decimal sums for
order-independent exactness, broadcast hints on dimension sides, never a
global sort without a LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.queries.registry import query
from kafka_streams_the_clojure_way_spark.sources.files import load_table


def _dec(col: F.Column | str, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(28,{scale})")


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer join with ON-clause
# predicate on the null-producing side, then aggregate-of-aggregate)
# --------------------------------------------------------------------------

@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (ref absent per SURVEY §2.2 — no joins in
    core.clj): how many customers placed 0, 1, 2, ... non-urgent orders.
    The predicate lives on the null-producing side of the LEFT OUTER join
    (filter-then-join is equivalent and lets the scan prune), COUNT(col)
    counts only matches so customers with zero orders survive as c_count=0.
    Scale: first agg shuffles on c_custkey; second agg's input is one row
    per customer and its key space is tiny (max orders per customer), so
    partial aggregation collapses it map-side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share per ship-month (conditional agg over join)
# --------------------------------------------------------------------------

@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
           round(100.0
                 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                           AS DECIMAL(28,6))
                                 ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(28,6))) AS DOUBLE), 6) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of revenue from PROMO parts, by ship month.
    Both measures come out of ONE scan+join+shuffle via conditional
    aggregation. Scale: part is the dimension side -> broadcast; the only
    shuffle is the final month-keyed agg (tiny key space), and the decimal
    sums make the ratio order-independent before the double division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(28,6)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_pct")
        )
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity revenue vs per-part average (correlated agg)
# --------------------------------------------------------------------------

@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey)
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
               AS small_order_revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN pavg  ON pavg.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * pavg.avg_qty
    GROUP BY p.p_brand
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    half that part's average, per brand. The correlated scalar subquery
    (avg per part) is decorrelated into aggregate-then-rejoin — the same
    rewrite Catalyst performs, written explicitly. Scale: the agg and the
    rejoin share one shuffle on l_partkey (co-partitioned, AQE can reuse
    the exchange); decimal-exact avg makes the < boundary deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    pavg = li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity", 2)).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(pavg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_order_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity predicate over a join
# --------------------------------------------------------------------------

@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-way OR of conjunctive
    brand/size/quantity clauses. Catalyst extracts the common
    sub-predicates it can and pushes the part-only disjunction
    (brand/size) below the join into the broadcast side's scan; the mixed
    l/p clauses evaluate post-join. Scale: one broadcast join, no shuffle
    at all (final agg is a single global row via partial agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q21 shape: sole-returner suppliers (EXISTS + NOT EXISTS self-joins)
# --------------------------------------------------------------------------

@query(
    "tpch_q21_sole_return_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_solo_return_lines
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def tpch_q21_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (waiting-supplier → sole-returner, adapted to the
    columns present): lineitems returned by a supplier on multi-supplier
    orders where NO other supplier had a return. The correlated EXISTS /
    NOT EXISTS self-subqueries become left-semi / left-anti self-joins on
    l_orderkey with the inequality as a residual condition — exactly
    Catalyst's rewrite. Scale: all three legs shuffle on the same
    l_orderkey key (co-partitioned), and the anti leg pre-filters to 'R'
    rows (~25%) before the shuffle."""
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    others = li.select("l_orderkey", "l_suppkey").alias("l2")
    other_returns = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    solo = (
        l1.join(
            others,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            other_returns,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        solo.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_solo_return_lines"))
    )


# --------------------------------------------------------------------------
# Q22 shape: rich order-less customers per nation (scalar subquery + anti)
# --------------------------------------------------------------------------

@query(
    "tpch_q22_idle_rich_customers",
    oracle="""
    WITH gavg AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_acctbal
    FROM customer c, gavg
    WHERE c.c_acctbal > gavg.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    urgent orders (every customer in this data has *some* order, so the
    original never-ordered predicate is vacuous), counted per nation. The
    uncorrelated scalar subquery (global avg) becomes a 1-row broadcast
    cross join; the filtered NOT EXISTS becomes a left-anti join on
    o_custkey with the priority filter pushed below it. Scale: orders
    needs only o_custkey+o_orderpriority for the anti join (column pruning
    reaches the scan), and the 1-row avg never touches the driver."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    gavg = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        c.join(F.broadcast(gavg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )

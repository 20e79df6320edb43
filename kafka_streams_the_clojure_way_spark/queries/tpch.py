"""TPC-H-flavored pack over the driver's slimmed star schema: the query
*shapes* of Q13/Q14/Q17/Q19/Q21/Q22 adapted to the columns that exist
(no partsupp/phone/commitdate here — see TESTDATA.md). These exercise the
decorrelation patterns Catalyst applies to real-world subqueries: outer
join with join-side predicates, disjunctive filter pushdown, correlated
aggregate subqueries, EXISTS/NOT-EXISTS self-joins, and scalar subquery
broadcast.

Scale conventions follow queries/relational.py: order-independent exact
money sums (fixed-point longs via operators.relational.fixed_point_sums
on the revenue-heavy shapes, DECIMAL casts elsewhere), broadcast hints on
dimension sides, never a global sort without a LIMIT.
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
    shuffle is the final month-keyed agg (tiny key space), and the
    fixed-point long sums (see fixed_point_sums) keep the ratio
    order-independent — exactly the decimal semantics, codegen speed."""
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        fixed_point_sums,
    )

    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    joined = li.join(p, li.l_partkey == p.p_partkey).withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    return fixed_point_sums(
        joined, ["ship_month"], {"__promo": (promo, 6), "__rev": (rev, 6)}
    ).select(
        "ship_month",
        F.round(100.0 * F.col("__promo") / F.col("__rev"), 6).alias("promo_pct"),
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


# --------------------------------------------------------------------------
# Q4 shape: order-priority count with a correlated date-shifted EXISTS
# --------------------------------------------------------------------------

@query(
    "tpch_q04_priority_slow_ships",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q04_priority_slow_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commitdate/receiptdate absent -> adapted: a line
    shipped >30 days after the order date): count orders per priority
    having at least one slow-shipping line. The correlated EXISTS with a
    cross-table date condition becomes a left-semi join whose non-equi
    part rides along as a residual on the equi join. Scale: one shuffle
    on orderkey for the semi join; the priority agg's key space is 5."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# Q5 shape: local-supplier revenue per nation in one region/year
# --------------------------------------------------------------------------

@query(
    "tpch_q05_local_supplier_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q05_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 1996 revenue served by suppliers in the customer's
    own nation, for ASIA nations. Six-table join where the supplier join
    carries the customer-nation equality as a second equi-key. Scale: the
    big fact-fact joins (orders⋈lineitem on orderkey) shuffle once;
    supplier/nation/region are broadcast dims, and the region filter
    prunes nations before any fact is touched."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        fixed_point_sums,
    )

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(n, n.n_nationkey == c.c_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
    )
    return fixed_point_sums(joined, ["n_name"], {"revenue": (rev, 6)})


# --------------------------------------------------------------------------
# Q6 shape: pure scan-aggregate with tight pushed-down predicates
# --------------------------------------------------------------------------

@query(
    "tpch_q06_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue delta if 1997's 5-7%% discounts were dropped.
    The whole query is scan→filter→global agg: every predicate reaches
    the parquet reader as a pushed filter (shipdate range, discount
    range, quantity bound — see tests/test_plan_audit.py), and partial
    aggregation means NO shuffle at all, just a 1-row-per-task gather.
    At 100 TB this is the min-round-trip pattern: I/O-bound, zero
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount"), 6))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q7 shape: bilateral shipping volume between two nations, per year
# --------------------------------------------------------------------------

@query(
    "tpch_q07_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS volume
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def tpch_q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between NATION_1 and NATION_2 in both
    directions, by ship year. The nation dimension joins twice under
    different roles (supplier's vs customer's nation) with a disjunctive
    pair predicate evaluated after both. Scale: both nation joins are
    broadcasts; the orderkey shuffle of lineitem⋈orders dominates and the
    pair filter cuts the agg input to two nations' traffic first."""
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        fixed_point_sums,
    )

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("n1_key") == s.s_nationkey)
        .join(n2, F.col("n2_key") == c.c_nationkey)
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
    )
    return fixed_point_sums(
        joined,
        ["supp_nation", "cust_nation", "l_year"],
        {"volume": (rev, 6)},
    )


# --------------------------------------------------------------------------
# Q8 shape: one nation's market share inside a region, per year
# --------------------------------------------------------------------------

@query(
    "tpch_q08_market_share",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           round(
             CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                           THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                     AS DECIMAL(28,6))
                           ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    GROUP BY 1
    """,
)
def tpch_q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of ECONOMY-part revenue
    sold to EUROPE customers, per order year. Numerator and denominator
    come out of one pass via conditional aggregation (no self-join), the
    same single-shuffle trick as Q14. Scale: part/supplier/nation/region
    all broadcast; the only wide exchange is lineitem⋈orders, then a
    tiny per-year agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_regionkey").alias("n2_region"),
        )
    )
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        fixed_point_sums,
    )

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation3 = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    joined = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(p, p.p_partkey == li.l_partkey)
        .join(n1, F.col("n1_key") == s.s_nationkey)
        .join(n2, F.col("n2_key") == c.c_nationkey)
        .join(r, r.r_regionkey == F.col("n2_region"))
        .withColumn("o_year", F.year("o_orderdate"))
    )
    return fixed_point_sums(
        joined, ["o_year"], {"__n3": (nation3, 6), "__rev": (rev, 6)}
    ).select(
        "o_year",
        F.round(F.col("__n3") / F.col("__rev"), 6).alias("mkt_share"),
    )


# --------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year
# --------------------------------------------------------------------------

@query(
    "tpch_q09_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS profit,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def tpch_q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table -> profit reduces to discounted
    revenue): revenue on '%gear%' parts by supplier nation and order
    year. Substring LIKE can't prune parquet row groups, but it still
    runs in the scan operator pre-join and shrinks the broadcast. Scale:
    same skeleton as Q8 — one orderkey shuffle, dims broadcast, agg keys
    (nation × year) tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        fixed_point_sums,
    )

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(p, p.p_partkey == li.l_partkey)
        .join(n, n.n_nationkey == s.s_nationkey)
        .withColumn("nation", F.col("n_name"))
        .withColumn("o_year", F.year("o_orderdate"))
    )
    return fixed_point_sums(
        joined, ["nation", "o_year"], {"profit": (rev, 6)}, count_alias="n_lines"
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier(s) by windowed revenue (scalar-max subquery)
# --------------------------------------------------------------------------

@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH srev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(28,6))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-10-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(srev.total_rev AS DOUBLE) AS total_rev
    FROM supplier s
    JOIN srev ON srev.l_suppkey = s.s_suppkey
    WHERE srev.total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over 1997Q4.
    The view + scalar MAX subquery becomes agg → 1-row broadcast max →
    equality filter; ties all surface (exactly Q15's semantics), and the
    decimal revenue makes the equality well-defined. Scale: the revenue
    agg feeds BOTH the max subquery and the probe side; the explicit
    l_suppkey null-filter keeps the two subtrees canonically identical so
    exchange reuse computes the scan+agg once (asserted in
    tests/test_plan_audit.py). The max is a broadcast of one row, never a
    driver collect."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_suppkey").isNotNull()
    )
    srev = li.groupBy("l_suppkey").agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)).alias(
            "total_rev_dec"
        )
    )
    mx = srev.agg(F.max("total_rev_dec").alias("max_rev"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("total_rev_dec") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_rev"),
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-quantity orders (HAVING subquery join-back)
# --------------------------------------------------------------------------

@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, bulk.sum_qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) bulk
    JOIN orders o   ON o.o_orderkey = bulk.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders totalling >300 units, with their customer.
    The IN-(GROUP BY ... HAVING) subquery is expressed directly as
    aggregate→filter→join-back. l_quantity values are small integers so
    the double SUM is exact and order-independent. Scale: the qty agg
    shuffles on l_orderkey and its survivor set is tiny (<1%% of
    orders), so the join back to orders broadcasts the AGGREGATED side —
    the asymmetry AQE would also discover at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bulk = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(bulk), o.o_orderkey == bulk.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# Q16 shape: distinct supplier count per part attribute, NOT IN exclusion
# --------------------------------------------------------------------------

@query(
    "tpch_q16_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 14, 23, 45, 9, 19, 36, 49)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    """,
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (complaint suppliers -> negative-balance
    suppliers): distinct suppliers per brand/type over selected sizes,
    excluding a NOT IN subquery. NOT IN is the null-aware anti join —
    semantically distinct from NOT EXISTS (one NULL in the subquery
    empties the result), and Catalyst plans it as a broadcast null-aware
    anti join (asserted in tests/test_plan_audit.py). Expressed through
    the SQL frontend because the DataFrame API has no NOT-IN-subquery
    form — exactly what the frontend is for. Scale: the exclusion list
    broadcasts; COUNT(DISTINCT) adds its usual expand+two-level agg on
    (brand, type, suppkey)."""
    from kafka_streams_the_clojure_way_spark.sources.files import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size IN (1, 14, 23, 45, 9, 19, 36, 49)
          AND l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type
        """
    )


# --------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part in one region
# --------------------------------------------------------------------------

@query(
    "tpch_q02_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY 1, 2
    ),
    eps AS (
        SELECT ps.l_partkey, ps.supplycost,
               s.s_name, s.s_acctbal, n.n_name
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_name, e.s_name, e.n_name, e.s_acctbal,
           round(e.supplycost, 6) AS min_cost_r
    FROM part p
    JOIN eps e ON e.l_partkey = p.p_partkey
    WHERE p.p_size = 15 AND p.p_type = 'PROMO'
      AND e.supplycost = (SELECT MIN(e2.supplycost) FROM eps e2
                          WHERE e2.l_partkey = p.p_partkey)
    """,
)
def tpch_q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (ref absent per SURVEY §2.2 — no joins in core.clj;
    partsupp absent from the testdata, so the part-supplier relation is
    derived: min observed unit price per (part, supplier) from lineitem).
    For size-15 PROMO parts, the EUROPE supplier(s) offering the minimum
    cost. The correlated MIN subquery is expressed as a window-min over
    the part partition: one window node instead of the self-join+agg a
    naive decorrelation produces — same result because the correlation
    key (partkey) equals the window partition key. Scale: ps aggregates
    lineitem in one shuffle on (partkey, suppkey); supplier/nation/
    region/filtered-part are all broadcast; the window repartitions only
    the ~9-parts-worth of surviving rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
        )
    )
    from pyspark.sql.window import Window

    eps = (
        ps.join(s, s.s_suppkey == ps.l_suppkey)
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eps.join(p, p.p_partkey == eps.l_partkey)
        .withColumn("__min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("__min_cost"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            F.round("supplycost", 6).alias("min_cost_r"),
        )
    )


# --------------------------------------------------------------------------
# Q11 shape: important part values for suppliers of given nations
# --------------------------------------------------------------------------

@query(
    "tpch_q11_important_part_values",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(28,6))) AS pvalue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7')
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(pvalue AS DOUBLE) AS part_value
    FROM val
    WHERE pvalue > (SELECT SUM(pvalue) * 0.0008 FROM val)
    """,
)
def tpch_q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value -> lineitem revenue attributed to
    two nations' suppliers): parts whose revenue exceeds a fraction of
    the group total. The scalar aggregate subquery becomes a 1-row
    broadcast cross join against the grouped frame — the grouped frame is
    computed ONCE and reused for both the total and the filter (Catalyst
    plans a ReusedExchange under AQE rather than scanning lineitem
    twice). Scale: the supplier/nation filter broadcasts into the fact
    scan, one shuffle on l_partkey, and the threshold side is one row."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sel = F.broadcast(
        s.join(n, n.n_nationkey == s.s_nationkey)
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select("s_suppkey")
    )
    val = (
        li.join(sel, sel.s_suppkey == li.l_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6))
            .alias("pvalue")
        )
    )
    thresh = val.agg((F.sum("pvalue") * 0.0008).alias("__threshold"))
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("pvalue") > F.col("__threshold"))
        .select("l_partkey", F.col("pvalue").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# Q12 shape: order-priority mix by return flag for one ship year
# --------------------------------------------------------------------------

@query(
    "tpch_q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode absent -> returned/available flags):
    how many urgent-or-high vs other-priority lines shipped in 1998 per
    return flag. The classic join-then-conditional-aggregate: both
    measures come from one pass via CASE inside SUM. Scale: the
    returnflag + shipdate predicates push to the lineitem scan before
    the orderkey shuffle; the output key space is 2."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q20 shape: dominant suppliers of promo parts in one ship year
# --------------------------------------------------------------------------

@query(
    "tpch_q20_dominant_promo_suppliers",
    oracle="""
    WITH pq AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, SUM(supp_qty) AS part_qty FROM pq GROUP BY 1)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT pq.l_suppkey
        FROM pq JOIN tot ON tot.l_partkey = pq.l_partkey
        WHERE pq.supp_qty > 0.5 * tot.part_qty)
    """,
)
def tpch_q20_dominant_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty absent -> dominance: a supplier who
    shipped more than half of a promo part's 1997 volume). The nested
    IN-with-correlated-aggregate becomes: grouped quantities, a
    window-sum for the per-part total (partition key = correlation key,
    so no self-join), share filter, then a left-semi join into supplier.
    supp_qty sums are exact (quantities are integral doubles), so the
    0.5 * total comparison is deterministic on both engines. Scale: one
    shuffle on (partkey, suppkey), window over the same partkey — AQE
    coalesces the tiny post-filter exchanges; supplier/nation broadcast."""
    from pyspark.sql.window import Window

    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pq = (
        li.join(p, p.p_partkey == li.l_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    dominant = (
        pq.withColumn(
            "part_qty", F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        s.join(dominant, dominant.l_suppkey == s.s_suppkey, "left_semi")
        .join(n, n.n_nationkey == s.s_nationkey)
        .select("s_name", "n_name")
    )

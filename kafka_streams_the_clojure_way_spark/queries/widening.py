"""Second widening pack over SURVEY.md §2.2's absent-category table:
remaining join types (FULL OUTER, CROSS), the full ranking-window family,
correlated scalar subqueries, conditional (FILTER-clause) aggregation,
regexp scalar functions, LATERAL-style explode, and a TPC-H Q10-style
returned-item report.

Scale conventions follow queries/relational.py: decimal sums for
order-independent exactness, broadcast hints on dimension sides, unique
tiebreakers on every window ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.queries.registry import query
from kafka_streams_the_clojure_way_spark.sources.files import load_table


def _dec(col: F.Column | str, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(28,{scale})")


# --------------------------------------------------------------------------
# Ranking-window family (rank / dense_rank / percent_rank / cume_dist)
# --------------------------------------------------------------------------

@query(
    "window_rank_pack",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           RANK() OVER w AS price_rank,
           DENSE_RANK() OVER w AS price_dense_rank,
           round(PERCENT_RANK() OVER w, 6) AS price_pct_rank,
           round(CUME_DIST() OVER w, 6) AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four ranking functions in one pass over a shared window spec
    (one shuffle + one sort serves all four — Catalyst collapses same-spec
    windows into a single Window node). Unique tiebreak (orderkey) makes
    rank == row_number, so percent_rank/cume_dist are exact integer
    ratios — deterministic across engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


# --------------------------------------------------------------------------
# FULL OUTER and CROSS joins
# --------------------------------------------------------------------------

@query(
    "join_full_outer_nation_activity",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nk, COUNT(*) AS n_building_customers
        FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
    supp AS (
        SELECT s_nationkey AS nk, COUNT(*) AS n_rich_suppliers
        FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey,
           cust.n_building_customers,
           supp.n_rich_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered per-nation aggregates — nations with
    building customers but no rich suppliers (and vice versa) survive with
    NULLs. Scale: both sides pre-aggregate to ≤|nations| rows before the
    join, so the outer join itself is trivially small; never full-outer-join
    raw fact tables when an aggregate-then-join gives the same answer."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_building_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    joined = cust.join(supp, "nk", "full_outer")
    return joined.select(
        F.col("nk").cast("int").alias("nationkey"),
        "n_building_customers",
        "n_rich_suppliers",
    )


@query(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS region_a,
           b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS join (unordered region pairs). Scale: cross joins are
    only ever acceptable between bounded dimension tables — Spark plans a
    BroadcastNestedLoopJoin here; the engine's rule is cross ⇒ both sides
    must be broadcast-sized, which the plan audit can check."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("key_a"), F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_regionkey").alias("key_b"), F.col("r_name").alias("region_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("key_a") < F.col("key_b"))
        .select("region_a", "region_b")
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery
# --------------------------------------------------------------------------

@query(
    "subq_correlated_above_avg",
    oracle="""
    WITH cavg AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                   / COUNT(*) AS cust_avg
        FROM orders GROUP BY o_custkey)
    SELECT o.o_orderkey,
           o.o_custkey,
           o.o_totalprice,
           round(cavg.cust_avg, 6) AS cust_avg
    FROM orders o JOIN cavg ON o.o_custkey = cavg.o_custkey
    WHERE o.o_totalprice > 1.5 * cavg.cust_avg
    """,
)
def subq_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery ("orders 50% above that customer's
    average") decorrelated into aggregate-then-rejoin — exactly what
    Catalyst does to a correlated scalar subquery, written explicitly so
    the shape is visible. Decimal-exact average makes the >1.5x filter
    engine-independent. Scale: one shuffle on o_custkey shared by the agg
    and the join (co-partitioned), no per-row subquery execution."""
    o = load_table(spark, sf_dir, "orders")
    cavg = o.groupBy("o_custkey").agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("cust_avg")
    )
    return (
        o.join(cavg, "o_custkey")
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round("cust_avg", 6).alias("cust_avg"),
        )
    )


# --------------------------------------------------------------------------
# Conditional aggregation (FILTER clause / count_if)
# --------------------------------------------------------------------------

@query(
    "agg_conditional_order_mix",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_order_total
    FROM orders
    GROUP BY 1
    """,
)
def agg_conditional_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (SQL FILTER clause ≙ count_if / sum(when)):
    several differently-filtered measures in ONE scan+shuffle instead of
    N filtered subqueries — the standard way to avoid re-reading a 100 TB
    fact table per measure."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.sum(F.when(F.col("o_totalprice") > 200000, _dec("o_totalprice")))
        .cast("double")
        .alias("big_order_total"),
    )


# --------------------------------------------------------------------------
# Regexp scalar pack
# --------------------------------------------------------------------------

@query(
    "scalar_regexp_pack",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS vowels_masked,
           CAST(len(regexp_extract_all(p_name, ' ')) AS BIGINT) AS n_spaces,
           CAST(regexp_matches(p_type, '^(ECONOMY|PROMO)') AS INTEGER) AS is_discount_line
    FROM part
    """,
)
def scalar_regexp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function pack (extract / global replace / count / match) —
    all JVM-side Catalyst expressions (java.util.regex), codegen'd; no
    Python in the path."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("vowels_masked"),
        F.regexp_count("p_name", F.lit(" ")).cast("long").alias("n_spaces"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").cast("int").alias("is_discount_line"),
    )


# --------------------------------------------------------------------------
# Lateral explode (split -> unnest -> aggregate)
# --------------------------------------------------------------------------

@query(
    "explode_part_word_counts",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def explode_part_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/table-function surface: split + explode (≙ LATERAL
    unnest) + aggregate — the word-count shape. Scale: explode multiplies
    rows BEFORE the shuffle but partial aggregation collapses them
    map-side, so the shuffle carries only per-partition distinct words."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# TPC-H Q10-style returned-item report
# --------------------------------------------------------------------------

@query(
    "agg_returned_item_report",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS lost_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def agg_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returns.
    Scale: the returnflag filter is pushed to the lineitem scan (~25%
    selectivity), lineitem⋈orders is the one big shuffle, customer and
    nation broadcast, the revenue sum runs on the fixed-point long path
    (exact, codegen'd; see ``fixed_point_sums``), and the final ORDER
    BY+LIMIT runs as TakeOrderedAndProject (per-partition heaps), never
    a global sort."""
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        fixed_point_sums,
    )

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        fixed_point_sums(
            joined,
            ["c_custkey", "c_name", "n_name"],
            {"lost_revenue": (revenue, 6)},
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Value-window family (lag / lead / first_value / last_value / nth_value)
# --------------------------------------------------------------------------

@query(
    "window_value_pack",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)  OVER w  AS prev_price,
           lead(o_totalprice) OVER w  AS next_price,
           first_value(o_totalprice) OVER wf AS first_price,
           last_value(o_totalprice)  OVER wf AS last_price,
           nth_value(o_totalprice, 2) OVER wf AS second_price
    FROM orders
    WINDOW
      w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-window family in one pass: lag/lead (physical-offset
    frame) and first/last/nth_value (explicit full frame — last_value
    under the DEFAULT frame is the current row, a classic silent bug, so
    the frame is always spelled out). All five share ONE window sort:
    same partition keys + ordering => Catalyst evaluates them in a single
    Window node, one shuffle + one sort total. Ordering carries
    o_orderkey as the unique tiebreaker (SURVEY §5 determinism rule)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
    )


# --------------------------------------------------------------------------
# Multiset (ALL-variant) set operations
# --------------------------------------------------------------------------

@query(
    "set_ops_all_pack",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F')
    SELECT 'intersect_all' AS op, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t
    UNION ALL
    SELECT 'except_all' AS op, k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t
    """,
)
def set_ops_all_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops (SURVEY §2.2 "set ops beyond union"):
    intersectAll / exceptAll preserve DUPLICATE CARDINALITY (bag
    semantics — min(count_a, count_b) and count_a - count_b resp.),
    which the plain intersect/except queries deliberately lose. Spark
    plans both as a count-aggregate + generate, one shuffle each on the
    value — no join explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_linestatus") == "F").select(F.col("l_suppkey").alias("k"))
    return (
        a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "k")
        .unionByName(a.exceptAll(b).select(F.lit("except_all").alias("op"), "k"))
    )


# --------------------------------------------------------------------------
# Time-series gap fill with last-observation-carried-forward
# --------------------------------------------------------------------------

@query(
    "timeseries_gapfill_locf",
    oracle="""
    WITH f AS (
        SELECT user_id, date_trunc('hour', ts) AS hr,
               CAST(value AS DECIMAL(28,6)) AS v
        FROM events
        WHERE event_type = 'purchase' AND user_id % 50 = 0
    ),
    hourly AS (
        SELECT user_id, hr, SUM(v) AS v FROM f GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
        FROM bounds
    ),
    j AS (
        SELECT g.user_id, g.hr, h.v
        FROM grid g LEFT JOIN hourly h
          ON h.user_id = g.user_id AND h.hr = g.hr
    )
    SELECT user_id,
           CAST(epoch_us(hr) AS BIGINT) AS hr_us,
           CAST(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS v_filled,
           (v IS NULL) AS was_gap
    FROM j
    """,
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per user with gaps filled by
    last-observation-carried-forward: per-user hour grid via
    sequence()+explode (generated ON the executors — never a driver-side
    date loop), left join of the sparse hourly sums, then
    last(ignorenulls) over an ordered window. Scale: the grid generation
    is embarrassingly parallel per user; the LOCF window shuffles once
    on user_id — same partitioning as the hourly agg, so AQE can chain
    them without a second exchange of the raw events."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 50 == 0)
    )
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.sum(F.col("value").cast("decimal(28,6)")).alias("v"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    j = grid.join(hourly, ["user_id", "hr"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # epoch micros, not a raw timestamp column: PySpark renders
    # TimestampType in the PROCESS time zone at collect time, so a raw
    # hr column hash-mismatches the oracle on any non-UTC host
    return j.select(
        "user_id",
        F.unix_micros("hr").alias("hr_us"),
        F.last("v", ignorenulls=True).over(w).cast("double").alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


# --------------------------------------------------------------------------
# Running DISTINCT count over a window (collect_set workaround)
# --------------------------------------------------------------------------

@query(
    "window_running_distinct_types",
    oracle="""
    SELECT user_id, event_id,
           count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS n_distinct_types
    FROM events
    WHERE user_id % 20 = 0
    """,
)
def window_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user distinct event-type count. Spark forbids DISTINCT
    aggregates over windows, so the engine's idiom is
    ``size(collect_set(x)) OVER w`` — set semantics give exactly the
    distinct count and the result is tie-order-independent even though
    collect_set itself is unordered. Scale: state per row is the growing
    set — bounded here by the event-type vocabulary (tiny); for
    high-cardinality x use the dense_rank-sum decomposition instead of
    an unbounded set."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_distinct_types"),
    )


@query(
    "window_share_of_customer_spend",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           round(CAST(CAST(o_totalprice AS DECIMAL(28,2)) AS DOUBLE)
                 / CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                        OVER (PARTITION BY o_custkey) AS DOUBLE), 6)
               AS spend_share
    FROM orders
    """,
)
def window_share_of_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its customer's total spend —
    the unordered-window shape (SUM OVER (PARTITION BY) with no ORDER BY
    and no frame), which plans as a single Window node WITHOUT a sort:
    one shuffle on the key, no ordering pass, unlike every running-total
    query. Denominator goes through DECIMAL so the group total is
    order-exact before the rounded double division."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(28,2)")
    total = F.sum(dec).over(Window.partitionBy("o_custkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(dec.cast("double") / total.cast("double"), 6).alias("spend_share"),
    )


@query(
    "agg_boolean_bitwise_pack",
    oracle="""
    SELECT event_type,
           bool_and(value >= 0)  AS all_nonneg,
           bool_or(value > 990)  AS any_huge,
           CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_even_users,
           CAST(bit_and(CAST(user_id % 256 AS BIGINT)) AS BIGINT) AS flags_and,
           CAST(bit_or(CAST(user_id % 256 AS BIGINT))  AS BIGINT) AS flags_or,
           CAST(bit_xor(CAST(event_id AS BIGINT))      AS BIGINT) AS ids_xor
    FROM events
    GROUP BY event_type
    """,
)
def agg_boolean_bitwise_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean (every/any/count_if) and bitwise (bit_and/or/xor)
    aggregates in one grouped pass — the flag-rollup family (feature
    masks, permission bits, xor checksums). All commutative/associative,
    so partial aggregation collapses them map-side; outputs are
    booleans and longs, bit-identical by construction."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.every(F.col("value") >= 0).alias("all_nonneg"),
        F.some(F.col("value") > 990).alias("any_huge"),
        F.count_if(F.col("user_id") % 2 == 0).alias("n_even_users"),
        F.bit_and(F.col("user_id") % 256).alias("flags_and"),
        F.bit_or(F.col("user_id") % 256).alias("flags_or"),
        F.bit_xor("event_id").alias("ids_xor"),
    )


_MONTH_SPINE_SQL = """
WITH RECURSIVE bounds AS (
    SELECT date_trunc('month', MIN(o_orderdate)) AS mn,
           date_trunc('month', MAX(o_orderdate)) AS mx
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
),
spine(mon, mx) AS (
    SELECT mn, mx FROM bounds
    UNION ALL
    SELECT mon + INTERVAL 1 MONTH, mx FROM spine
    WHERE mon < mx
),
monthly AS (
    SELECT date_trunc('month', o_orderdate) AS mon,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
)
SELECT CAST({epoch}(s.mon) AS BIGINT) AS month_us,
       CAST(COALESCE(m.n_orders, 0) AS BIGINT) AS n_orders,
       (m.mon IS NULL) AS empty_month
FROM spine s LEFT JOIN monthly m ON m.mon = s.mon
"""


@query(
    "sql_recursive_month_spine",
    oracle=_MONTH_SPINE_SQL.format(epoch="epoch_us"),
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL form) through the
    SQL frontend: the calendar-spine utility every warehouse needs —
    generate every month between the first and last order date, left
    join the monthly counts, keep empty months as zero rows (a plain
    GROUP BY silently drops them). Spine bounded to one year: every
    recursion level is a driver-coordinated step, so depth is a LATENCY
    knob, not just a limit (12 levels here vs the 100-level default cap);
    the identical SQL text runs on DuckDB (only the epoch function name
    differs). The recursion carries ``mx`` as a spine COLUMN instead of a
    correlated ``(SELECT mx FROM bounds)`` stop condition — the scalar
    subquery form re-evaluates the bounds aggregate (an orders scan)
    every recursion level, 12 scans for a 12-row spine (measured 3.3x
    slower); a self-contained recursive leg scans orders once."""
    from kafka_streams_the_clojure_way_spark.sources.files import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MONTH_SPINE_SQL.format(epoch="unix_micros"))


@query(
    "scalar_ansi_safety_pack",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 5 = 0 THEN NULL
                ELSE round(CAST(value AS DOUBLE) / (user_id % 5), 6)
           END AS safe_ratio,
           CASE WHEN user_id % 5 = 0 THEN NULL
                ELSE CAST(event_id // (user_id % 5) AS BIGINT)
           END AS safe_intdiv,
           (user_id % 5 = 0) AS was_div_zero
    FROM events
    """,
)
def scalar_ansi_safety_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety (Spark 4 runs ANSI by default, where x/0 THROWS
    mid-job): the try_* family turns per-row failures into NULLs so one
    poisoned row can't kill a 100 TB job — while keeping real overflow
    and type errors loud elsewhere. DuckDB has no try_divide, so the
    oracle encodes the identical semantics with explicit CASE guards."""
    ev = load_table(spark, sf_dir, "events")
    div = F.col("user_id") % 5
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), div), 6).alias("safe_ratio"),
        F.try_divide(F.col("event_id"), div).cast("long").alias("safe_intdiv"),
        (div == 0).alias("was_div_zero"),
    )


@query(
    "window_rolling_anomaly",
    oracle="""
    WITH w AS (
        SELECT user_id, event_id,
               CAST(value AS DECIMAL(28,6)) AS v,
               SUM(CAST(value AS DECIMAL(28,6))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id,
           round(CAST(s AS DOUBLE) / n, 6) AS trailing_mean,
           (CAST(v AS DOUBLE) > 2.0 * CAST(s AS DOUBLE) / n) AS is_spike
    FROM w
    """,
)
def window_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly flags: each purchase against its user's trailing
    5-event mean (ROWS frame, (ts, event_id) tiebreak for deterministic
    frames), spike = value > 2x the mean. The trailing sum goes through
    DECIMAL so the frame aggregate is exact regardless of how either
    engine walks the frame; only the final mean division floats. One
    window, one shuffle on user_id — the streaming-adjacent monitoring
    shape in batch form."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = F.col("value").cast("decimal(28,6)")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), F.col("event_id"))
        .rowsBetween(-4, Window.currentRow)
    )
    s = F.sum(v).over(w)
    n = F.count(F.lit(1)).over(w)
    mean = s.cast("double") / n
    return ev.select(
        "user_id",
        "event_id",
        F.round(mean, 6).alias("trailing_mean"),
        (v.cast("double") > 2.0 * mean).alias("is_spike"),
    )


# --------------------------------------------------------------------------
# Data-quality audit (deequ-lite)
# --------------------------------------------------------------------------

@query(
    "dq_lineitem_audit",
    oracle="""
    WITH rowstats AS (
        SELECT CAST(count(*) AS BIGINT) AS rows_checked,
               CAST(count_if(NOT (l_quantity BETWEEN 1 AND 50)) AS BIGINT)
                   AS qty_in_range,
               CAST(count_if(NOT (l_discount <= 0.08)) AS BIGINT)
                   AS discount_le_8pct,
               CAST(count_if(NOT (l_tax BETWEEN 0 AND 0.08)) AS BIGINT)
                   AS tax_in_range,
               CAST(count_if(NOT (l_extendedprice > 0)) AS BIGINT)
                   AS price_positive,
               CAST(count_if(NOT (l_returnflag IN ('A', 'N', 'R'))) AS BIGINT)
                   AS returnflag_domain
        FROM lineitem
    )
    SELECT u.rule, u.violations, rowstats.rows_checked
    FROM rowstats, (
        SELECT 'qty_in_range' AS rule, qty_in_range AS violations FROM rowstats
        UNION ALL SELECT 'discount_le_8pct', discount_le_8pct FROM rowstats
        UNION ALL SELECT 'tax_in_range', tax_in_range FROM rowstats
        UNION ALL SELECT 'price_positive', price_positive FROM rowstats
        UNION ALL SELECT 'returnflag_domain', returnflag_domain FROM rowstats
    ) u
    UNION ALL
    SELECT 'orderkey_in_orders',
           CAST(count_if(o.o_orderkey IS NULL) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    """,
)
def dq_lineitem_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit (the Deequ pattern, quality.py's
    one-pass validate surfaced as a registered query): five row-level
    rules computed as measures of a SINGLE lineitem scan-aggregate plus
    one referential-integrity rule (every lineitem orderkey resolves in
    orders — a broadcast-able anti-join count, NOT a per-rule rescan).
    On the synthetic data discount_le_8pct is genuinely violated, so the
    audit exercises both zero and non-zero counts."""
    from kafka_streams_the_clojure_way_spark.quality import constraint_audit

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rules = {
        "qty_in_range": F.col("l_quantity").between(1, 50),
        "discount_le_8pct": F.col("l_discount") <= 0.08,
        "tax_in_range": F.col("l_tax").between(0, 0.08),
        "price_positive": F.col("l_extendedprice") > 0,
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
    }
    row_audit = constraint_audit(li, rules)
    ri = (
        li.join(
            F.broadcast(o.select("o_orderkey")),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .crossJoin(F.broadcast(li.agg(F.count(F.lit(1)).cast("long").alias("rows_checked"))))
        .select(F.lit("orderkey_in_orders").alias("rule"), "violations", "rows_checked")
    )
    return row_audit.unionByName(ri)


# --------------------------------------------------------------------------
# Incremental-maintenance algebra + time-weighted average
# --------------------------------------------------------------------------

@query(
    "agg_incremental_merge_parity",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_incremental_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance, proven lossless as a
    registered query: the corpus is split into two batches, each batch
    is collapsed to a PARTIAL summary (decimal sum / count / min / max —
    the mergeable algebra), and the partials are MERGED (sum of sums,
    sum of counts, min of mins, max of maxes; avg derived at read time).
    The oracle recomputes directly from all rows — the hash-match IS the
    statement that maintenance(delta1) merge maintenance(delta2) equals
    full recompute, which is what lets a 100 TB summary refresh by
    scanning only the day's delta. Non-mergeable aggregates (avg,
    percentile) must be derived from merged primitives, never stored."""
    o = load_table(spark, sf_dir, "orders")

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("o_orderpriority").agg(
            F.sum(_dec("o_totalprice")).alias("rev_sum"),
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )

    state1 = partial(o.filter(F.col("o_orderkey") % 2 == 0))
    state2 = partial(o.filter(F.col("o_orderkey") % 2 == 1))
    merged = (
        state1.unionByName(state2)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("rev_sum").alias("rev_sum"),
            F.sum("n_orders").alias("n_orders"),
            F.min("min_price").alias("min_price"),
            F.max("max_price").alias("max_price"),
        )
    )
    rev = F.col("rev_sum").cast("double")
    return merged.select(
        "o_orderpriority",
        rev.alias("revenue"),
        "n_orders",
        "min_price",
        "max_price",
        F.round(rev / F.col("n_orders"), 6).alias("avg_price"),
    )


@query(
    "timeseries_time_weighted_value",
    oracle="""
    WITH seq AS (
        SELECT user_id, CAST(value AS DECIMAL(12,6)) AS v,
               CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts), event_id)
                    - epoch_us(ts) AS DECIMAL(26,0)) AS dur_us
        FROM events
    )
    SELECT user_id,
           CAST(count(dur_us) AS BIGINT) AS n_intervals,
           CAST(CAST(SUM(dur_us) AS DECIMAL(38,0)) AS BIGINT) AS total_dur_us,
           round(CAST(SUM(v * dur_us) AS DOUBLE)
                 / CAST(SUM(dur_us) AS DOUBLE), 6) AS twap
    FROM seq WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
)
def timeseries_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each event's value is held until
    the user's next event, so the average weighs values by how long they
    were in force — the correct aggregate for irregularly-sampled
    series, where a plain avg over-counts bursts. One lead() window per
    user + one group-by; weights are exact DECIMAL products of
    microsecond durations (decimal(12,6) x decimal(26,0) multiplies within
    DuckDB's p1+p2 <= 38 bind rule and Spark's 38-digit cap, so no float summation anywhere before the final
    division)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(t, F.col("event_id"))
    seq = ev.select(
        "user_id",
        F.col("value").cast("decimal(12,6)").alias("v"),
        (F.lead(t).over(w) - t).cast("decimal(26,0)").alias("dur_us"),
    ).where(F.col("dur_us").isNotNull())
    return seq.groupBy("user_id").agg(
        F.count("dur_us").alias("n_intervals"),
        F.sum("dur_us").cast("decimal(38,0)").cast("long").alias("total_dur_us"),
        F.round(
            F.sum(F.col("v") * F.col("dur_us")).cast("double")
            / F.sum("dur_us").cast("double"),
            6,
        ).alias("twap"),
    )

"""Relational surface queries (SURVEY.md §2.2 categories, M3): aggregations,
joins (broadcast/shuffle/semi/anti/as-of), window functions, sorts/top-k,
set ops, scalar functions, JSON, and time bucketing.

Scale notes are attached per query; the shared rules:
- dimension joins (region/nation/customer-sized) get an explicit
  ``broadcast()`` hint — no shuffle of the fact side;
- aggregates go through DECIMAL so SUM is exact/order-independent, then
  back to DOUBLE (see queries/__init__ conventions);
- window queries always carry a unique tiebreaker for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators.relational import (
    asof_join,
    top_k_per_key,
)
from kafka_streams_the_clojure_way_spark.queries.registry import query
from kafka_streams_the_clojure_way_spark.sources.files import load_table


def _dec(col: F.Column | str, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(28,{scale})")


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical wide aggregation.
    Scale: partial aggregation map-side, 6-group output — shuffle carries
    only per-group partials. Money sums run on the fixed-point long path
    (``fixed_point_sums``): exact and order-independent like DECIMAL, but
    the per-row adds stay in codegen'd longs — measured ~2.2x on this
    query — with the decimal widening deferred to the per-partition
    partials, where 100 TB group totals would overflow a long."""
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        fixed_point_sums,
    )

    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    merged = fixed_point_sums(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", 2),
            "sum_base_price": ("l_extendedprice", 2),
            "sum_disc_price": (disc_price, 6),
            "sum_charge": (disc_price * (1 + F.col("l_tax")), 6),
            "__sum_disc": ("l_discount", 4),
        },
        count_alias="count_order",
    )
    n = F.col("count_order")
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(F.col("sum_qty") / n, 6).alias("avg_qty"),
        F.round(F.col("sum_base_price") / n, 6).alias("avg_price"),
        F.round(F.col("__sum_disc") / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           COUNT(DISTINCT l_orderkey) AS distinct_orders
    FROM lineitem
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation. Scale: Spark expands multi-distinct
    into partial-dedup per key before the final shuffle; for 100 TB use
    approx_count_distinct (HLL) unless exactness is required."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count_distinct("l_suppkey").alias("distinct_suppliers"),
        F.count_distinct("l_orderkey").alias("distinct_orders"),
    )


@query(
    "agg_distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT as an operator (dedup on all projected columns): plans as
    a partial+final HashAggregate on the projection, so the shuffle
    carries unique pairs, not the table — exact dedup at any scale."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "agg_rollup_orders",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (priority -> status -> grand total)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@query(
    "agg_cube_events",
    oracle="""
    SELECT event_type,
           user_id % 7 AS user_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, user_id % 7)
    """,
)
def agg_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over event type x user bucket: Expand emits all 4 grouping
    sets in ONE pass over the input (cost = sets x rows map-side, still
    a single shuffle on the grouping-id key) — no per-set rescans."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 7
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "join_broadcast_customer_geo",
    oracle="""
    SELECT r.r_name,
           n.n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact->dim star join with explicit broadcast of both dims: the fact
    side never shuffles for the join (only for the final small agg)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "join_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join revenue rollup. Scale: lineitem⋈orders is
    the only big shuffle (both sides keyed on orderkey); customer/nation/
    region broadcast; the filter on orders prunes before the join (pushed
    to the orders scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers holding a >100k order. Scale:
    semi joins shuffle only keys+dedup on the build side, never duplicate
    the probe side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no urgent orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_asof_error_after_purchase",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           epoch_us(e.ts) AS error_ts_us,
           p.purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT user_id, ts, value AS purchase_value
                    FROM events WHERE event_type = 'purchase') p
    ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (an operator Spark lacks natively — SURVEY §2.2): each
    error event gets the value of that user's most recent purchase at or
    before the error. Implemented as union + running window (one shuffle,
    no range-join blowup) in operators.relational.asof_join; oracle is
    DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    # keep ns precision for the output: recompute from the raw long.
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("error_ts_us"),
        "purchase_value",
    )


@query(
    "join_asof_forward_next_purchase",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           epoch_us(e.ts) AS error_ts_us,
           p.purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT user_id, ts, value AS purchase_value
                    FROM events WHERE event_type = 'purchase') p
    ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'): each
    error event gets the value of that user's NEXT purchase at or after
    the error — the did-they-recover / conversion-after-incident shape.
    Same single-shuffle union + running-window implementation as the
    backward as-of, with the window ordered by ts DESC; the oracle is
    DuckDB's native ASOF JOIN with the inequality flipped."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("error_ts_us"),
        "purchase_value",
    )


# --------------------------------------------------------------------------
# Window functions, sorts, top-k
# --------------------------------------------------------------------------

@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey,
               o_orderkey,
               o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def window_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (ranking window). Scale: Spark inserts a
    WindowGroupLimit partial top-k below the shuffle, so mappers emit at
    most 3 rows per customer."""
    o = load_table(spark, sf_dir, "orders")
    return top_k_per_key(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).withColumn("rn", F.col("rn").cast("long"))


@query(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (analytic window with frame). Unique
    tiebreak (orderkey) makes the cumulative sequence deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           date_diff('day',
                     CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    """,
)
def window_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: days between consecutive orders of a customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


@query(
    "order_top100_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def order_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (ORDER BY + LIMIT). Scale: Spark runs TakeOrderedAndProject
    — per-partition heaps then a driver merge of 100-row heads; never a full
    global sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "set_intersect_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): Catalyst rewrites it to a
    left-semi join over distinct inputs — one key shuffle per side, the
    same plan a hand-written semi join would get."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    return a.intersect(b)


@query(
    "set_except_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): rewritten to a left-anti join over
    distinct inputs — exclusion without materializing either set."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    return a.subtract(b)


# --------------------------------------------------------------------------
# Scalar functions, JSON, time bucketing
# --------------------------------------------------------------------------

@query(
    "scalar_string_pack",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substring(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(contains(p_type, 'BRASS') AS INTEGER) AS is_brass
    FROM part
    """,
)
def scalar_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function pack (upper/length/substring/concat/replace/contains)
    — all JVM-side Catalyst expressions, whole-stage codegen'd."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.col("p_type").contains("BRASS").cast("int").alias("is_brass"),
    )


@query(
    "scalar_math_date_pack",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           dayofmonth(o_orderdate) AS order_day,
           epoch(o_orderdate)::BIGINT AS order_epoch,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           abs(o_totalprice - 100000.0) AS price_dist,
           o_orderkey % 16 AS shard
    FROM orders
    """,
)
def scalar_math_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + date extraction pack. Timestamps leave as epoch seconds
    (never raw timestamp columns — engine-dependent rendering)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.ceil("o_totalprice").cast("long").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - F.lit(100000.0)).alias("price_dist"),
        (F.col("o_orderkey") % 16).alias("shard"),
    )


@query(
    "json_props_by_key",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def json_props_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload, then aggregate.
    get_json_object runs JVM-side (Jackson) — no Python in the path."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k_value", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("k_value")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


@query(
    "time_bucket_hourly_events",
    oracle="""
    SELECT (epoch_ns(ts) // 3600000000000) AS hour_bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregate in batch form — the DuckDB-checkable
    twin of the streaming window query (same bucketing arithmetic the
    streaming path uses)."""
    ev = load_table(spark, sf_dir, "events")
    # integer FLOOR division (a - pmod(a,b) div b) — doubles would lose
    # ULPs at 1e18, and bare `div` truncates toward zero, which diverges
    # from the oracle's `//` (floor) for pre-epoch timestamps
    bucket = F.expr(
        "((unix_micros(ts) * 1000 - pmod(unix_micros(ts) * 1000, 3600000000000))"
        " div 3600000000000)"
    ).alias("hour_bucket")
    return ev.groupBy(bucket, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


@query(
    "json_variant_shred",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_max,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant-typed JSON (Spark 4): parse events.props ONCE into a
    VariantType column, then extract typed paths with try_variant_get.
    Versus per-path get_json_object (json_props_by_key), the payload is
    parsed a single time into a binary-encoded variant no matter how many
    paths are read — the difference between O(paths) and O(1) JSON parses
    per row, which is THE semi-structured-scan cost at 100 TB. Missing
    paths yield NULL (counted here), not errors."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).alias("n_missing"),
        )
    )


@query(
    "join_asof_tolerance_1h",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           epoch_us(e.ts) AS error_ts_us,
           CASE WHEN p.ts IS NOT NULL
                 AND e.ts - p.ts <= INTERVAL 1 HOUR
                THEN p.purchase_value END AS recent_purchase_value,
           (p.ts IS NOT NULL AND e.ts - p.ts <= INTERVAL 1 HOUR)
               AS within_tolerance
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT user_id, ts, value AS purchase_value
                    FROM events WHERE event_type = 'purchase') p
    ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with TOLERANCE (pandas merge_asof's `tolerance`, kdb
    wj): the most recent prior purchase counts only when it happened
    within 1 hour of the error — stale matches become NULL. The bound is
    applied AFTER the as-of window pass (carry the matched right ts as a
    value column, then a row-local check), so the plan is identical to
    the unbounded as-of: one union + one running window, no range-join
    blowup."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
        F.unix_micros("ts").alias("p_ts_us"),
    )
    joined = asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_value", "p_ts_us"],
    )
    within = F.col("p_ts_us").isNotNull() & (
        F.unix_micros("ts") - F.col("p_ts_us") <= 3600 * 1_000_000
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("error_ts_us"),
        F.when(within, F.col("purchase_value")).alias("recent_purchase_value"),
        within.alias("within_tolerance"),
    )


@query(
    "join_asof_nearest_purchase",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error'),
    p AS (SELECT user_id, ts, value AS purchase_value FROM events
          WHERE event_type = 'purchase'),
    b AS (
        SELECT e.event_id, e.user_id, e.ts,
               p.ts AS bts, p.purchase_value AS bval
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    ),
    f AS (
        SELECT e.event_id, p.ts AS fts, p.purchase_value AS fval
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.ts <= p.ts
    )
    SELECT b.event_id, b.user_id, epoch_us(b.ts) AS error_ts_us,
           CASE WHEN fts IS NULL THEN bval
                WHEN bts IS NULL THEN fval
                WHEN epoch_us(b.ts) - epoch_us(bts)
                     <= epoch_us(fts) - epoch_us(b.ts) THEN bval
                ELSE fval END AS purchase_value,
           CASE WHEN fts IS NULL AND bts IS NULL THEN NULL
                WHEN fts IS NULL THEN 'backward'
                WHEN bts IS NULL THEN 'forward'
                WHEN epoch_us(b.ts) - epoch_us(bts)
                     <= epoch_us(fts) - epoch_us(b.ts) THEN 'backward'
                ELSE 'forward' END AS matched_direction
    FROM b JOIN f USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest', ties
    resolved backward): each error event gets the user's closest-in-time
    purchase, before OR after — operators.relational.asof_join_nearest,
    which composes the backward and forward single-shuffle carries and
    resolves by per-row distance. Tie semantics unit-tested on an exact
    equidistant fixture in tests/test_relational.py."""
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        asof_join_nearest,
    )

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join_nearest(
        errors,
        purchases,
        on="user_id",
        left_key="event_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("error_ts_us"),
        "purchase_value",
        "matched_direction",
    )

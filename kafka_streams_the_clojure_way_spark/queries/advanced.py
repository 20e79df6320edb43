"""Advanced relational surface: grouped Pandas UDAF (applyInPandas),
salted aggregation for skew, correlated EXISTS subqueries, and
range-frame (event-time interval) windows — finishing SURVEY.md §2.2's
"UDF/UDAF surface", "skew" posture, and window-frame categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators.relational import salted_group_agg
from kafka_streams_the_clojure_way_spark.queries.registry import query
from kafka_streams_the_clojure_way_spark.sources.files import load_table, register_views


@query(
    "grouped_pandas_zscore",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
               AS bal_z
    FROM customer
    """,
)
def grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via ``applyInPandas`` — the grouped Pandas
    UDAF path (Arrow batch per group, numpy inside). This op IS
    expressible as a window (the oracle does exactly that); it is
    registered through applyInPandas deliberately so the slow-path API is
    covered end-to-end with a full value oracle. Scale: one shuffle on
    the group key; each group must fit in one task's memory — fine for
    bounded groups, use the window formulation for unbounded ones.
    Rounded to 4 so numpy's pairwise sums match SQL's sequential ones."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)  # = stddev_samp
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        out["bal_z"] = ((pdf["c_acctbal"] - mu) / sd).round(4)
        return out

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey long, c_mktsegment string, bal_z double"
    )


@query(
    "agg_salted_skew_counts",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 5 hot event_type keys (the
    deliberately skewed case: ~20k rows/key at sf0.1). Decimal sums keep
    the two-phase re-association bit-exact vs the one-phase oracle."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_group_agg(ev, ["event_type"], ["value_dec"], n_salt=16)
    return out.select(
        "event_type",
        "n",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )


@query(
    "subq_exists_interrupted_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def subq_exists_interrupted_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL frontend: Catalyst
    rewrites both to LEFT SEMI / LEFT ANTI joins (RewritePredicateSubquery)
    — asserted in the plan audit — so the 'subquery' costs exactly two
    key-joins, no per-row probing."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        """
    )


@query(
    "window_ntile_balance_quartiles",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           NTILE(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS bal_quartile
    FROM customer
    """,
)
def window_ntile_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE ranking window: account-balance quartiles within each market
    segment (unique custkey tiebreak keeps tile assignment total-ordered
    and cross-engine deterministic)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


@query(
    "agg_value_histogram",
    oracle="""
    -- DuckDB has no width_bucket; this CASE is its exact definition for
    -- (0, 1000, 20): underflow->0, overflow->21, else 1+floor(v/50)
    SELECT CASE WHEN value < 0 THEN 0
                WHEN value >= 1000 THEN 21
                ELSE CAST(floor(value / 50.0) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n,
           CAST(round(min(value), 6) AS DOUBLE) AS lo,
           CAST(round(max(value), 6) AS DOUBLE) AS hi
    FROM events
    GROUP BY 1
    """,
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket + groupBy — the one-pass
    distributed histogram (each partition buckets locally, partial counts
    merge; no sort, unlike percentiles)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "bucket", F.width_bucket("value", F.lit(0.0), F.lit(1000.0), F.lit(20))
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).cast("double").alias("lo"),
            F.round(F.max("value"), 6).cast("double").alias("hi"),
        )
    )


@query(
    "scalar_array_pack",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           string_split(p_name, ' ')[-1] AS last_word,
           array_to_string(list_sort(string_split(p_name, ' ')), '|')
               AS words_sorted,
           list_contains(string_split(p_name, ' '), 'green') AS has_green,
           array_to_string(string_split(p_name, ' ')[2:3], '|') AS mid_slice
    FROM part
    """,
)
def scalar_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function pack (size/index/negative-index/sort/contains/
    slice) — all JVM-side Catalyst expressions, per-row narrow map.
    Array results are serialized with array_join so the output carries
    only scalar columns (registry discipline: the driver's row hasher
    canonicalizes scalars, not nested types — the array ops themselves
    are still fully exercised upstream of the join)."""
    p = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.array_size(toks).alias("n_words"),
        F.element_at(toks, 1).alias("first_word"),
        F.element_at(toks, -1).alias("last_word"),
        F.array_join(F.array_sort(toks), "|").alias("words_sorted"),
        F.array_contains(toks, "green").alias("has_green"),
        F.array_join(F.slice(toks, 2, 2), "|").alias("mid_slice"),
    )


@query(
    "agg_nation_roster_per_region",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_nation_roster_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect_list -> array_sort ->
    array_join; ≙ string_agg ... ORDER BY). The explicit sort is what
    makes a collect_list deterministic — Spark gives NO intra-group
    ordering guarantee after a shuffle. Scale note: collect_* aggs hold
    the whole group in memory (non-algebraic) — the case where salting
    (salted_group_agg) matters, bounded here by 25 nations/region."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "agg_first_event_per_user",
    oracle="""
    SELECT user_id AS key,
           CAST(min_by(value, event_id) AS DOUBLE) AS first_value,
           MIN(event_id) AS first_seq
    FROM events GROUP BY user_id
    """,
)
def agg_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming ``first_seen`` stateful operator
    (streaming/state.py): each user's first event by event_id via min_by.
    The streaming variant carries a seen-marker in keyed state across
    micro-batches (tested in tests/test_streaming_windows.py); this form
    gives its semantics a full value oracle."""
    from kafka_streams_the_clojure_way_spark.streaming.state import first_seen

    ev = load_table(spark, sf_dir, "events")
    return first_seen(ev, "user_id", "value", "event_id")


@query(
    "window_session_user_events",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL
                         OR ts - prev >= INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS is_new
        FROM (SELECT user_id, ts,
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM events)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTES) AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def window_session_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user on the batch path — the
    SAME ``session_window`` expression the streaming helper uses, so the
    streaming operator's merge semantics get a full SQL oracle via the
    gaps-and-islands formulation (new session iff gap >= 30 min; Spark's
    [start, last+gap) windows don't overlap at exactly-gap spacing).
    Epoch-micros columns keep timestamp rendering out of the comparison."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


@query(
    "window_trailing_30d_spend",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS spend_30d
    FROM orders
    """,
)
def window_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (event-time interval, not row count): customer
    spend over the trailing 30 days. Ordered by epoch-day so the frame
    bound is an integer range in both engines. Unlike ROWS frames, ties
    on the order key share a frame — no tiebreaker needed for
    determinism."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@query(
    "cogroup_customer_order_stats",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS spend_cents
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def cogroup_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup(...).applyInPandas`` — the two-sided grouped-UDF surface:
    both tables shuffle once on the key, and the UDF receives the two
    aligned pandas frames (arbitrary Python merge logic per key — the
    escape hatch for custom semantics no SQL join expresses).

    The cogroup KEY is a hash bucket, NOT c_custkey: cogrouping on the
    natural key means one Python invocation per customer (measured 21 s
    at sf0.1 — per-call overhead dwarfs the work); bucketing gives a
    bounded number of Arrow batches with the per-customer logic
    VECTORIZED inside pandas (merge + groupby), 40x fewer crossings.
    That is the grouped-UDF discipline at 100 TB: pick a key whose
    cardinality is O(tasks), not O(entities), and keep each bucket's
    frames memory-sized. The logic is deliberately SQL-expressible
    (count + integer-cents sum, avoiding float summation-order drift) so
    the oracle checks values exactly."""
    import pandas as pd

    n_buckets = 64

    def stats(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            # orders whose bucket has no customers — impossible under
            # referential integrity; emit nothing
            return pd.DataFrame(
                {"c_custkey": [], "n_orders": [], "spend_cents": []}
            ).astype({"c_custkey": "int64", "n_orders": "int64", "spend_cents": "int64"})
        per_cust = (
            pd.DataFrame(
                {
                    "c_custkey": right["o_custkey"],
                    "cents": (right["o_totalprice"] * 100).round().astype("int64"),
                }
            )
            .groupby("c_custkey")
            .agg(n_orders=("cents", "size"), spend_cents=("cents", "sum"))
        )
        out = left[["c_custkey"]].merge(
            per_cust, left_on="c_custkey", right_index=True, how="left"
        )
        out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
        out["spend_cents"] = out["spend_cents"].fillna(0).astype("int64")
        return out

    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .withColumn("bucket", F.col("c_custkey") % n_buckets)
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .withColumn("bucket", F.col("o_custkey") % n_buckets)
    )
    return (
        c.groupBy("bucket")
        .cogroup(o.groupBy("bucket"))
        .applyInPandas(
            stats, schema="c_custkey long, n_orders long, spend_cents long"
        )
    )


@query(
    "scalar_map_pack",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS prio_val,
           2 AS n_entries,
           'priority,status' AS keys_sorted,
           CASE WHEN o_orderstatus = 'F' THEN 'final'
                ELSE o_orderstatus END AS status_val
    FROM orders
    """,
)
def scalar_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType function pack: construct (``create_map``), lookup
    (``element_at``), introspect (``map_keys``/``size``), and rewrite
    (``transform_values`` higher-order lambda) — all JVM-side Catalyst
    expressions. The oracle states the expected VALUES directly (DuckDB's
    MAP dialect differs; the point is Spark's map semantics produce
    exactly these scalars), so the compare is still value-exact."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    rewritten = F.transform_values(
        m, lambda k, v: F.when((k == "status") & (v == "F"), F.lit("final")).otherwise(v)
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "priority").alias("prio_val"),
        F.size(m).alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(rewritten, "status").alias("status_val"),
    )


@query(
    "udtf_word_positions",
    oracle="""
    WITH t AS (
        SELECT p_partkey, string_split(p_name, ' ') AS ws,
               unnest(generate_series(0, len(string_split(p_name, ' ')) - 1))
                   AS pos
        FROM part)
    SELECT p_partkey, ws[CAST(pos AS INT) + 1] AS word,
           CAST(pos AS INT) AS pos,
           len(ws[CAST(pos AS INT) + 1]) AS word_len
    FROM t
    """,
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, the §2.2 'UDTF surface'
    row): one input row -> N output rows with per-row Python logic, used
    via ``lateralJoin``. The tokenize-with-positions logic is
    deliberately SQL-expressible (unnest WITH ORDINALITY) so the oracle
    is exact. Scale: UDTFs run row-at-a-time in Python workers — keep
    them OFF the hot path (this engine's splitting ops use JVM-side
    split/explode, see explode_part_word_counts); the UDTF exists for
    logic that genuinely needs imperative Python per group of emitted
    rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int, word_len: int")
    class WordPositions:
        def eval(self, name: str):
            for i, w in enumerate((name or "").split(" ")):
                yield w, i, len(w)

    spark.udtf.register("word_positions", WordPositions)
    p = load_table(spark, sf_dir, "part")
    p.select("p_partkey", "p_name").createOrReplaceTempView("part_names")
    return spark.sql(
        """
        SELECT p.p_partkey, t.word, t.pos, t.word_len
        FROM part_names p, LATERAL word_positions(p.p_name) t
        """
    )


@query(
    "udaf_geomean_prices",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           round(exp(avg(ln(p_retailprice))), 6) AS geomean_price
    FROM part
    GROUP BY p_brand
    """,
)
def udaf_geomean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A true UDAF: a series-to-scalar pandas_udf (Arrow-batched grouped
    aggregate) computing the geometric mean of part prices per brand —
    the aggregate form of the reference's everything-is-a-Clojure-fn
    surface (core.clj:79-118). Runs as partial aggregation like any
    built-in agg (AggregateInPandas below one key shuffle). Log-space
    mean + round(6) keeps the float result stable across engines'
    summation orders."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: the module's `from __future__ import
    # annotations` stringifies type hints, so signature inference can't
    # see Series -> scalar here
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(prices):
        import numpy as np

        return float(np.exp(np.log(prices.to_numpy()).mean()))

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg
    # node, so the row count is a pandas aggregate too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(prices):
        return len(prices)

    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        n_rows("p_retailprice").alias("n_parts"),
        F.round(geomean("p_retailprice"), 6).alias("geomean_price"),
    )


@query(
    "scalar_hof_pack",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
    SELECT p_partkey,
           CAST(len(list_filter(toks, w -> length(w) > 5)) AS BIGINT)
               AS n_long_words,
           len(list_filter(toks, w -> length(w) > 8)) > 0 AS any_very_long,
           len(list_filter(toks, w -> length(w) >= 12)) = 0 AS all_short,
           CAST(list_reduce(
                   list_prepend(0, list_transform(toks, w -> length(w))),
                   (a, b) -> a + b) AS BIGINT) AS total_chars,
           CAST(list_reduce(
                   list_prepend(0, list_transform(
                       list_zip(toks, range(1, len(toks) + 1)),
                       p -> length(p[1]) * p[2])),
                   (a, b) -> a + b) AS BIGINT) AS pos_weighted_chars
    FROM t
    """,
)
def scalar_hof_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as first-class registered surface:
    filter / exists / forall / aggregate(fold) / zip_with — the
    lambda-expression family that keeps per-row collection logic inside
    whole-stage codegen instead of a Python UDF. Every output is scalar
    (counts, booleans, folded sums) so the pack is hashable; the fold is
    the same sequential reduce DuckDB's list_reduce computes."""
    p = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    fold_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    pos_weighted = F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.array_size(toks)),
            lambda w, i: F.length(w) * i,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return p.select(
        "p_partkey",
        F.array_size(F.filter(toks, lambda w: F.length(w) > 5))
        .cast("long")
        .alias("n_long_words"),
        F.exists(toks, lambda w: F.length(w) > 8).alias("any_very_long"),
        F.forall(toks, lambda w: F.length(w) < 12).alias("all_short"),
        fold_chars.alias("total_chars"),
        pos_weighted.alias("pos_weighted_chars"),
    )

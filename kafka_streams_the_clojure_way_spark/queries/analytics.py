"""Event-stream product analytics: funnel conversion and cohort
retention over the ``events`` table. Absent from the reference (stateless
pipeline only, SURVEY §2.2) but table stakes for an engine whose source
of truth is a keyed event stream — and a natural fit for the same
conditional-aggregation / window machinery the TPC-H pack exercises.

Determinism: every output column is an epoch-microsecond long, a count,
or a boolean — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.queries.registry import query
from kafka_streams_the_clojure_way_spark.sources.files import load_table

_FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days


@query(
    "funnel_view_to_purchase",
    oracle=f"""
    WITH first_view AS (
        SELECT user_id, MIN(epoch_us(ts)) AS first_view_us
        FROM events WHERE event_type = 'view'
        GROUP BY user_id
    ),
    conv AS (
        SELECT v.user_id, v.first_view_us,
               MIN(epoch_us(e.ts)) AS first_purchase_us
        FROM first_view v
        JOIN events e
          ON e.user_id = v.user_id
         AND e.event_type = 'purchase'
         AND epoch_us(e.ts) > v.first_view_us
         AND epoch_us(e.ts) <= v.first_view_us + {_FUNNEL_WINDOW_US}
        GROUP BY v.user_id, v.first_view_us
    )
    SELECT v.user_id,
           CAST(v.first_view_us AS BIGINT) AS first_view_us,
           CAST(c.first_purchase_us AS BIGINT) AS first_purchase_us,
           (c.user_id IS NOT NULL) AS converted
    FROM first_view v LEFT JOIN conv c ON c.user_id = v.user_id
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: for every user's FIRST view, the first purchase
    inside the 7-day conversion window (NULL + converted=false when none).
    Shape: one per-user aggregate, a range-predicate self-join back to
    the purchase slice, one more per-user aggregate — all equi-joins on
    user_id, so the three stages share one hash-partitioning; the range
    condition rides as a residual. No floats; epoch-microsecond longs."""
    ev = load_table(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("first_view_us"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("p_us")
    )
    conv = (
        first_view.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_us") > F.col("first_view_us"))
            & (F.col("p_us") <= F.col("first_view_us") + _FUNNEL_WINDOW_US),
        )
        .groupBy("user_id")
        .agg(F.min("p_us").alias("first_purchase_us"))
    )
    return (
        first_view.join(conv, "user_id", "left")
        .select(
            "user_id",
            "first_view_us",
            "first_purchase_us",
            F.col("first_purchase_us").isNotNull().alias("converted"),
        )
    )


_WEEK_US = 7 * 24 * 3600 * 1_000_000


@query(
    "cohort_weekly_retention",
    oracle=f"""
    WITH ue AS (
        SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM ue GROUP BY user_id
    )
    SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
           CAST(ue.week - c.cohort_week AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT ue.user_id) AS BIGINT) AS active_users
    FROM ue JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week,
    distinct actives per (cohort, week offset). Shape: one per-user min
    (the cohort map — at most one row per user, broadcastable against a
    100 TB event log), joined back into the event stream, then a
    count-distinct on a tiny (cohort, offset) key space. All integer
    epoch-week arithmetic."""
    # integer floor-division — double division at 1e15-microsecond
    # magnitudes is ulp-risky; `div` matches DuckDB's // exactly
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("week"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "active_users",
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@query(
    "session_pattern_conversions",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS us, event_type, event_id
        FROM events
    ),
    marked AS (
        SELECT *,
               CASE WHEN us - LAG(us) OVER w > {_SESSION_GAP_US}
                    OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    ),
    seqs AS (
        SELECT user_id, session_no,
               list(event_type ORDER BY us, event_id) AS seq
        FROM sess GROUP BY user_id, session_no
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN list_position(seq, 'purchase') > 0
                          AND list_position(seq, 'view') > 0
                          AND list_position(seq, 'view')
                              < list_position(seq, 'purchase')
                         THEN 1 ELSE 0 END) AS BIGINT) AS view_then_purchase,
           CAST(SUM(CASE WHEN seq[1] = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS error_first
    FROM seqs
    """,
)
def session_pattern_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence analysis without a pattern engine:
    gaps-and-islands sessionization (30-min inactivity), each session's
    ordered event-type sequence built as an array (sorted by (ts,
    event_id) — collect_list alone is shuffle-order-dependent), then
    subsequence predicates on the array (first 'view' precedes first
    'purchase'; session opens with 'error'). Shape: two windows + one
    groupBy, all on the user_id partitioning; the sequence arrays are
    session-sized, never corpus-sized."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_type",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lag_us = F.lag("us").over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(
            lag_us.isNull() | ((F.col("us") - lag_us) > _SESSION_GAP_US), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    seqs = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "event_type"))
            ).alias("__ordered")
        )
        .select(
            F.transform(F.col("__ordered"), lambda s: s["event_type"]).alias("seq")
        )
    )
    pos_view = F.array_position(F.col("seq"), "view")
    pos_purchase = F.array_position(F.col("seq"), "purchase")
    return seqs.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(
                (pos_view > 0) & (pos_purchase > 0) & (pos_view < pos_purchase), 1
            ).otherwise(0)
        ).alias("view_then_purchase"),
        F.sum(
            F.when(F.element_at("seq", 1) == "error", 1).otherwise(0)
        ).alias("error_first"),
    )

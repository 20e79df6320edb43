"""Extended relational + pipeline surface: range/interval joins, edit
distance, array/vector functions, the SQL-string frontend, grouping sets,
approximate distinct, and embedding near-dup — completing SURVEY.md §2.2's
absent-category table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators import similarity as S
from kafka_streams_the_clojure_way_spark.operators.relational import top_k_per_key
from kafka_streams_the_clojure_way_spark.queries.registry import query
from kafka_streams_the_clojure_way_spark.sources.files import load_table


# --------------------------------------------------------------------------
# Range / interval joins
# --------------------------------------------------------------------------

@query(
    "join_range_ship_window",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    """,
)
def join_range_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range predicate (ship within 60 days of order): the
    range condition rides the orderkey hash join as a post-join filter —
    no nested-loop range join is ever planned because the equi key anchors
    it. The shape to avoid at scale is range-ONLY joins; always find the
    anchor key first."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.date_add(o.o_orderdate.cast("date"), 60).cast("timestamp")),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,2)"))
        .cast("double")
        .alias("total_price"),
    )


_INTERVAL_US = 5 * 60 * 1_000_000  # 5 minutes


@query(
    "join_interval_event_pairs",
    oracle=f"""
    SELECT a.event_id AS id_a,
           b.event_id AS id_b,
           a.user_id,
           abs(epoch_us(a.ts) - epoch_us(b.ts)) AS dt_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {_INTERVAL_US}
    """,
)
def join_interval_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self interval join (pairs of events by the same user within 5
    minutes) via TIME BUCKETING: each left row probes its bucket and the
    next one, the right side keeps one bucket, candidates filter on the
    exact interval. Candidate cost is O(events per 5-min bucket per user),
    never |events|^2 per user — the banded-range-join pattern every
    streaming sessionizer at scale uses. Oracle is the naive inequality
    join (fine at oracle SF)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("t")
    )
    bucket = (F.col("t") / F.lit(_INTERVAL_US)).cast("long")
    probe = ev.withColumn("b", F.explode(F.array(bucket, bucket + 1)))
    build = ev.withColumn("b", bucket)
    a, b = probe.alias("a"), build.alias("b")
    pairs = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id")) & (F.col("a.b") == F.col("b.b")))
        .filter(
            (F.col("a.event_id") < F.col("b.event_id"))
            & (F.abs(F.col("a.t") - F.col("b.t")) <= _INTERVAL_US)
        )
        .select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            F.col("a.user_id").alias("user_id"),
            F.abs(F.col("a.t") - F.col("b.t")).alias("dt_us"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


# --------------------------------------------------------------------------
# Graph analytics: triangle counting
# --------------------------------------------------------------------------

#: shared co-purchase edge upstream: graph_triangle_parts and
#: graph_pagerank_parts build the IDENTICAL undirected (u < v) distinct
#: edge list. r12: DISK-materialized once per (process, sf) via the
#: _materialized_sigs convention (source-token validated against
#: lineitem, atexit-cleaned) — the production shape: the graph is an
#: artifact you build once and run N analytics over, and each query's
#: eager localCheckpoint was re-running the scan+self-join+dedup chain
#: per query (~1.5 s vs ~0.3 s parquet readback at sf0.1). An explicit
#: .cache() pin was A/B-measured in r11 (best-of-3, canary-normalized)
#: and LOST ~5% — the InMemoryRelation write+columnar read costs more
#: at this edge count; the parquet readback does not carry that
#: overhead and WINS, the same split the r10 signature tables showed.
def _copurchase_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_the_clojure_way_spark.queries.llm_pipeline import (
        _materialized_sigs,
    )

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        op = (
            li.filter(F.col("l_orderkey") % 8 == 0)
            .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
            .dropDuplicates()
        )
        a, b = op.alias("a"), op.alias("b")
        return (
            a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
            .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
            .dropDuplicates()
        )

    return _materialized_sigs(spark, sf_dir, "copurchase", build, table="lineitem")


@query(
    "graph_triangle_parts",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem WHERE l_orderkey % 8 = 0),
    edges AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    ),
    tri AS (
        SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri) t
    GROUP BY node
    """,
)
def graph_triangle_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph (parts are
    adjacent when some order contains both): the classic market-basket /
    community-density graph analytic, and the repo's representative of
    the two-self-join graph-pattern class (GraphX triangleCount shape).

    The operator (operators/graph.triangle_counts) re-orients every edge
    low-degree -> high-degree before the wedge join, which is the
    standard hub-blowup fix: total wedge work is O(m^1.5) instead of
    sum(deg^2) — the difference between finishing and not on a 100 TB
    graph with celebrity nodes. The graph is built from a deterministic
    12.5% order sample (orderkey mod 8) purely to keep BENCH proportionate:
    the co-purchase graph densifies quadratically with orders per part,
    and the full-corpus graph belongs in a dedicated job, not a 130-query
    sweep. Oracle: the naive three-way self-join on id-ordered edges
    (fine at oracle SF; counts each triangle once)."""
    from kafka_streams_the_clojure_way_spark.operators.graph import triangle_counts

    # pre_normalized: _copurchase_und materializes distinct (u, v) with
    # u < v by construction (the a.p < b.p join condition), so the
    # operator's normalize+dedup shuffle would be an identity pass.
    return triangle_counts(_copurchase_und(spark, sf_dir), pre_normalized=True)


_PR_EDGES_SQL = """
        WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                    FROM lineitem WHERE l_orderkey % 8 = 0),
        und AS (
            SELECT DISTINCT a.p AS u, b.p AS v
            FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        )
        SELECT u AS src, v AS dst FROM und
        UNION ALL
        SELECT v AS src, u AS dst FROM und
"""


def _pr_oracle() -> str:
    from kafka_streams_the_clojure_way_spark.operators.graph import pagerank_sql

    return pagerank_sql(_PR_EDGES_SQL)


@query("graph_pagerank_parts", oracle=_pr_oracle())
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the same co-purchase part graph as
    graph_triangle_parts (symmetrized): which parts sit at the center of
    the purchasing network. The repo's representative of fixed-iteration
    iterative dataflow — 6 driver-loop rounds of one equi-join + one
    groupBy each, state checkpointed per round, ranks kept as integer
    fixed-point BIGINTs so the result (and the DuckDB unrolled-CTE
    oracle) is bit-exact regardless of partial-sum order. See
    operators/graph.pagerank for the 100 TB shape."""
    from kafka_streams_the_clojure_way_spark.operators.graph import pagerank

    und = _copurchase_und(spark, sf_dir)
    edges = und.selectExpr("u AS src", "v AS dst").unionAll(
        und.selectExpr("v AS src", "u AS dst")
    )
    # distinct by construction: und is distinct with u < v, so the two
    # symmetrized halves cannot collide — skip the operator's dedup.
    return pagerank(edges, assume_distinct=True)


# --------------------------------------------------------------------------
# Edit distance (blocked)
# --------------------------------------------------------------------------

@query(
    "text_levenshtein_blocked",
    oracle="""
    SELECT * FROM (
        SELECT a.p_partkey AS probe_key,
               b.p_partkey AS match_key,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
               ROW_NUMBER() OVER (PARTITION BY a.p_partkey
                                  ORDER BY levenshtein(a.p_name, b.p_name), b.p_partkey)
                   AS rank
        FROM part a
        JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey != b.p_partkey
        WHERE a.p_partkey % 100 = 0)
    WHERE rank <= 3
    """,
)
def text_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance matching: probes x same-brand block, 3 nearest
    names each. Blocking (here: brand) is what keeps O(n*m*lev) feasible —
    the unblocked version is quadratic in rows AND quadratic per string."""
    p = load_table(spark, sf_dir, "part")
    probes = p.filter(F.col("p_partkey") % 100 == 0).select(
        F.col("p_partkey").alias("probe_key"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("probe_name"),
    )
    block = p.select(
        F.col("p_partkey").alias("match_key"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("match_name"),
    )
    cand = probes.join(block, "brand").filter(F.col("probe_key") != F.col("match_key"))
    scored = cand.withColumn(
        "lev", F.levenshtein("probe_name", "match_name").cast("long")
    )
    return top_k_per_key(
        scored.select("probe_key", "match_key", "lev"),
        keys=["probe_key"],
        order_by=[F.col("lev"), F.col("match_key")],
        k=3,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("long"))


# --------------------------------------------------------------------------
# Array / vector function pack
# --------------------------------------------------------------------------

@query(
    "array_vector_stats",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS vmax,
           CAST(list_min(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS vmin,
           sqrt({S._dot_sql('embedding', 'embedding')}) AS l2_norm,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS BIGINT)
               AS n_positive
    FROM embeddings
    """,
)
def array_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function pack over the embedding column: size, min/max, L2
    norm (sequential fold — matches the oracle bit-for-bit), positivity
    count. All JVM higher-order functions."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.array_size("embedding").cast("long").alias("dim"),
        F.array_max(vec).alias("vmax"),
        F.array_min(vec).alias("vmin"),
        F.sqrt(S.dot(F.col("embedding"), F.col("embedding"))).alias("l2_norm"),
        F.array_size(F.filter(vec, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


# --------------------------------------------------------------------------
# SQL-string frontend
# --------------------------------------------------------------------------

_Q3ISH = """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue,
           epoch(o.o_orderdate)::BIGINT AS orderdate_epoch
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@query("sql_frontend_shipping_priority", oracle=_Q3ISH)
def sql_frontend_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style query through the SQL-STRING frontend (spark.sql on
    registered views) — demonstrating the parser surface is free; the SQL
    here is near-verbatim the DuckDB oracle (only epoch extraction
    differs by dialect)."""
    from kafka_streams_the_clojure_way_spark.sources.files import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue,
               unix_timestamp(o.o_orderdate) AS orderdate_epoch
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """
    )


@query(
    "agg_grouping_sets_events",
    oracle="""
    SELECT event_type,
           user_id % 5 AS user_bucket,
           COUNT(*) AS n_events
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 5))
    """,
)
def agg_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither full cube nor rollup) via the SQL
    frontend — each set aggregates in one pass over the expanded input."""
    from kafka_streams_the_clojure_way_spark.sources.files import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, user_id % 5 AS user_bucket, COUNT(*) AS n_events
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 5))
        """
    )


@query(
    "agg_metadata_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_custkey) AS min_o_custkey,
           MAX(o_custkey) AS max_o_custkey,
           MIN(o_totalprice) AS min_o_totalprice,
           MAX(o_totalprice) AS max_o_totalprice
    FROM orders
    """,
)
def agg_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table stats answered from parquet FOOTER metadata (aggregate
    pushdown, SPARK-34952): count + key/price ranges with zero data
    pages read — at 100 TB, a metadata operation instead of a full scan
    for the "how big / what range" queries every pipeline runs. The scan
    node carries PushedAggregation (plan-audit-pinned); the values are
    identical to the full-scan answer, so the oracle is a plain
    aggregate."""
    import os

    from kafka_streams_the_clojure_way_spark.sources.files import metadata_stats

    # No trailing .select(): a further transform would re-plan outside
    # the helper's conf scope and silently lose the pushdown (the
    # driver's compare sorts columns by name, so order doesn't matter).
    return metadata_stats(
        spark,
        os.path.join(sf_dir, "orders.parquet"),
        min_cols=("o_custkey", "o_totalprice"),
        max_cols=("o_custkey", "o_totalprice"),
    )


def _fingerprint_oracle() -> str:
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        dataset_fingerprint_sql,
    )

    return dataset_fingerprint_sql(
        ["doc_id", "lang", "n_chars", "text"], "documents", group_by=["source"]
    )


@query("meta_corpus_fingerprint", oracle=_fingerprint_oracle())
def meta_corpus_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine dataset CHECKSUM, per source: the migration /
    replication validation primitive. Copying 100 TB between systems (or
    re-encoding parquet, or switching engines) ends with exactly this
    query on both sides: per-group row counts + order-insensitive
    portable-hash sums; equal outputs = bit-identical content, and a
    divergent group names the slice to re-ship. Pure scan + map-side
    partial agg — the shuffle carries one decimal per (group, mapper).
    The oracle IS the other engine running the same fingerprint, which is
    the whole point."""
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        dataset_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dataset_fingerprint(
        docs, ["doc_id", "lang", "n_chars", "text"], group_by=["source"]
    )


@query(
    "agg_approx_distinct_users",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events_exact,
           true AS users_within_bound,
           true AS events_within_bound
    FROM events
    """,
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distincts — THE distinct-count operator at
    100 TB (exact distinct shuffles every key; HLL ships a KB-scale sketch
    per partition). rsd=0.02 is the operating point: per-row update cost
    grows steeply with precision (measured 5x from rsd 0.05 to 0.01 on
    this engine) while 2% error is far tighter than corpus-cardinality
    decisions need. DuckDB's approx_count_distinct uses a different
    sketch, so the hashable output is the BOUND VERDICT: the HLL++
    estimate must sit within 5 sigma (rsd is a standard deviation, not a
    hard bound) of the exact distinct computed in the same query; the
    oracle asserts constant-true over the same exact counts — a
    deterministic pass/fail the value hash can catch instead of a
    rows-only row."""
    ev = load_table(spark, sf_dir, "events")

    # One SHARED partial-aggregation pass per key instead of mixing
    # count_distinct + approx in a single agg: multiple distinct
    # aggregates force Catalyst's Expand (rows x n_distinct_columns
    # shuffled, measured 5.9x slower r7), while select(k).distinct()
    # map-side-combines each key down to its distinct set BEFORE the
    # only shuffle, and the HLL sketch is duplicate-insensitive, so
    # feeding it distinct rows yields the identical estimate.
    def leg(key: str, out: str):
        d = ev.select(key).distinct()
        return d.agg(
            F.count(F.lit(1)).alias(f"n_{out}_exact"),
            F.approx_count_distinct(key, rsd=0.02).alias(f"approx_{out}"),
        )

    agg = leg("user_id", "users").crossJoin(leg("event_id", "events"))

    def within(approx: str, exact: str):
        return F.abs(F.col(approx) - F.col(exact)) <= (
            5 * 0.02 * F.col(exact) + F.lit(2)
        )

    return agg.select(
        "n_users_exact",
        "n_events_exact",
        within("approx_users", "n_users_exact").alias("users_within_bound"),
        within("approx_events", "n_events_exact").alias("events_within_bound"),
    )


# --------------------------------------------------------------------------
# Embedding near-dup
# --------------------------------------------------------------------------

# The synthetic embeddings are isotropic-random (measured max pairwise
# cosine ~0.48, labels carry no geometry), so a production-style 0.95+
# threshold would make the gate vacuous. 0.3 keeps the semantics
# ("suspiciously similar for this corpus") AND a non-empty oracle.
_NEARDUP_COS = 0.3


@query(
    "dedup_embedding_neardup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding,
                      {S.lsh_bucket_sql('embedding')} AS bucket FROM embeddings),
    cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {S.cosine_sql('a.embedding', 'b.embedding')} AS cosine
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cosine, 6) AS cosine_r
    FROM cand WHERE cosine > {_NEARDUP_COS}
    """,
)
def dedup_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket-blocked: the
    semantic-dedup step of an LLM data pipeline. Same candidates-by-bucket
    shape as ANN search; cosine > 0.99 within buckets only."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        S.lsh_bucket(F.col("embedding")).alias("bucket"),
        # per-row norm: each bucket pair below runs ONE dot fold instead
        # of three (bit-equal — similarity.cosine_prenorm)
        S.norm_col(F.col("embedding")).alias("nv"),
    ).cache()
    a, b = e.alias("a"), e.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        S.cosine_prenorm(
            S.dot(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a.nv"),
            F.col("b.nv"),
        ).alias("cosine"),
    )
    return (
        cand.filter(F.col("cosine") > _NEARDUP_COS)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))
    )


@query(
    "agg_copurchase_lift",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem WHERE l_orderkey % 8 = 0),
    tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li),
    item AS (SELECT p, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY p),
    pair AS (
        SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS pair_count
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT pr.u, pr.v, pr.pair_count, ia.cnt AS cnt_u, ib.cnt AS cnt_v,
               round(CAST(pr.pair_count * t.n_orders AS DOUBLE)
                     / (ia.cnt * ib.cnt), 6) AS lift
        FROM pair pr
        JOIN item ia ON ia.p = pr.u
        JOIN item ib ON ib.p = pr.v
        CROSS JOIN tot t
    )
    SELECT u, v, pair_count, cnt_u, cnt_v, lift FROM scored
    ORDER BY pair_count DESC, u, v LIMIT 20
    """,
)
def agg_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (market-basket lift): for the top-20
    co-purchased part pairs, lift = P(u,v) / (P(u) P(v)) — >1 means the
    pair co-occurs more than independence predicts. The pair counting is
    the same self-equi-join as the triangle/PageRank edge build (the
    Apriori support-counting shape); item supports broadcast back onto
    pairs; the ratio is computed from exact BIGINT counts so the oracle
    is bit-exact. Same deterministic 12.5% order sample as the graph
    queries to keep BENCH proportionate."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 8 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .dropDuplicates()
    )
    tot = li.select("o").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    item = li.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    ia = item.select(F.col("p").alias("u"), F.col("cnt").alias("cnt_u"))
    ib = item.select(F.col("p").alias("v"), F.col("cnt").alias("cnt_v"))
    scored = (
        pair.join(F.broadcast(ia), "u")
        .join(F.broadcast(ib), "v")
        .crossJoin(F.broadcast(tot))
        .select(
            "u", "v", "pair_count", "cnt_u", "cnt_v",
            F.round(
                (F.col("pair_count") * F.col("n_orders")).cast("double")
                / (F.col("cnt_u") * F.col("cnt_v")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("pair_count").desc(), "u", "v").limit(20)

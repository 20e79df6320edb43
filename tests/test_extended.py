"""Tests for extended-surface operators (approx distinct accuracy, interval
join correctness on crafted data)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.queries.extended import (
    agg_approx_distinct_users,
)

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rsd(spark):
    """The registered query now emits bound VERDICTS (round 7: in-query
    exact counts + within-bound booleans so the DuckDB oracle can hash
    it); assert the verdicts AND re-derive the raw envelope from the
    sketch directly."""
    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    ev = load_table(spark, SF, "events")
    exact = ev.agg(
        F.count_distinct("user_id").alias("u"), F.count_distinct("event_id").alias("e")
    ).collect()[0]
    row = agg_approx_distinct_users(spark, SF).collect()[0]
    assert row.n_users_exact == exact.u and row.n_events_exact == exact.e
    assert row.users_within_bound and row.events_within_bound, row
    approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
    ).collect()[0]
    # rsd is a std-dev, not a hard bound -> generous 5% envelope
    assert abs(approx.approx_users - exact.u) <= max(1, 0.05 * exact.u)
    assert abs(approx.approx_events - exact.e) <= 0.05 * exact.e


def test_interval_join_bucketing_catches_cross_bucket_pairs(spark):
    """Two events 4 minutes apart but straddling a 5-minute bucket
    boundary MUST still pair — the adjacent-bucket probe covers it."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # bucket k ends at 00:05; these straddle it, 2 min apart
        {"event_id": 1, "user_id": 7, "ts": base + dt.timedelta(minutes=4)},
        {"event_id": 2, "user_id": 7, "ts": base + dt.timedelta(minutes=6)},
        # same bucket pair
        {"event_id": 3, "user_id": 7, "ts": base + dt.timedelta(minutes=7)},
        # too far from everything
        {"event_id": 4, "user_id": 7, "ts": base + dt.timedelta(minutes=30)},
        # different user, same times
        {"event_id": 5, "user_id": 8, "ts": base + dt.timedelta(minutes=5)},
    ]
    df = spark.createDataFrame(rows)

    # run the same bucketed pairing logic the registered query uses
    from kafka_streams_the_clojure_way_spark.queries.extended import _INTERVAL_US

    ev = df.select("event_id", "user_id", F.unix_micros(F.col("ts")).alias("t"))
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
        .select(F.col("a.event_id").alias("id_a"), F.col("b.event_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    got = sorted((r.id_a, r.id_b) for r in pairs.collect())
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_polymorphic_udtf_analyze_schema(spark):
    """Spark 4 polymorphic UDTF: output schema computed by analyze() from
    the call's literal argument — here an n-gram splitter whose column
    count follows n. The static-schema UDTF (udtf_word_positions) covers
    the LATERAL query path; this covers the dynamic-schema API."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = text.split()
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    ngrams = udtf(NGrams)
    spark.udtf.register("test_ngrams", ngrams)

    two = spark.sql(
        "SELECT * FROM test_ngrams('a b c d', 2)"
    ).collect()
    assert [tuple(r) for r in two] == [("a", "b"), ("b", "c"), ("c", "d")]
    three = spark.sql("SELECT * FROM test_ngrams('a b c d', 3)").collect()
    assert [tuple(r) for r in three] == [("a", "b", "c"), ("b", "c", "d")]
    assert three[0].__fields__ == ["w0", "w1", "w2"]


def test_source_overlap_matrix_matches_bruteforce(spark, tmp_path):
    """The combination-explode form (skew-immune: fanout bounded by the
    SOURCE count per shingle, no postings self-join) must equal the
    brute-force pairwise set computation — including a hot shingle
    present in every source."""
    import itertools

    from kafka_streams_the_clojure_way_spark.operators.dedup import shingle_hashes
    from kafka_streams_the_clojure_way_spark.queries.llm_pipeline import (
        agg_source_overlap_matrix,
    )

    rows = [
        # "hot common phrase" shingles appear in all three sources
        (1, "hot common phrase shared by every source here", "en", "a", 0),
        (2, "hot common phrase shared by nobody else today", "en", "b", 0),
        (3, "hot common phrase entirely different tail tokens", "en", "c", 0),
        (4, "a second document unique to source a only", "en", "a", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "mini")
    import os

    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    sets: dict[str, set] = {}
    for r in docs.select(
        "source", shingle_hashes(F.col("text")).alias("sh")
    ).collect():
        sets.setdefault(r.source, set()).update(r.sh)
    expected = sorted(
        (a, b, len(sets[a] & sets[b]), round(len(sets[a] & sets[b]) / len(sets[a] | sets[b]), 6))
        for a, b in itertools.combinations(sorted(sets), 2)
        if sets[a] & sets[b]
    )
    got = sorted(
        (r.src_a, r.src_b, r.shared_shingles, r.overlap_jaccard_r)
        for r in agg_source_overlap_matrix(spark, sf).collect()
    )
    assert got == expected
    assert any(n >= 1 for _, _, n, _ in got)

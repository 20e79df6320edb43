"""Streaming throughput of the reference pipeline (SURVEY.md §6):
runs the merged large-transactions topology (filter -> project -> union,
core.clj:129-134 semantics) over a replicated events input through
Structured Streaming (availableNow) AND plain batch, printing rows/sec.

Context (BASELINE.md): Kafka Streams 2.2 stateless pipelines run at
~10^5-10^6 records/s/core. This script produces the comparable number
for this engine on the same logical pipeline.

Usage: python scripts/stream_bench.py [replication=20]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TMP = "/root/repo/.bench_tmp"

EVENT_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def pipeline(df):
    """The reference's merged pipeline over events (≙ core.clj:129-134)."""
    purchases = (
        df.filter(F.col("event_type") == "purchase")
        .select("user_id", F.floor("value").cast("long").alias("amount"))
        .filter(F.col("amount") >= 100)
    )
    donations = (
        df.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.floor(F.floor(F.col("value") * 100) / 100).cast("long").alias("amount"),
        )
        .filter(F.col("amount") >= 100)
    )
    return purchases.unionByName(donations)


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from kafka_streams_the_clojure_way_spark import get_spark

    spark = get_spark("kstcw-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # replicate events to amortize fixed startup out of the rate
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    big = src
    for _ in range(replication - 1):
        big = big.unionByName(src)
    shutil.rmtree(TMP, ignore_errors=True)
    big.write.parquet(f"{TMP}/events_in")
    n_rows = spark.read.parquet(f"{TMP}/events_in").count()

    # batch
    t0 = time.time()
    pipeline(spark.read.parquet(f"{TMP}/events_in")).write.format("noop").mode(
        "overwrite"
    ).save()
    batch_s = time.time() - t0

    # streaming availableNow through the same pipeline
    stream_in = spark.readStream.schema(EVENT_SCHEMA).parquet(f"{TMP}/events_in")
    t0 = time.time()
    q = (
        pipeline(stream_in)
        .writeStream.format("noop")
        .option("checkpointLocation", f"{TMP}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    while q.isActive:
        q.awaitTermination(5)
    stream_s = time.time() - t0

    cores = spark.sparkContext.defaultParallelism
    print(
        json.dumps(
            {
                "metric": "reference_pipeline_throughput",
                "rows": n_rows,
                "batch_rows_per_sec": round(n_rows / batch_s),
                "stream_rows_per_sec": round(n_rows / stream_s),
                "stream_rows_per_sec_per_core": round(n_rows / stream_s / cores),
                "cores": cores,
                "unit": "rows/sec",
            }
        )
    )
    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()

"""AQE skew-join handling: a heavily skewed key must be split into
multiple tasks by OptimizeSkewedJoin (SortMergeJoin(skew=true) in the
final adaptive plan) — the runtime complement to the engine's manual
salting operators (operators/relational.salted_join), and the default
first line of defense at 100 TB."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        # force the demonstration at toy sizes
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep it sort-merge
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # ~95% of the fact rows share one key; pad makes bytes-skew real
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("pad"),
        )
        dim = spark.range(0, 200_000, 1).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = fact.join(dim, "k")
        # execute THIS frame (count() builds a different plan tree whose
        # adaptive finalization wouldn't reflect back onto `joined`)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

"""One-pass data-quality validation: rule violations counted as observed
metrics inside a single scan (never one COUNT per rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.quality import (
    QualityError,
    enforce,
    validate,
)
from kafka_streams_the_clojure_way_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_validate_counts_violations_in_one_pass(spark):
    c = load_table(spark, SF, "customer")
    got = validate(
        c,
        {
            "custkey_nonneg": F.col("c_custkey") >= 0,
            "segment_known": F.col("c_mktsegment").isin(
                "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
            ),
            "balance_below_abs_cap": F.abs(F.col("c_acctbal")) < 1.0,  # will fail
        },
    )
    assert got["__rows"] == c.count()
    assert got["custkey_nonneg"] == 0
    assert got["segment_known"] == 0
    assert got["balance_below_abs_cap"] > 0


def test_enforce_raises_listing_failed_rules(spark):
    c = load_table(spark, SF, "customer")
    with pytest.raises(QualityError, match="balance_below_abs_cap"):
        enforce(c, {"balance_below_abs_cap": F.abs(F.col("c_acctbal")) < 1.0})
    # all-passing rules return the counters
    ok = enforce(c, {"custkey_nonneg": F.col("c_custkey") >= 0})
    assert ok["custkey_nonneg"] == 0 and ok["__rows"] > 0

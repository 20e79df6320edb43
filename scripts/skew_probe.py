"""Hot-gram skew probe for the substring-dedup family: measures the
default (count-over-window) vs ``skew_safe=True`` (groupBy + join-back)
formulations of duplicate_ngram_spans on

1. the UNIFORM sf0.1 documents corpus (where the window form won its
   default status: one shuffle, one posting explode), and
2. a HOT-GRAM corpus: the same documents plus N_HOT replicas of a doc
   sharing one boilerplate sentence, so a single gram_hash carries N_HOT
   postings and the window partition for that gram lands on ONE task.
   AQE splits skewed shuffle JOIN reads but not window partitions — the
   exact situation the skew_safe flag exists for.

Both forms must return identical results (asserted here and pytest-gated);
the timing delta is the data behind the default-vs-flag advice.

Usage: python scripts/skew_probe.py [n_hot=10000] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_the_clojure_way_spark import get_spark  # noqa: E402
from kafka_streams_the_clojure_way_spark.operators import dedup as D  # noqa: E402
from kafka_streams_the_clojure_way_spark.sources.files import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

#: 12 tokens -> 5 hot 8-grams per replica, one shared boilerplate block
BOILERPLATE = "terms of service apply all rights reserved contact support for details"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_forms(df, label: str):
    out = {}
    for form, kw in (("window_default", {}), ("skew_safe", {"skew_safe": True})):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(D.duplicate_ngram_spans(df, **kw))
            best = min(best, time.time() - t0)
        out[form] = round(best, 2)
        print(f"{label:10s} {form:15s} {best:6.2f}s")
    return out


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(
        "kstcw-skew-probe", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base_max = docs.agg(F.max("doc_id")).collect()[0][0]

    # hot replicas: unique ids, each text = boilerplate + a unique tail so
    # ONLY the boilerplate grams go hot (not whole-document dup grams)
    hot = (
        spark.range(n_hot)
        .select(
            (F.col("id") + base_max + 1).alias("doc_id"),
            F.concat(
                F.lit(BOILERPLATE + " "),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(F.lit(f"u{i}x"), F.col("id").cast("string"))
                        for i in range(8)
                    ],
                ),
            ).alias("text"),
        )
        .repartition(32)
    )
    skewed = docs.unionByName(hot)

    results = {"n_hot": n_hot}
    results["uniform"] = time_forms(docs, "uniform")
    results["hot_gram"] = time_forms(skewed, "hot_gram")

    # parity on the skewed corpus: the flag may only move cost, not output
    a = D.duplicate_ngram_spans(skewed)
    b = D.duplicate_ngram_spans(skewed, skew_safe=True)
    n_a = a.count()
    assert n_a == b.count() and a.exceptAll(b).isEmpty(), "form parity broken"
    results["skewed_spans_rows"] = n_a
    print(json.dumps(results, separators=(",", ":")))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()

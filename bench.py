"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a noop write (full computation, no driver-side
collect bottleneck). A warmup query amortizes JVM/codegen startup, and
each query is timed as the min over two FULL PASSES of the registry so
one-time costs (codegen of large expression trees, executor-side pandas
import) don't masquerade as plan cost — the numbers measure the plans,
not the JIT. The two samples of a query are minutes apart, so a
transient host-contention burst (measured: a co-scheduled run inflated
back-to-back min-of-2 timings up to 17x in round 5) can no longer poison
both samples of the same query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_streams_the_clojure_way_spark import get_spark
    from kafka_streams_the_clojure_way_spark.queries import QUERIES

    spark = get_spark("kstcw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + whole-stage-codegen compilation paths.
    force(QUERIES["agg_pricing_summary"](spark, sf_dir))

    best: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in sorted(QUERIES.items()):
            t0 = time.time()
            force(fn(spark, sf_dir))
            dt = time.time() - t0
            if dt < best.get(name, float("inf")):
                best[name] = dt
            # Drop caches the query may have built (dedup/sim pipelines
            # cache signature frames): accumulated cache blocks from 100+
            # queries otherwise build executor-memory pressure that skews
            # later queries' timings (measured ~5% total drift per run).
            spark.catalog.clearCache()
    timings = {name: round(sec, 3) for name, sec in sorted(best.items())}

    families: dict[str, float] = {}
    for name, sec in timings.items():
        fam = name.split("_", 1)[0]
        families[fam] = round(families.get(fam, 0.0) + sec, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "families": families,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(payload, separators=(",", ":"))
    # Full per-query detail goes to the file artifact only: the driver
    # captures just the LAST 2000 BYTES of stdout, and the 155-query line
    # is ~8 KB, so it can never parse from the tail (rounds 1-2:
    # parsed=null). stdout gets a compact summary (<1.5 KB) as the FINAL
    # line — family sums, not per-query times.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as f:
        f.write(line + "\n")
    summary = {
        "metric": "total_query_wall_sec",
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
        "n_queries": len(timings),
        "queries": families,  # family sums; per-query detail in BENCH.json
        "granularity": "family",
        "detail": "BENCH.json",
    }
    sline = json.dumps(summary, separators=(",", ":"))
    if len(sline) >= 1900:
        # Degrade, never abort: the driver captures only the last 2000
        # stdout bytes, so if the family map outgrows the tail budget we
        # drop it (detail stays in BENCH.json) rather than losing the
        # whole line to an assert AFTER the multi-minute run.
        summary.pop("queries", None)
        summary["granularity"] = "total-only (family map exceeded tail budget)"
        sline = json.dumps(summary, separators=(",", ":"))
    sys.stdout.write(sline + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()

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

    # Canary: a fixed scan+agg timed at both ends of each pass. Its
    # min-time is the HOST SPEED constant of this run — round-over-round
    # comparisons divide by it so VM contention (measured 1.3-4.5x
    # between rounds 5 and 6 with identical code, host_drift_r6.json)
    # normalizes out without a manual A/B investigation.
    def canary_time() -> float:
        t0 = time.time()
        force(QUERIES["agg_pricing_summary"](spark, sf_dir))
        return time.time() - t0

    # Frozen canary (r12, VERDICT r11 #7 — ADDITIVE, the original canary
    # field is unchanged): the registry canary runs agg_pricing_summary
    # through the engine's load_table path, so engine fixed-cost
    # optimizations (schema/DataFrame-object caches) move it and
    # canary-normalized round comparisons conflate host speed with code
    # speed. This probe is pinned HERE: a direct spark.read.parquet +
    # hash-aggregate, no engine module in the loop — a pure host-speed
    # constant for cross-round normalization.
    def frozen_canary_time() -> float:
        from pyspark.sql import functions as F

        t0 = time.time()
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        force(
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity"), F.sum("l_extendedprice"),
                F.avg("l_discount"), F.count("*"),
            )
        )
        return time.time() - t0

    names = sorted(QUERIES)
    best: dict[str, float] = {}
    pass_totals: list[float] = []
    canary = float("inf")
    frozen_canary = float("inf")
    for _pass in range(2):
        canary = min(canary, canary_time())
        frozen_canary = min(frozen_canary, frozen_canary_time())
        pass_wall = 0.0
        for i, name in enumerate(names):
            t0 = time.time()
            force(QUERIES[name](spark, sf_dir))
            dt = time.time() - t0
            pass_wall += dt
            if dt < best.get(name, float("inf")):
                best[name] = dt
            # Drop caches at FAMILY boundaries, not per query: process-
            # wide cache reuse inside a family is a designed property
            # (the five pipeline_ingestion_* queries are views over ONE
            # compiled topology's gate outputs — clearing between them
            # would bill the shared gates five times), while letting
            # cache blocks from 100+ queries accumulate run-wide builds
            # executor-memory pressure that skews later timings
            # (measured ~5% total drift).
            fam = name.split("_", 1)[0]
            nxt = names[i + 1].split("_", 1)[0] if i + 1 < len(names) else None
            if fam != nxt:
                spark.catalog.clearCache()
        canary = min(canary, canary_time())
        frozen_canary = min(frozen_canary, frozen_canary_time())
        pass_totals.append(round(pass_wall, 3))
    timings = {name: round(sec, 3) for name, sec in sorted(best.items())}

    families: dict[str, float] = {}
    for name, sec in timings.items():
        fam = name.split("_", 1)[0]
        families[fam] = round(families.get(fam, 0.0) + sec, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "families": families,
        # host-speed constant + normalized total: divide any two rounds'
        # canary-normalized totals to compare CODE, not VM weather.
        "canary_sec": round(canary, 3),
        "value_canary_norm": round(total / canary, 2) if canary > 0 else None,
        # r12 ADDITIVE fields (VERDICT r11 #7): a frozen engine-
        # independent host probe (see frozen_canary_time), and per-pass
        # wall totals — pass_totals[0] - pass_totals[1] prices the
        # one-time artifact builds (materialized signature tables,
        # index builds) that min-of-2 excludes from per-query numbers.
        "canary_frozen_sec": round(frozen_canary, 3),
        "value_frozen_norm": (
            round(total / frozen_canary, 2) if frozen_canary > 0 else None
        ),
        "pass_totals_sec": pass_totals,
        "artifact_build_sec": (
            round(pass_totals[0] - pass_totals[1], 3)
            if len(pass_totals) == 2
            else None
        ),
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
        "canary_sec": payload["canary_sec"],
        "value_canary_norm": payload["value_canary_norm"],
        "canary_frozen_sec": payload["canary_frozen_sec"],
        "artifact_build_sec": payload["artifact_build_sec"],
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

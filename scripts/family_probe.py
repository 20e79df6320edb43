"""Dedicated family timing probe: min-of-2 per query, canary-normalized
in-process (the bench_diff normalization) — the reliable per-family
signal under co-tenant host drift (BASELINE.md documents canary swings
of 1.06->1.47 s within a day; family sums swing 50% between adjacent
full-bench runs with identical code, so round-over-round family targets
are confirmed HERE, not from one BENCH.json window).

Usage: python scripts/family_probe.py <family-prefix> [out_json]
       (e.g. `dedup` times every dedup_* query at sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_the_clojure_way_spark import get_spark  # noqa: E402
from kafka_streams_the_clojure_way_spark.queries import QUERIES  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CANARY = "agg_pricing_summary"


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    prefix = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("kstcw-family-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def min2(name: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _force(QUERIES[name](spark, SF))
            best = min(best, time.time() - t0)
        return best

    names = sorted(n for n in QUERIES if n.startswith(prefix))
    # warm pass: index/model/signature-table builds + codegen amortize
    # exactly like the steady state the family target describes
    for n in names:
        _force(QUERIES[n](spark, SF))
    canary = min2(CANARY)
    per = {n: round(min2(n), 3) for n in names}
    total = sum(per.values())
    out = {
        "metric": f"{prefix}_family_min_of_2",
        "sf": SF,
        "canary_sec": round(canary, 3),
        "total_sec": round(total, 3),
        "total_canary_norm": round(total / canary, 2),
        "queries": per,
    }
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()

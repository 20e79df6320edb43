"""Per-query bench budgets at sf0.01, canary-normalized (VERDICT r7 #7):
the CI twin of the round bench's regression gate. Every registered query
whose committed min-of-2 cost is >= 2 canaries (the set where a plan
regression is measurable above host noise) is re-timed min-of-2 here and
must stay within BUDGET_FACTOR x its committed normalized cost — so a
change like r7's verdict-oracle conversion (agg_approx_distinct_users
0.40 -> 2.38 s, a 5.9x plan regression) fails THIS test instead of
surfacing a round later in BENCH_r{N}.json.

Times are divided by the canary query's min time in the SAME process, so
VM weather cancels and the gate judges plans, not the host (the
bench.py/bench_diff.py normalization, applied in-process).

Refreshing budgets after an intentional change:
    python - <<'PY'
    # rerun the measurement loop in this file with RECORD=1 semantics —
    # or simply update the one changed entry in bench_budgets_sf001.json
    # to the new observed norm (the test prints observed norms on
    # failure). Budgets are min-of-2 normalized times at sf0.01.
    PY
Sub-2-canary queries are intentionally unbudgeted here: at sf0.01 their
wall time is codegen-dominated and a per-query gate would flake; their
regression gate is scripts/bench_diff.py over the committed BENCH.json
(2x + 0.5s absolute, canary-normalized), which runs per round at sf0.1.
"""

from __future__ import annotations

import json
import os
import time


SF = "/root/testdata/sf0.01"
BUDGETS = os.path.join(os.path.dirname(__file__), "bench_budgets_sf001.json")

#: headroom over the committed normalized min-of-2: generous enough for
#: scheduler jitter on a busy 32-thread host, far below the 4-6x of a
#: genuine plan regression (an extra shuffle/Expand/unbroadcast join).
BUDGET_FACTOR = 3.0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def test_heavy_queries_within_canary_normalized_budgets(spark):
    from kafka_streams_the_clojure_way_spark.queries import QUERIES

    with open(BUDGETS) as f:
        spec = json.load(f)
    budgets: dict[str, float] = spec["normalized_min_of_2"]
    missing = sorted(set(budgets) - set(QUERIES))
    assert not missing, f"budgeted queries no longer registered: {missing}"

    def canary() -> float:
        t0 = time.time()
        _force(QUERIES["agg_pricing_summary"](spark, SF))
        return time.time() - t0

    canary()  # warm codegen/session paths
    can = min(canary(), canary())
    names = sorted(budgets)
    best: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            t0 = time.time()
            _force(QUERIES[name](spark, SF))
            best[name] = min(best.get(name, float("inf")), time.time() - t0)
        spark.catalog.clearCache()
        can = min(can, canary())

    over = []
    for name in names:
        norm = best[name] / can
        if norm > BUDGET_FACTOR * budgets[name]:
            over.append(
                f"{name}: observed {norm:.2f} canaries > "
                f"{BUDGET_FACTOR} x budget {budgets[name]:.2f}"
            )
    assert not over, (
        "canary-normalized budget exceeded (canary="
        f"{can:.3f}s):\n" + "\n".join(over)
    )

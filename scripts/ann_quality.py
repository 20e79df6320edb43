"""ANN recall-vs-cost curve (the FAISS-style tuning table): at a given
sf_dir, measure recall@10 against exact brute-force ground truth and
wall-clock for

- IVF at n_probe in {1, 3, 8}  (fraction of cells probed), and
- multi-probe hyperplane LSH at n_flip in {0, 1, 2}  (probe masks
  1 / 9 / 37 — hamming radius around the query's sign bucket),

so the 100 TB operator ships with documented recall/cost guidance
instead of a single fixed operating point. The pytest recall gates
(tests/test_ann_recall.py) pin the DEFAULT points; this script maps the
curve around them.

Usage: python scripts/ann_quality.py [sf_dir] (default /root/testdata/sf0.1)
       python scripts/ann_quality.py --structured=N  (mixture-of-Gaussians
       corpus with planted neighbors, N rows — measures real retrieval
       quality instead of the isotropic-noise floor; see
       sources/synthetic.structured_embeddings)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_the_clojure_way_spark import get_spark  # noqa: E402
from kafka_streams_the_clojure_way_spark.operators import similarity as S  # noqa: E402
from kafka_streams_the_clojure_way_spark.sources.files import load_table  # noqa: E402

K = 10
QUERY_MOD = 50


def pairs(df) -> set[tuple[int, int]]:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "kstcw-ann-quality", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if arg.startswith("--structured"):
        from kafka_streams_the_clojure_way_spark.sources.synthetic import (
            structured_embeddings,
        )

        n = int(arg.split("=", 1)[1]) if "=" in arg else 4000
        sf_dir = f"structured:{n}"
        emb = structured_embeddings(spark, n).cache()
    else:
        sf_dir = arg
        emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)

    # exact ground truth (also the timing baseline)
    t0 = time.time()
    truth = pairs(S.brute_force_topk(emb, queries, k=K))
    brute_sec = time.time() - t0
    n_truth = len(truth)

    rows = []

    def measure(label: str, fn) -> None:
        best_sec, got = float("inf"), None
        for _ in range(2):  # min-of-2, same policy as bench.py
            t0 = time.time()
            got = pairs(fn())
            best_sec = min(best_sec, time.time() - t0)
        recall = len(got & truth) / n_truth
        rows.append(
            {"config": label, "recall@10": round(recall, 4), "sec": round(best_sec, 2)}
        )
        print(f"{label:24s} recall@10={recall:.4f} sec={best_sec:.2f}")

    for n_probe in (1, 3, 8):
        measure(
            f"ivf n_probe={n_probe}",
            lambda n=n_probe: S.ivf_topk(emb, queries, k=K, n_probe=n),
        )
    saved = S.N_FLIP
    try:
        for n_flip in (0, 1, 2):
            S.N_FLIP = n_flip
            n_masks = len(S._probe_masks())
            measure(
                f"lsh n_flip={n_flip} ({n_masks} probes)",
                lambda: S.lsh_topk(emb, queries, k=K),
            )
    finally:
        S.N_FLIP = saved

    out = {
        "sf_dir": sf_dir,
        "k": K,
        "n_queries": queries.count(),
        "corpus_rows": emb.count(),
        "brute_force_sec": round(brute_sec, 2),
        "rows": rows,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()

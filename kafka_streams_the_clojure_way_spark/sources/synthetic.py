"""Seeded synthetic data generators for quality gates.

The driver-shipped ``embeddings.parquet`` vectors are isotropic noise —
the WORST case for space-partitioning ANN (no neighbor structure to
exploit), so recall floors pinned on them are bounded low and say little
about the index. The mixture-of-Gaussians-on-the-sphere corpus here has
real cluster structure (planted nearest neighbors), so recall@10 on it
measures what the IVF/LSH tiers actually deliver on embedding-shaped
data; tests and scripts/ann_quality.py pin gates on BOTH corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def structured_embeddings(
    spark: SparkSession,
    n_rows: int,
    *,
    dim: int = 64,
    n_clusters: int = 32,
    cluster_spread: float = 0.1,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mixture of Gaussians on the unit sphere, fully deterministic:

    - ``n_clusters`` unit-norm centers drawn from ``seed``;
    - row i belongs to cluster ``i % n_clusters`` (every cluster equally
      populated) and is its center plus N(0, cluster_spread^2) noise,
      re-normalized to the sphere — noise drawn from a PER-ROW generator
      seeded by (seed, i), so the corpus is identical under any
      partitioning or row order.

    ``cluster_spread`` is PER-DIMENSION: expected noise norm is
    spread * sqrt(dim), so at dim=64 the default 0.1 gives |noise| ~ 0.8
    against unit centers — clearly clustered (intra-cluster cosine ~0.8
    vs ~0 across clusters) without being degenerate.

    Generated distributed via mapInPandas over ``spark.range`` (numpy
    per Arrow batch, no driver-side materialization) — the same corpus
    can be produced at any size on any cluster."""
    import numpy as np

    centers_rng = np.random.default_rng(seed)
    centers = centers_rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = np.empty((len(ids), dim))
            for j, i in enumerate(ids):
                rng = np.random.default_rng((seed << 32) + int(i))
                v = centers[int(i) % n_clusters] + cluster_spread * rng.standard_normal(dim)
                vecs[j] = v / np.linalg.norm(v)
            yield pd.DataFrame({id_col: ids, vec_col: list(vecs)})

    return (
        spark.range(n_rows)
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
        .mapInPandas(gen, schema=f"{id_col} long, {vec_col} array<double>")
    )

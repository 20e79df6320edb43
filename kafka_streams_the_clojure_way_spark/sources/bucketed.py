"""Bucketed tables — co-located joins without a shuffle (SURVEY.md §2.2
"Joins" scale path; the 100 TB bucketing story).

Writing a fact table bucketed (and sorted) by its join key pays ONE
shuffle at write time; every subsequent join or aggregation on that key
reads co-partitioned (and co-sorted) buckets and skips both the Exchange
and the Sort — the dominant cost of big-big joins. Rule of thumb: bucket
the tables you join repeatedly (fact-to-fact on order/user/entity keys);
bucket counts must MATCH across join sides (or be integer multiples with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

Bucketed data lives in the session catalog's warehouse directory
(``spark.sql.warehouse.dir``) because bucket metadata is catalog state —
path-based reads cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int,
    *,
    sort_by: str | list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. Sorting within buckets additionally removes the Sort from
    sort-merge joins on the bucket key."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *cols)
    )
    if sort_by is not None:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata intact — unlike a raw
    path read of the same files)."""
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")

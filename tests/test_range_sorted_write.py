"""write_range_sorted layout contract, verified from the parquet footers:
file-level min/max ranges on the cluster column are pairwise disjoint and
rows are sorted within files — the stats-skipping layout for hot
non-partition predicates."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from kafka_streams_the_clojure_way_spark.sources.files import (
    load_table,
    write_range_sorted,
)

SF = "/root/testdata/sf0.001"


def test_range_sorted_files_have_disjoint_stats(spark, tmp_path):
    path = str(tmp_path / "orders_by_price")
    write_range_sorted(load_table(spark, SF, "orders"), path, "o_totalprice", 8)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("o_totalprice")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 2  # actually split into several files
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # disjoint (boundary duplicates allowed)

    # sorted within each file
    for f in glob.glob(f"{path}/part-*.parquet"):
        vals = pq.read_table(f, columns=["o_totalprice"])["o_totalprice"].to_pylist()
        assert vals == sorted(vals)

    # nothing lost
    import pyspark.sql.functions as F  # noqa: F401

    assert spark.read.parquet(path).count() == load_table(spark, SF, "orders").count()

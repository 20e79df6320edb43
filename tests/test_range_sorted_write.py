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


def _file_boxes(path, col_a, col_b):
    """Per-file (min,max) bounding box of two columns, from footers."""
    boxes = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        ia = md.schema.names.index(col_a)
        ib = md.schema.names.index(col_b)
        a_lo = min(md.row_group(g).column(ia).statistics.min for g in range(md.num_row_groups))
        a_hi = max(md.row_group(g).column(ia).statistics.max for g in range(md.num_row_groups))
        b_lo = min(md.row_group(g).column(ib).statistics.min for g in range(md.num_row_groups))
        b_hi = max(md.row_group(g).column(ib).statistics.max for g in range(md.num_row_groups))
        boxes.append((a_lo, a_hi, b_lo, b_hi))
    return boxes


def _mean_box_area(boxes):
    a_span = max(b[1] for b in boxes) - min(b[0] for b in boxes) or 1
    b_span = max(b[3] for b in boxes) - min(b[2] for b in boxes) or 1
    return sum(
        ((hi - lo) / a_span) * ((bhi - blo) / b_span) for lo, hi, blo, bhi in boxes
    ) / len(boxes)


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout contract: every file's 2-D bounding box (from the
    parquet footers) must cover a small fraction of the value space —
    that fraction IS the expected scan fraction for a point predicate on
    either column, i.e. the file-skipping win. A round-robin layout's
    boxes each cover ~the whole space."""
    from kafka_streams_the_clojure_way_spark.sources.files import write_zorder

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "li_zorder")
    write_zorder(li, zpath, "l_partkey", "l_suppkey", 16)

    rpath = str(tmp_path / "li_roundrobin")
    li.repartition(16).write.parquet(rpath)

    z_area = _mean_box_area(_file_boxes(zpath, "l_partkey", "l_suppkey"))
    r_area = _mean_box_area(_file_boxes(rpath, "l_partkey", "l_suppkey"))
    # each Z file should cover a small slice of the (partkey, suppkey)
    # plane; round-robin files cover essentially all of it
    assert z_area < 0.25, f"z-order boxes too loose: {z_area:.3f}"
    assert r_area > 0.8, f"round-robin unexpectedly clustered: {r_area:.3f}"

    # no rows lost/duplicated by the rewrite
    assert spark.read.parquet(zpath).count() == li.count()

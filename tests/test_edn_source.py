"""EDN file format (Python DataSource): the reference's native serde
(jackdaw.serdes.edn, core.clj:24-26) as a first-class Spark format —
read, write round-trip, keyword↔column mapping, and the reference
pipeline running directly on EDN input."""

from __future__ import annotations

from pyspark.sql.types import LongType, StructField, StructType

from kafka_streams_the_clojure_way_spark import pipelines as P
from kafka_streams_the_clojure_way_spark.sources.edn import (
    infer_edn_schema,
    parse_edn,
    register,
)

PURCHASES_EDN = """\
{:purchase-id 1 :user-id 1 :amount 10 :quantity 1}
{:purchase-id 2 :user-id 2 :amount 500 :quantity 1}
{:purchase-id 3 :user-id 3 :amount 50 :quantity 2}
{:purchase-id 4 :user-id 4 :amount 1000 :quantity 9}
"""

SCHEMA = StructType(
    [
        StructField("purchase_id", LongType()),
        StructField("user_id", LongType()),
        StructField("amount", LongType()),
        StructField("quantity", LongType()),
    ]
)


def test_parse_edn_subset():
    v, _ = parse_edn('{:a 1 :b-c "x" :d [1 2.5 nil] :e true :f #{3}}')
    got = {str(k): val for k, val in v.items()}
    assert got == {"a": 1, "b-c": "x", "d": [1, 2.5, None], "e": True, "f": [3]}


def test_edn_read_and_reference_pipeline(spark, tmp_path):
    # ≙ core.clj:171-184 amounts 10/500/50/1000 -> exactly 2 survivors,
    # straight off EDN files with no conversion step.
    f = tmp_path / "purchases.edn"
    f.write_text(PURCHASES_EDN)
    register(spark)
    df = spark.read.format("edn").schema(SCHEMA).load(str(f))
    out = df.transform(P.large_purchases).orderBy("amount").collect()
    assert [(r.user_id, r.amount) for r in out] == [(2, 500), (4, 1000)]


def test_edn_write_round_trip(spark, tmp_path):
    f = tmp_path / "in.edn"
    f.write_text(PURCHASES_EDN)
    register(spark)
    df = spark.read.format("edn").schema(SCHEMA).load(str(f))
    out_dir = str(tmp_path / "out")
    df.write.format("edn").mode("append").save(out_dir)
    back = spark.read.format("edn").schema(SCHEMA).load(out_dir + "/*.edn")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_edn_schema_inference(tmp_path):
    f = tmp_path / "s.edn"
    f.write_text('{:user-id 7 :amount 1.5 :name "x" :ok true}\n')
    s = infer_edn_schema(str(f))
    got = {fld.name: type(fld.dataType).__name__ for fld in s.fields}
    assert got == {
        "user_id": "LongType",
        "amount": "DoubleType",
        "name": "StringType",
        "ok": "BooleanType",
    }


def test_edn_stream_reader(spark, tmp_path):
    """readStream.format('edn'): files arriving between availableNow runs
    are consumed exactly once, offsets checkpointed across restarts."""
    from kafka_streams_the_clojure_way_spark.sources.memory import drain

    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    register(spark)

    def run_once():
        stream = (
            spark.readStream.format("edn").schema(SCHEMA).load(str(in_dir / "*.edn"))
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain(q)

    (in_dir / "a.edn").write_text("{:purchase-id 1 :user-id 1 :amount 10 :quantity 1}\n")
    run_once()
    (in_dir / "b.edn").write_text(
        "{:purchase-id 2 :user-id 2 :amount 500 :quantity 1}\n"
    )
    run_once()

    got = sorted(
        (r.purchase_id, r.amount) for r in spark.read.parquet(out_dir).collect()
    )
    # each record exactly once despite a.edn existing during both runs
    assert got == [(1, 10), (2, 500)]


def test_edn_permissive_mode_drops_malformed_lines(spark, tmp_path):
    f = tmp_path / "dirty.edn"
    f.write_text(
        "{:purchase-id 1 :user-id 1 :amount 10 :quantity 1}\n"
        "{:purchase-id 2 :user-id 2 :amount 500\n"  # torn line
        "[1 2 3]\n"  # not a map
        "{:purchase-id 3 :user-id 3 :amount 50 :quantity 2}\n"
    )
    register(spark)
    ok = (
        spark.read.format("edn")
        .schema(SCHEMA)
        .option("mode", "permissive")
        .load(str(f))
    )
    assert sorted(r.purchase_id for r in ok.collect()) == [1, 3]

    import pytest

    strict = spark.read.format("edn").schema(SCHEMA).load(str(f))
    with pytest.raises(Exception):
        strict.collect()


def test_edn_to_topology_to_edn_round_trip(spark, tmp_path):
    """The reference's whole story on its native format: EDN records in,
    declarative topology (filter >= 100, project), EDN records out —
    no Kafka, no JSON, no conversion step anywhere."""
    from kafka_streams_the_clojure_way_spark.plans import compile_topology

    f = tmp_path / "in.edn"
    f.write_text(PURCHASES_EDN)
    register(spark)
    df = spark.read.format("edn").schema(SCHEMA).load(str(f))
    topo = {
        "entities": {
            "topic/in": {"type": "topic"},
            "stream/large": {
                "type": "stream",
                "sql": "SELECT user_id, amount FROM __input__ WHERE amount >= 100",
            },
            "topic/out": {"type": "topic"},
        },
        "workflow": [["topic/in", "stream/large"], ["stream/large", "topic/out"]],
    }
    out = compile_topology(spark, topo, {"topic/in": df})["topic/out"]
    out_dir = str(tmp_path / "out_edn")
    out.write.format("edn").mode("append").save(out_dir)

    lines = []
    import glob as g

    for part in sorted(g.glob(f"{out_dir}/*.edn")):
        lines += [ln for ln in open(part).read().splitlines() if ln.strip()]
    recs = sorted(
        ({str(k): v for k, v in parse_edn(ln)[0].items()} for ln in lines),
        key=lambda d: d["amount"],
    )
    assert recs == [
        {"user-id": 2, "amount": 500},
        {"user-id": 4, "amount": 1000},
    ]


def test_edn_write_overwrite_clears_previous_parts(spark, tmp_path):
    """The advisor's round-1 scenario: overwrite into a dir holding a
    LARGER previous write must not leave stale part files mixed in, and
    two appends must not clobber each other (unique per-write names)."""
    out = str(tmp_path / "edn_out")
    big = spark.createDataFrame([{"v": i} for i in range(10)]).repartition(4)
    big.write.format("edn").mode("append").save(out)
    small = spark.createDataFrame([{"v": 99}]).repartition(1)
    small.write.format("edn").mode("overwrite").save(out)
    back = spark.read.format("edn").schema("v long").load(f"{out}/*.edn")
    assert [r.v for r in back.collect()] == [99]

    # append after overwrite: both writes survive side by side
    small2 = spark.createDataFrame([{"v": 100}]).repartition(1)
    small2.write.format("edn").mode("append").save(out)
    back2 = spark.read.format("edn").schema("v long").load(f"{out}/*.edn")
    assert sorted(r.v for r in back2.collect()) == [99, 100]

    # no temp dirs or attempt files left behind
    import os
    leftovers = [f for f in os.listdir(out) if not f.endswith(".edn")]
    assert leftovers == []


def test_edn_permissive_corrupt_record_column(spark, tmp_path):
    """Spark's corrupt-record convention on the EDN source: with a
    _corrupt_record column declared, permissive mode lands unparseable
    lines there (data columns null) for exact loss accounting; without
    it they are dropped; failfast raises."""
    import pytest

    f = tmp_path / "mixed.edn"
    f.write_text(
        '{:v 1}\n'
        '{:v 2 UNCLOSED\n'
        '[:not-a-map 3]\n'
        '{:v 4}\n'
    )
    with_corrupt = (
        spark.read.format("edn")
        .schema("v long, _corrupt_record string")
        .option("mode", "permissive")
        .load(str(f))
        .collect()
    )
    good = sorted(r.v for r in with_corrupt if r.v is not None)
    bad = [r._corrupt_record for r in with_corrupt if r.v is None]
    assert good == [1, 4]
    assert len(bad) == 2 and "UNCLOSED" in bad[0]

    dropped = (
        spark.read.format("edn")
        .schema("v long")
        .option("mode", "permissive")
        .load(str(f))
        .collect()
    )
    assert sorted(r.v for r in dropped) == [1, 4]

    with pytest.raises(Exception):
        spark.read.format("edn").schema("v long").load(str(f)).collect()

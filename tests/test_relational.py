"""Unit tests for relational operator helpers (as-of join, top-k)."""

from __future__ import annotations

from kafka_streams_the_clojure_way_spark.operators.relational import (
    asof_join,
    top_k_per_key,
)

from pyspark.sql import functions as F


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            {"k": "a", "t": 10, "tag": "l1"},
            {"k": "a", "t": 25, "tag": "l2"},
            {"k": "b", "t": 5, "tag": "l3"},
        ]
    )
    right = spark.createDataFrame(
        [
            {"k": "a", "t": 10, "price": 1.0},
            {"k": "a", "t": 20, "price": 2.0},
            {"k": "b", "t": 50, "price": 9.0},
        ]
    )
    out = {
        r.tag: r.price
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", right_values=["price"]
        ).collect()
    }
    # non-strict: right row at the same timestamp matches (t=10).
    assert out == {"l1": 1.0, "l2": 2.0, "l3": None}


def test_asof_join_strict_excludes_simultaneous(spark):
    left = spark.createDataFrame([{"k": "a", "t": 10, "tag": "l1"}])
    right = spark.createDataFrame(
        [{"k": "a", "t": 10, "price": 1.0}, {"k": "a", "t": 3, "price": 0.5}]
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        right_values=["price"], strict=True,
    ).collect()
    assert out[0].price == 0.5


def test_top_k_per_key_deterministic_with_ties(spark):
    rows = [
        {"k": "a", "v": 3, "id": 1},
        {"k": "a", "v": 3, "id": 2},
        {"k": "a", "v": 1, "id": 3},
    ]
    df = spark.createDataFrame(rows)
    out = top_k_per_key(
        df, keys=["k"], order_by=[F.col("v").desc(), F.col("id")], k=2
    ).collect()
    assert sorted((r.id, r.rn) for r in out) == [(1, 1), (2, 2)]


def test_dataset_diff_statuses(spark):
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        dataset_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1), (4, None, 1)],
        "k int, v string, extra int",
    )
    new = spark.createDataFrame(
        [(2, "b", 9), (3, "c2", 1), (4, None, 1), (5, "e", 1)],
        "k int, v string, extra int",
    )
    # compare only v: 'extra' drift must not count as a change
    got = {r.k: r.status for r in dataset_diff(old, new, ["k"], compare_cols=["v"]).collect()}
    assert got == {1: "removed", 3: "changed", 5: "added"}
    # null-safe equality: (4, None) == (4, None) -> unchanged, excluded
    full = {
        r.k: r.status
        for r in dataset_diff(
            old, new, ["k"], compare_cols=["v"], include_unchanged=True
        ).collect()
    }
    assert full[4] == "unchanged" and full[2] == "unchanged"


def test_dataset_fingerprint_detects_and_locates_divergence(spark):
    """Equal content (in any row order / partitioning) fingerprints
    equal; a single changed value flips exactly the affected group's
    fingerprint while counts stay equal."""
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        dataset_fingerprint,
    )

    rows = [(i, f"v{i}", "g%d" % (i % 3)) for i in range(30)]
    a = spark.createDataFrame(rows, "id long, val string, grp string")
    b = spark.createDataFrame(
        list(reversed(rows)), "id long, val string, grp string"
    ).repartition(7)

    fa = {r.grp: (r.n_rows, r.fingerprint) for r in
          dataset_fingerprint(a, ["id", "val"], group_by=["grp"]).collect()}
    fb = {r.grp: (r.n_rows, r.fingerprint) for r in
          dataset_fingerprint(b, ["id", "val"], group_by=["grp"]).collect()}
    assert fa == fb and len(fa) == 3

    tampered = [(i, "v999" if i == 7 else f"v{i}", "g%d" % (i % 3)) for i in range(30)]
    c = spark.createDataFrame(tampered, "id long, val string, grp string")
    fc = {r.grp: (r.n_rows, r.fingerprint) for r in
          dataset_fingerprint(c, ["id", "val"], group_by=["grp"]).collect()}
    diverged = {g for g in fa if fa[g] != fc[g]}
    assert diverged == {"g1"}  # 7 % 3 == 1 — the divergence is LOCATED
    assert all(fa[g][0] == fc[g][0] for g in fa)  # counts alone miss it


def test_dataset_fingerprint_null_vs_empty_distinct(spark):
    """NULL and '' must fingerprint differently (the sentinel encoding)."""
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        dataset_fingerprint,
    )

    a = spark.createDataFrame([(1, None)], "id long, val string")
    b = spark.createDataFrame([(1, "")], "id long, val string")
    fa = dataset_fingerprint(a, ["id", "val"]).collect()[0]
    fb = dataset_fingerprint(b, ["id", "val"]).collect()[0]
    assert fa.fingerprint != fb.fingerprint


def test_asof_join_forward(spark):
    """Forward as-of: nearest following right row; equality counts
    unless strict; no following row -> NULL."""
    from kafka_streams_the_clojure_way_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 11), (3, 2, 1)], "id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 5, 50), (1, 10, 100), (2, 0, 7)], "k long, ts long, v long"
    )
    got = {
        r.id: r.v
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_values=["v"], direction="forward",
        ).collect()
    }
    assert got == {1: 50, 2: None, 3: None}

    strict = {
        r.id: r.v
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_values=["v"], direction="forward", strict=True,
        ).collect()
    }
    assert strict == {1: 100, 2: None, 3: None}  # ts==5 excluded -> next is 10


def test_asof_forward_backward_duality(spark):
    """forward(ts) must equal backward(-ts) on any input — the mirror
    identity that pins both directions to one semantics. Seeded random
    frames with ties and unmatched keys."""
    import random

    from kafka_streams_the_clojure_way_spark.operators.relational import asof_join

    rng = random.Random(42)
    left = [(i, rng.randrange(5), rng.randrange(50)) for i in range(120)]
    # unique (k, ts) on the right: tied right rows are pick-nondeterministic
    # by as-of semantics, which would make the mirror comparison flaky
    seen = {(rng.randrange(6), rng.randrange(50)) for _ in range(80)}
    right = [(k, ts, 100 + i) for i, (k, ts) in enumerate(sorted(seen))]
    l = spark.createDataFrame(left, "id long, k long, ts long")
    r = spark.createDataFrame(right, "k long, ts long, v long")
    l_neg = l.withColumn("ts", -F.col("ts"))
    r_neg = r.withColumn("ts", -F.col("ts"))

    for strict in (False, True):
        fwd = {
            row.id: row.v
            for row in asof_join(
                l, r, on="k", left_ts="ts", right_ts="ts",
                right_values=["v"], direction="forward", strict=strict,
            ).collect()
        }
        bwd_mirror = {
            row.id: row.v
            for row in asof_join(
                l_neg, r_neg, on="k", left_ts="ts", right_ts="ts",
                right_values=["v"], direction="backward", strict=strict,
            ).collect()
        }
        assert fwd == bwd_mirror and len(fwd) == 120


def test_asof_nearest_tie_breaks_backward(spark):
    """asof_join_nearest on an EXACT equidistant fixture: the left row
    sits precisely between two right rows, so only the documented tie
    rule (backward wins) decides — flipping the <= to < in back_wins
    fails this test. Also covers the one-sided and no-match cases."""
    import datetime as dt

    from kafka_streams_the_clojure_way_spark.operators.relational import (
        asof_join_nearest,
    )

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, sec)

    left = spark.createDataFrame(
        [
            {"k": 1, "lid": 0, "t": ts(10)},   # equidistant: right at 5 and 15
            {"k": 2, "lid": 1, "t": ts(10)},   # only a later right row
            {"k": 3, "lid": 2, "t": ts(10)},   # no right rows at all
        ]
    )
    right = spark.createDataFrame(
        [
            {"k": 1, "t": ts(5), "val": "early"},
            {"k": 1, "t": ts(15), "val": "late"},
            {"k": 2, "t": ts(40), "val": "after"},
        ]
    )
    out = {
        r.lid: (r.val, r.matched_direction)
        for r in asof_join_nearest(
            left, right, on="k", left_key="lid", left_ts="t", right_ts="t",
            right_values=["val"],
        ).collect()
    }
    assert out[0] == ("early", "backward")   # exact tie -> backward
    assert out[1] == ("after", "forward")
    assert out[2] == (None, None)


def test_asof_join_deterministic_on_duplicate_right_ts(spark):
    """Several right rows at the same (key, ts): the carried value must
    be the same on every run (xxhash64 tiebreaker), regardless of
    partition layout."""
    left = spark.createDataFrame([{"k": "a", "t": 10, "tag": "l1"}])
    right_rows = [{"k": "a", "t": 5, "price": float(p)} for p in range(7)]
    outs = set()
    for n_parts in (1, 3, 7):
        right = spark.createDataFrame(right_rows).repartition(n_parts)
        out = asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            right_values=["price"],
        ).collect()
        outs.add(out[0].price)
    assert len(outs) == 1, f"carried value varies with partitioning: {outs}"

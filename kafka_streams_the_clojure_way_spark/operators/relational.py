"""Relational operator helpers beyond plain ``df.join``/``groupBy``
(SURVEY.md §2.2: joins absent from the reference, provided as the superset
surface).

Design notes for scale:

- ``asof_join`` avoids the naive approach (range join + per-key argmax,
  which explodes to |L|x|R| per key before pruning). Instead it unions the
  two sides, sorts once per key (ONE shuffle on the key), and carries the
  most recent right-side values forward with a running window — O(n log n)
  per key, no intermediate blowup, AQE-friendly.
- ``top_k_per_key`` uses row_number over a per-key window — Spark pushes a
  partial top-k (WindowGroupLimit) below the shuffle since 3.5, so only k
  rows per key per mapper cross the wire.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the most recent right row for
    the same key with ``right_ts <= left_ts`` (``<`` when ``strict``) —
    or, with ``direction="forward"``, the EARLIEST right row with
    ``right_ts >= left_ts`` (``>`` when ``strict``), pandas
    ``merge_asof(direction=...)`` semantics.

    Matches DuckDB's ``ASOF JOIN`` (inequality ``>=``) semantics for the
    non-strict backward default, so results are oracle-checkable. Left
    rows with no matching right row keep NULL right values (left-outer
    as-of).

    Implementation: tag both sides, union, and compute
    ``last(right_value, ignorenulls=True)`` over a per-key window ordered
    by (ts, side) — right rows sort before simultaneous left rows unless
    ``strict``, in which case they sort after. ``forward`` is the same
    single-shuffle carry with the window ordered by ts DESCENDING, so the
    value carried to a left row is the nearest following right row —
    still one union + one running window, never a range-join blowup.

    Determinism: when several right rows share the same (key, right_ts),
    the window order alone (ts, side) would leave WHICH one is carried to
    partition luck — so a third sort key, the xxhash64 of the right row's
    (ts, values), breaks ties identically on every run (the max-hash row
    wins). Note SQL engines leave this unspecified (DuckDB's ASOF JOIN
    picks an arbitrary duplicate), so cross-ENGINE parity still requires
    unique (key, right_ts) on the right; cross-RUN parity does not.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    # side marker: right rows must be visible to left rows at the same
    # timestamp iff non-strict.
    right_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0 if not strict else 2).alias("__side"),
        F.xxhash64(F.col(right_ts), *[F.col(c) for c in right_values]).alias(
            "__tie"
        ),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    )
    left_cols = [c for c in left.columns if c not in keys and c != left_ts]
    left_tagged = (
        left.select(
            *keys,
            F.col(left_ts).alias("__ts"),
            F.lit(1).alias("__side"),
            F.lit(0).cast("long").alias("__tie"),
            *[F.col(c) for c in left_cols],
        ).withColumns({f"__r_{c}": F.lit(None) for c in right_values})
    )

    unioned = right_tagged.unionByName(left_tagged, allowMissingColumns=True)
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumns(
        {f"__r_{c}": F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w) for c in right_values}
    )
    out = carried.filter(F.col("__side") == 1)
    return out.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols],
        *[F.col(f"__r_{c}").alias(c) for c in right_values],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: the (big, skewed) left side gets a salt
    from a row hash; the (smaller) right side replicates ``n_salt``x so
    every (key, salt) pair still matches. One hot key now lands on
    ``n_salt`` reducers instead of one.

    Cost model: right side inflates n_salt-fold — use when the right is
    too big to broadcast but small enough to replicate, and AQE's runtime
    skew-join splitting (our default: on) hasn't already solved it (AQE
    splits skewed SHUFFLE partitions but can't help a skewed key that
    exceeds a single partition's limits, e.g. with subsequent stateful
    processing pinned per key)."""
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str],
    *,
    n_salt: int = 16,
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase salted aggregation for SKEWED group keys: phase 1 groups
    by (keys, salt) so one hot key spreads over ``n_salt`` reducers;
    phase 2 merges the partials per key. Algebraic aggs only (sum/count
    here — min/max/avg-as-sum+count follow the same shape).

    When to use: Spark's map-side partial aggregation already absorbs
    low-cardinality skew for algebraic aggs; salting earns its extra
    shuffle when partials DON'T collapse — high-cardinality-per-key
    state (collect_set, distinct counts) or extreme single-key skew where
    even the merged partials overload one reducer. AQE splits skewed
    JOIN partitions but not aggregation keys — salting is the agg-side
    tool. The salt derives from a hash of the whole row (via
    ``F.rand``-free ``xxhash64(*columns)``) so it is deterministic for a
    given input."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__pn"),
            *[F.sum(c).alias(f"__ps_{c}") for c in sums],
        )
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__pn").alias(count_alias),
        *[F.sum(f"__ps_{c}").alias(f"sum_{c}") for c in sums],
    )


def fixed_point_sums(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, tuple],
    *,
    count_alias: str | None = None,
) -> DataFrame:
    """Exact money/quantity sums via fixed-point longs with a decimal
    merge — the fast path for ``SUM(CAST(x AS DECIMAL))``.

    ``sums`` maps output alias -> (column expr, decimal scale). Each row
    converts to integer units (``round(x * 10^scale) AS LONG``) — exact
    for values that are true fixed-point quantities stored as doubles
    (prices, quantities, rates) — and partial-sums stay in LONG, inside
    whole-stage codegen. Per-row BigDecimal adds (what ``SUM(DECIMAL)``
    compiles to once the sum type exceeds Spark's 18-digit long-backed
    representation) are ~5x slower — measured 1.67s vs 0.84s end-to-end
    on the TPC-H Q1 aggregate at sf0.1.

    Overflow discipline at 100 TB: a single task's long partial cannot
    overflow (10^11 units/row x 10^7 rows/task < 2^63) but a whole
    group's sum can, so phase 1 groups by ``(keys, partition_id)`` —
    partials collapse map-side, the shuffle carries one row per (group,
    partition) — and phase 2 merges those partials as DECIMAL(38,0),
    paying BigDecimal cost only per partial, not per row. Output columns
    are DOUBLE (units / 10^scale), bit-identical to
    ``CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE)`` because both
    compute the same exact integer-unit total before the single final
    rounding to double.
    """
    unit_cols = {
        alias: F.round(
            (F.col(expr) if isinstance(expr, str) else expr) * F.lit(10**scale)
        ).cast("long")
        for alias, (expr, scale) in sums.items()
    }
    phase1 = df.groupBy(*keys, F.spark_partition_id().alias("__pid")).agg(
        F.count(F.lit(1)).alias("__pn"),
        *[F.sum(u).alias(f"__u_{a}") for a, u in unit_cols.items()],
    )
    merged = [
        (F.sum(F.col(f"__u_{a}").cast("decimal(38,0)")) / F.lit(10**scale))
        .cast("double")
        .alias(a)
        for a, (_, scale) in sums.items()
    ]
    if count_alias:
        merged.append(F.sum("__pn").alias(count_alias))
    return phase1.groupBy(*keys).agg(*merged)


def top_k_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    *,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per key. Callers must make ``order_by`` a total order
    (include a unique tiebreaker) for deterministic results."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Snapshot diff between two dataset versions: one row per key with
    status ``added`` / ``removed`` / ``changed`` (``unchanged`` included
    only on request) — the audit step between corpus revisions (what did
    the new crawl/filter change?) and the input to incremental
    reprocessing (recompute only ``added``+``changed``).

    Comparison is null-safe equality (``<=>``) over ``compare_cols``
    (default: all shared non-key columns). Plan shape: one full-outer
    shuffle join on the keys — no column-hash precomputation needed, the
    comparison runs inside the join's projection; at 100 TB co-partition
    or bucket both snapshots on the key to make it a zero-exchange
    sort-merge.

    Sides are disambiguated by RENAMING columns (``__o_``/``__n_``
    prefixes), not ``Dataset.alias``: the common call derives both
    snapshots from the SAME scan (table vs transformed table), where
    attribute-id collisions make alias-qualified references ambiguous."""
    shared = [c for c in old.columns if c in set(new.columns)]
    compare = compare_cols or [c for c in shared if c not in set(key_cols)]
    cols = list(key_cols) + list(compare)
    o = old.select([F.col(c).alias(f"__o_{c}") for c in cols])
    n = new.select([F.col(c).alias(f"__n_{c}") for c in cols])
    cond = [
        F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}")) for k in key_cols
    ]
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col(f"__o_{key_cols[0]}").isNull(), F.lit("added"))
        .when(F.col(f"__n_{key_cols[0]}").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__o_{k}"), F.col(f"__n_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def dataset_fingerprint(
    df: DataFrame,
    cols: list[str],
    group_by: list[str] | None = None,
) -> DataFrame:
    """Order-insensitive, engine-portable dataset checksum: per row, the
    portable 60-bit md5 hash of the unit-separator-joined string encoding
    of ``cols``; per group, the EXACT decimal sum of row hashes plus the
    row count. Two datasets (or two engines, or two sides of a 100 TB
    migration) hold identical content iff counts and fingerprints match
    per group.

    Scale shape: a pure scan-side map + partial aggregation — the sum
    combines map-side, so the shuffle carries one (count, decimal) pair
    per group per mapper no matter how many rows. ``group_by`` picks the
    blast-radius granularity: no groups = one global row; a partition
    key = per-partition fingerprints that LOCATE a divergence instead of
    just detecting it.

    Portability contract: ``cols`` must be types with identical string
    casts across engines (ints, strings, dates — NOT doubles, whose
    formatting differs). NULL encodes as a sentinel distinct from any
    value. The sum accumulates in DECIMAL(38,0) — exact to ~10^38
    (2^60-ish hashes x 10^18 rows), so there is no overflow cliff — but
    the OUTPUT column is the decimal's digit string: DECIMAL(p>18)
    round-trips losslessly through Spark's pandas bridge but collapses to
    lossy float64 through DuckDB's, so a stable cross-engine checksum
    must leave the engine as text (round-2 driver red; same class as the
    round-1 HUGEINT bug one precision tier down)."""
    from kafka_streams_the_clojure_way_spark.functions import portable as P

    row_str = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
    )
    h = P.hash60(row_str).cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("decimal(38,0)").cast("string").alias("fingerprint"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def dataset_fingerprint_sql(
    cols: list[str],
    table: str,
    group_by: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`dataset_fingerprint` (same aliases)."""
    from kafka_streams_the_clojure_way_spark.functions import portable as P

    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in cols
    )
    row = f"concat_ws(chr(31), {parts})"
    h = P.hash60_sql(row)
    sel = (
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(CAST(SUM(CAST({h} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)"
        " AS fingerprint"
    )
    if group_by:
        g = ", ".join(group_by)
        return f"SELECT {g}, {sel} FROM {table} GROUP BY {g}"
    return f"SELECT {sel} FROM {table}"


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction='nearest')``,
    ties resolved BACKWARD): each left row takes the right row closest in
    time, before or after. Composed from the backward and forward
    single-shuffle carries of :func:`asof_join` — each also carries the
    matched right timestamp — joined back on the unique ``left_key`` and
    resolved by a per-row distance compare. Two windows total on the
    same key partitioning; never a range-join blowup.

    Output: left columns + ``right_values`` + ``matched_direction``
    ('backward' | 'forward' | NULL when no right row exists either way).
    """
    rts = "__rts_us"
    right_aug = right.withColumn(rts, F.unix_micros(F.col(right_ts)))
    kw = dict(
        on=on, left_ts=left_ts, right_ts=right_ts,
        right_values=[*right_values, rts],
    )
    back = asof_join(left, right_aug, direction="backward", **kw)
    fwd = asof_join(left, right_aug, direction="forward", **kw)
    bsel = back.select(
        *back.columns[: len(back.columns) - len(right_values) - 1],
        *[F.col(c).alias(f"__b_{c}") for c in right_values],
        F.col(rts).alias("__bts"),
    )
    fsel = fwd.select(
        left_key,
        *[F.col(c).alias(f"__f_{c}") for c in right_values],
        F.col(rts).alias("__fts"),
    )
    j = bsel.join(fsel, left_key)
    t = F.unix_micros(F.col(left_ts))
    back_wins = (t - F.col("__bts")) <= (F.col("__fts") - t)  # tie -> backward
    picked = [
        F.when(F.col("__fts").isNull(), F.col(f"__b_{c}"))
        .when(F.col("__bts").isNull(), F.col(f"__f_{c}"))
        .when(back_wins, F.col(f"__b_{c}"))
        .otherwise(F.col(f"__f_{c}"))
        .alias(c)
        for c in right_values
    ]
    direction = (
        F.when(F.col("__fts").isNull() & F.col("__bts").isNull(), F.lit(None).cast("string"))
        .when(F.col("__fts").isNull(), F.lit("backward"))
        .when(F.col("__bts").isNull(), F.lit("forward"))
        .when(back_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("matched_direction")
    )
    keep = [c for c in j.columns if not c.startswith("__")]
    return j.select(*keep, *picked, direction)

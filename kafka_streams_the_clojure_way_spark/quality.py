"""One-pass data-quality validation (deequ-lite).

``validate`` evaluates every constraint as an accumulator-style observed
metric INSIDE a single pass over the frame — the only affordable shape at
100 TB, where "run one COUNT per rule" multiplies full scans by the rule
count. Constraints are plain Column predicates (row-level); the result
reports rows seen and violations per rule.

The streaming twin is ``streaming.runner.with_observability`` (same
``observe`` machinery surfaced per micro-batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class QualityError(ValueError):
    """Raised by ``enforce`` when any constraint has violations."""


def validate(df: DataFrame, checks: dict[str, Column]) -> dict[str, int]:
    """Count violations of each named row-level constraint in ONE pass.

    Returns ``{"__rows": n, <check>: n_violations, ...}``. The pass is a
    noop write (full computation, nothing collected to the driver beyond
    the per-check counters)."""
    obs = Observation("dq")
    metrics = [F.count(F.lit(1)).alias("__rows")] + [
        F.count_if(~predicate).alias(name) for name, predicate in checks.items()
    ]
    df.observe(obs, *metrics).write.format("noop").mode("overwrite").save()
    return dict(obs.get)


def constraint_audit(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """The DataFrame form of :func:`validate`: one pass computing every
    rule's violation count, unpivoted to ``(rule, violations,
    rows_checked)`` rows — the shape a DQ dashboard or a registered
    audit query consumes. Same single-scan guarantee: all counters are
    measures of ONE aggregate; stack() reshapes the 1-row result without
    touching the data again."""
    names = list(checks)
    agg = df.agg(
        F.count(F.lit(1)).alias("__rows"),
        *[F.count_if(~checks[name]).alias(name) for name in names],
    )
    stack_args = ", ".join(f"'{name}', `{name}`" for name in names)
    return agg.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (rule, violations)",
        "__rows AS rows_checked",
    ).select("rule", F.col("violations").cast("long").alias("violations"), F.col("rows_checked").cast("long").alias("rows_checked"))


def enforce(df: DataFrame, checks: dict[str, Column]) -> dict[str, int]:
    """``validate`` + raise ``QualityError`` listing every failed rule."""
    result = validate(df, checks)
    failed = {k: v for k, v in result.items() if k != "__rows" and v > 0}
    if failed:
        raise QualityError(f"data-quality violations: {failed}")
    return result

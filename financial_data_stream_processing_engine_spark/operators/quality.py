"""Data-quality expectations: declarative validation over a table,
evaluated in ONE aggregation pass.

The pattern (Deequ/Great-Expectations style, reduced to its Spark
core): each check is a row-level violation predicate; the whole check
suite folds into a single ``agg`` of conditional counts (plus exact
distinct counts for uniqueness), so validating N checks over 100 TB
costs one scan + one tiny shuffle regardless of N.  Output is one row
per check — (check, n_violations, passed) — the shape a pipeline gate
consumes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    """A named row-level violation predicate (True = row violates)."""

    name: str
    violation: Column


def expectations(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[str] | None = None,
) -> DataFrame:
    """Evaluate all checks in one pass → (check, n_violations, passed).

    ``unique_keys``: column names that must be unique AND non-null;
    each adds a ``<col>_unique`` check whose violation count is
    ``count(*) - count(distinct col)`` plus the null count (distinct
    ignores NULLs, so NULL keys are counted as violations explicitly).
    """
    unique_keys = unique_keys or []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in checks:
        aggs.append(F.count(F.when(c.violation, F.lit(1))).alias(f"__v_{c.name}"))
    for k in unique_keys:
        aggs.append(F.count_distinct(F.col(k)).alias(f"__d_{k}"))
        aggs.append(F.count(F.when(F.col(k).isNull(), F.lit(1))).alias(f"__nn_{k}"))
    row = df.agg(*aggs)

    pairs = []
    for c in checks:
        pairs.append((c.name, F.col(f"__v_{c.name}")))
    for k in unique_keys:
        # non-null rows minus distinct values = duplicated rows
        dup = (F.col("__n") - F.col(f"__nn_{k}")) - F.col(f"__d_{k}")
        pairs.append((f"{k}_unique", dup + F.col(f"__nn_{k}")))

    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                v.cast("bigint").alias("n_violations"),
            )
            for name, v in pairs
        ]
    )
    return (
        row.select(F.explode(entries).alias("e"))
        .select("e.check", "e.n_violations")
        .withColumn("passed", F.col("n_violations") == 0)
    )

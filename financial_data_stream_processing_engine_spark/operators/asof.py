"""As-of and range joins — financial-native operators Spark lacks.

The reference has no joins at all (SURVEY.md §2.2), but an engine for
financial tick data needs the as-of join (trade ⟵ latest quote at or
before trade time).  Implemented as a composition of built-in ops —
union-tag + last-ignorenulls window (SURVEY.md §7 hard part #3) — NOT
``applyInPandas``:

* one shuffle on (by-key), no Python in the plan, whole-stage codegen;
* state bounded by the window frame (running ``last``), no per-group
  materialization — at 100 TB the union-window plan scales like any
  keyed window, whereas a grouped-pandas merge_asof would materialize
  each key group in one executor's Python heap.

Skew note: a hot ``by`` key concentrates one partition; AQE skew
handling does not split window partitions, so extremely hot keys
should be pre-bucketed by a coarse time bucket (bucket boundaries
carry the last right-row of the previous bucket).  Not needed at the
driver scales; documented for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (``<`` if ``strict``) within the same ``by`` key.

    Backward as-of join (pandas ``merge_asof`` semantics).  Left rows
    with no prior right row keep NULLs.

    Plan shape: tag both inputs, union by name, ONE window
    ``partitionBy(by).orderBy(on, side)`` carrying the latest right
    ROW forward as a struct with ``last(ignorenulls=True)``, then
    filter back to left rows and unpack.

    The struct is the semantic point, not just a micro-optimization:
    per-column ``last(ignorenulls=True)`` would SEE THROUGH a right
    row whose value is NULL and stitch together fields from different
    right rows (bid from t=1, ask from t=2) — merge_asof attaches the
    latest right row AS-IS, NULL fields included.  The struct is
    non-null exactly for right rows, so the fill picks whole rows.
    """
    from pyspark.sql import types as T

    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]

    row_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    lcols = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(row_type).alias("__r_row"),
    )
    # Right side rebuilt with left's column set for unionByName.
    r_select: list[Column] = []
    for c in left.columns:
        if c == on or c == by:
            r_select.append(F.col(c))
        else:
            r_select.append(F.lit(None).cast(left.schema[c].dataType).alias(c))
    r_select.append(F.lit(0).alias("__side"))
    r_select.append(
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r_row")
    )
    r_tagged = right.select(*r_select)

    unioned = l_tagged.unionByName(r_tagged)

    # Right rows sort before left rows at the same `on` value unless
    # strict, in which case they sort after (so equal-ts right rows are
    # not visible to equal-ts left rows).
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__r_row", F.last(F.col("__r_row"), ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}" if c in left.columns else c, F.col("__r_row")[c]
        )
    return out.drop("__r_row")

"""Scale-pattern operators: skew salting, deterministic sampling.

These exist because at 100 TB the *pattern* is the operator:

* ``salted_agg`` — two-phase aggregation for skewed keys.  A hot key
  that would pin one reducer is split across ``salt`` sub-keys
  (partial agg), then the partials merge in a second, tiny shuffle.
  Results are identical to the direct groupBy (the catalog proves it
  against the same oracle) — only the physical distribution changes.

* ``hash_sample`` — deterministic, engine-portable sampling.  `md5`
  of the key is uniform; keeping rows whose first hex nibble falls in
  a prefix set yields an exact, reproducible p = k/16 sample — unlike
  ``df.sample()``, the same rows are selected on every run, every
  engine, every partitioning (so a sampled pipeline is debuggable and
  its oracle is expressible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    salt: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: list of (function, column, alias) with function in
    {count, sum_decimal, min, max}.  sum_decimal applies the engine's
    exact-decimal accumulation, so the two-phase result is bit-equal
    to the one-phase result (double partials would not be).  For
    ``count``, ``column=None`` means COUNT(*); a named column gets
    COUNT(col) (NULLs excluded) like every other function here.

    The salt is ``pmod(xxhash64(<every column>), salt)`` — derived
    from row CONTENT, never from ``monotonically_increasing_id`` or
    ``rand``: a positional/random salt is nondeterministic under task
    retry, and a nondeterministic grouping key can double-count or
    drop rows when only part of a shuffle's map side is recomputed
    (the classic repartition-retry hazard).  Content salting is
    retry-stable, and rows that are bit-identical in every column
    landing on one salt is harmless for aggregation — identical rows
    collapse in the map-side partial combine regardless of salt.
    """
    from financial_data_stream_processing_engine_spark.functions.numeric import DECIMAL

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salt)
    )

    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for fn, col, alias in aggs:
        p = f"__p_{alias}"
        if fn == "count":
            partial_exprs.append(
                (F.count(F.lit(1)) if col is None else F.count(col)).alias(p)
            )
            final_exprs.append(F.sum(p).alias(alias))
        elif fn == "sum_decimal":
            partial_exprs.append(F.sum(F.col(col).cast(DECIMAL)).alias(p))
            final_exprs.append(F.sum(p).cast("double").alias(alias))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(alias))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(alias))
        else:
            raise ValueError(f"unsupported agg {fn}")

    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def hash_sample(
    df: DataFrame, key: str, nibbles: tuple[str, ...] = ("0", "1")
) -> DataFrame:
    """Deterministic md5-based sample: keep rows whose md5(key) starts
    with one of ``nibbles`` (p = len(nibbles)/16)."""
    first = F.substring(F.md5(F.col(key).cast("string")), 1, 1)
    return df.filter(first.isin(*nibbles))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the BIG side's key deterministically
    (pmod(xxhash64(<every big-side column>), salt)) and replicate the
    SMALL side once per salt value, so a hot key spreads across
    ``salt`` reducers instead of pinning one.  Results are identical
    to the direct join — only the physical distribution changes (the
    catalog proves identity against the plain-SQL oracle).

    The salt is CONTENT-derived for the same retry-stability reason as
    :func:`salted_agg` (a positional/random salt re-deals rows on task
    retry and can duplicate or lose join rows).  Caveat it buys: big
    rows identical in EVERY column share a salt; real fact rows carry
    a distinct id, and a feed of bit-identical duplicates skews a
    reducer with or without salting.

    This is the explicit form of what AQE's skew-join split does at
    runtime; stating it as an operator makes the pattern available when
    AQE can't see the skew (e.g. the first shuffle of a stage) and
    keeps it testable.  Replication factor = ``salt`` × |small|, so
    keep the small side genuinely small (it is also the broadcast
    candidate — salting matters when the small side is too big to
    broadcast but the key histogram is spiked).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        # the small side is replicated once per salt value, so any join
        # type that emits unmatched SMALL rows (right/full outer) would
        # duplicate them `salt` times — refuse instead of corrupting
        raise ValueError(f"salted_join does not support how={how!r}")
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    small_rep = small.withColumn("__salt", salts)
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    out = big_salted.join(small_rep, [key, "__salt"], how)
    return out.drop("__salt")


def merge_upsert(base: DataFrame, changes: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE-INTO semantics without a lake format: matched base rows are
    REPLACED by their change row, unmatched change rows are INSERTED,
    everything else passes through — the upsert a Delta/Iceberg MERGE
    performs, expressed as anti-join + union (the merge-on-read shape).

    ``changes`` must be key-unique (one change per key — the same
    precondition MERGE itself enforces with its cardinality check).
    One shuffle keyed by ``keys`` for the anti join; the union is
    partition-local.  At 100 TB this is exactly how merge-on-read
    tables compact: the change set is typically small → AQE broadcasts
    the anti-join side.
    """
    return base.join(changes, on=keys, how="left_anti").unionByName(changes)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table versions: one row per key
    whose state differs — ``change_type`` ∈ {'I' (insert: key only in
    ``new``), 'D' (delete: key only in ``old``), 'U' (update: key in
    both, any ``compare_cols`` differ, null-safely)}.  Unchanged keys
    are absent from the output.

    This is the change-data-feed a lake format derives from its
    transaction log, computed directly from the two snapshots: one
    full-outer join on the key (single shuffle, AQE-broadcast when a
    side is small) and a null-safe comparison vector.  Old/new values
    ride along as structs so a consumer can apply or audit the diff.

    Both inputs must be key-unique (the same precondition MERGE has).
    """
    o = old.select(
        *[F.col(k) for k in keys],
        F.struct(*[F.col(c) for c in compare_cols]).alias("old_val"),
        F.lit(True).alias("__in_old"),
    )
    nw = new.select(
        *[F.col(k) for k in keys],
        F.struct(*[F.col(c) for c in compare_cols]).alias("new_val"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(nw, on=keys, how="full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_val.{c}").eqNullSafe(F.col(f"new_val.{c}"))
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", "old_val", "new_val")
    )


def morton_z16(a, b):
    """Morton (Z-order) interleave of two 16-bit values into one
    32-bit curve position: bit i of ``a`` lands at bit 2i, bit i of
    ``b`` at bit 2i+1.

    Writing a dataset ``repartitionByRange(zval).sortWithinPartitions
    (zval)`` clusters rows so that BOTH dimensions prune: any query box
    over (a, b) touches a bounded set of z-ranges, so parquet min/max
    row-group stats skip most files for either-dimension predicates —
    the data-layout trick Delta's OPTIMIZE ZORDER applies, as a pure
    column expression.  Straight shift/mask arithmetic, codegen'd,
    engine-identical.
    """
    z = F.lit(0).cast("long")
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def morton_z16_sql(a: str, b: str) -> str:
    """DuckDB spelling of :func:`morton_z16` (same shift/mask sums)."""
    terms = []
    for i in range(16):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def cdc_apply_to_sum_count(
    old_agg_decimal: DataFrame,
    diff: DataFrame,
    group_from: str,
    value_from: str,
    group_col: str,
) -> DataFrame:
    """Incremental view maintenance for a SUM/COUNT aggregate: apply a
    :func:`table_diff` change feed to a pre-aggregated (group, decimal
    sum, count) state WITHOUT rescanning the base table.

    Contributions: a delete subtracts its old value, an insert adds its
    new value, an update does both — and because an update may MOVE a
    row between groups (the group column itself changed), old and new
    contributions are applied to their OWN groups.  All arithmetic
    stays in DECIMAL until the final cast, so the maintained aggregate
    is bit-identical to a full recompute — the property that makes
    incremental maintenance trustworthy at 100 TB, where the delta is
    MBs and the rescan would be the whole lake.

    ``old_agg_decimal``: (group_col, _dec_sum decimal(27,7), n long).
    Returns the same shape, groups with n=0 removed.  A maintained
    count that goes NEGATIVE means the change feed is inconsistent
    with the state (a delete for a row the state never saw) — that is
    corruption, and it fails the job loudly (``assert_true``) instead
    of silently vanishing with the n>0 filter.
    """
    old_side = diff.filter(F.col("old_val").isNotNull()).select(
        F.col(f"old_val.{group_from}").alias(group_col),
        (-F.col(f"old_val.{value_from}")).cast("decimal(27,7)").alias("__d"),
        F.lit(-1).cast("long").alias("__n"),
    )
    new_side = diff.filter(F.col("new_val").isNotNull()).select(
        F.col(f"new_val.{group_from}").alias(group_col),
        F.col(f"new_val.{value_from}").cast("decimal(27,7)").alias("__d"),
        F.lit(1).cast("long").alias("__n"),
    )
    delta = (
        old_side.unionByName(new_side)
        .groupBy(group_col)
        .agg(F.sum("__d").alias("__dsum"), F.sum("__n").alias("__dn"))
    )
    # NULL-SAFE join key: the delta was built by a groupBy, which puts
    # all NULL-group contributions in ONE group — a plain equi full
    # outer would never match that row to its own state row (NULL !=
    # NULL), emitting a duplicate NULL-group pair and tripping the
    # negative-count assert on a perfectly consistent feed
    oa = old_agg_decimal.withColumnRenamed(group_col, "__g_state")
    dl = delta.withColumnRenamed(group_col, "__g_delta")
    return (
        oa.join(dl, F.col("__g_state").eqNullSafe(F.col("__g_delta")), "full_outer")
        .select(
            F.coalesce("__g_state", "__g_delta").alias(group_col),
            (
                F.coalesce(F.col("_dec_sum"), F.lit(0).cast("decimal(27,7)"))
                + F.coalesce(F.col("__dsum"), F.lit(0).cast("decimal(27,7)"))
            ).alias("_dec_sum"),
            (
                F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
            ).alias("n"),
        )
        # assert rides the n projection so it cannot be pruned: NULL
        # (pass) picks n, a negative count raises mid-scan
        .withColumn(
            "n",
            F.when(
                F.assert_true(
                    F.col("n") >= 0,
                    F.concat(
                        F.lit("cdc_apply_to_sum_count: negative maintained count "),
                        F.col("n"),
                        F.lit(" for group "),
                        F.col(group_col).cast("string"),
                        F.lit(" — inconsistent change feed"),
                    ),
                ).isNull(),
                F.col("n"),
            ),
        )
        .filter(F.col("n") > 0)
    )


def binned_proximity_pairs(
    df: DataFrame,
    ts_micros_col: str = "us",
    id_col: str = "event_id",
    radius_micros: int = 150_000_000,
) -> DataFrame:
    """All pairs of rows within ``radius_micros`` of each other in time
    — with NO equi-key — via BIN BUCKETING, the standard rewrite that
    turns an unkeyed temporal theta join into an equi-join (the same
    trick range-join optimizers apply internally): bin width
    w = 2·radius, the probe side keeps its own bin, the build side
    explodes to (bin−1, bin, bin+1), and the equi-join on the bin key
    plus the exact |Δt| ≤ radius residual recovers every qualifying
    pair.

    Losslessness: |t_a − t_b| ≤ radius < w ⟹ bin(t_b) ∈
    {bin(t_a)−1, bin(t_a), bin(t_a)+1}.  Duplicate-freeness: the probe
    row's bin is a single value, so at most ONE of the build row's
    three exploded bins can match — no distinct needed.  All
    arithmetic is integer microseconds (exact in any engine).

    Returns (id_a, id_b, bin, gap_us) with id_a < id_b and ``bin`` the
    probe (id_a) row's bin.  At scale: 3× map-side row expansion on
    one side, ONE equi-join shuffle keyed on the bin — candidates per
    bin are density², confined to genuinely co-temporal rows, where
    the naive unkeyed theta join is a cartesian.
    """
    w = 2 * radius_micros
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(ts_micros_col).alias("us_a"),
        F.expr(f"{ts_micros_col} DIV {w}").alias("bin"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(ts_micros_col).alias("us_b"),
        F.explode(
            F.expr(
                f"array({ts_micros_col} DIV {w} - 1,"
                f" {ts_micros_col} DIV {w},"
                f" {ts_micros_col} DIV {w} + 1)"
            )
        ).alias("bin"),
    )
    return (
        a.join(b, ["bin"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= radius_micros)
        )
        .select(
            "id_a",
            "id_b",
            "bin",
            F.abs(F.col("us_a") - F.col("us_b")).alias("gap_us"),
        )
    )

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
    to the one-phase result (double partials would not be).
    """
    from financial_data_stream_processing_engine_spark.functions.numeric import DECIMAL

    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), salt))

    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for fn, col, alias in aggs:
        p = f"__p_{alias}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
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
    (pmod(xxhash64(row), salt)) and replicate the SMALL side once per
    salt value, so a hot key spreads across ``salt`` reducers instead
    of pinning one.  Results are identical to the direct join — only
    the physical distribution changes (the catalog proves identity
    against the plain-SQL oracle).

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
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
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

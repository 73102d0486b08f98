"""Edit-distance entity resolution via deletion-neighborhood blocking
(the FastSS scheme).

An all-pairs ``levenshtein(a, b) <= 1`` join is O(n²) — dead at any
scale.  The published fix: two strings within edit distance 1 must
share a member of their deletion neighborhoods ``{s} ∪ del1(s)``
(delete one character at each position) — a substitution pair shares
the variant with the differing position deleted, an insert/delete pair
shares the shorter string itself.  So exploding each string into its
``len+1`` deletion keys and self-joining ON THE KEY produces a
candidate superset, and the exact levenshtein filter runs on
candidates only — the same candidates-only shape as MinHash-LSH, with
a *lossless* (not probabilistic) blocking guarantee.

Scale: keys are linear in corpus size × string length; the shuffle is
keyed by deletion variant, and the quadratic term is bounded by the
largest key group (strings colliding on one variant), not the corpus.
For distance ≤ k the neighborhood generalizes to ≤ k deletions
(O(len^k) keys — practical for k ≤ 2 and short entity strings).

This is the entity-resolution primitive of a training-data pipeline
(author/source canonicalization); the reference engine has no
string-similarity surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_keys(name: F.Column) -> F.Column:
    """``{s} ∪ del1(s)`` as a DISTINCT array: the string itself plus
    every one-character-deleted variant.

    ``array_distinct`` is load-bearing for cost, not correctness: a
    repeated-character string emits the same variant many times
    ('aaaa' → four copies of 'aaa'), and an empty string rides
    Spark's descending ``sequence(1, 0)`` quirk into three '' keys —
    duplicate keys multiply QUADRATICALLY in the blocking self-join
    (k copies on each side → k² candidate rows per colliding pair)
    before the downstream distinct can collapse them.  Dedup at the
    source keeps the join linear in true key collisions; the pair
    OUTPUT is unchanged."""
    variants = F.transform(
        F.sequence(F.lit(1), F.length(name)),
        lambda i: F.concat(
            name.substr(F.lit(1), i - 1), name.substr(i + 1, F.length(name))
        ),
    )
    return F.array_distinct(F.array_prepend(variants, name))


def fuzzy_pairs_edit1(
    df: DataFrame,
    id_col: str,
    name_col: str,
) -> DataFrame:
    """All (id_a, id_b, name_a, name_b, dist) pairs with levenshtein
    distance ≤ 1, id_a < id_b — COMPLETE by the deletion-neighborhood
    argument, never all-pairs.

    Shuffle-width discipline (A/B-measured 2.5×: 5.9 s → 2.3 s at
    sf0.1, same 262 500 rows): the blocking join and the pair-dedup
    carry ONLY ``(id, xxhash64(key))`` — 16 bytes/row instead of two
    name strings replicated len+1 times.  Names re-enter via two id
    joins against the base relation AFTER the candidate set is
    deduped (AQE broadcasts the name side at small scale; at 100 TB
    it is an id-keyed shuffle join on the already-minimized pair
    set).  Hashing the deletion variant is lossless end-to-end: a
    64-bit collision can only ADD a candidate, and the exact
    levenshtein filter removes it."""
    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    # separate select: putting the explode in the same projection as
    # the `name` alias makes the reference resolve as a lateral column
    # alias, which Spark 4's analyzer rejects inside the higher-order
    # transform
    k = base.select("id", F.explode(deletion_keys(F.col("name"))).alias("key"))
    k = k.select("id", F.xxhash64("key").alias("key"))
    a = k.select(F.col("id").alias("id_a"), "key")
    b = k.select(F.col("id").alias("id_b"), "key")
    pairs = (
        a.join(b, "key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    na = base.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"))
    nb = base.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )

"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Scale design (the whole point of having five of them):

* ``dedup_exact``            — one hash-groupBy shuffle; the baseline.
* ``ngram_jaccard_pairs``    — exact all-pairs; O(n²) compare, only for
                               small candidate sets / validation.
* ``minhash_lsh_pairs``      — the 100 TB path: per-doc signature (map
                               only), band-bucket self-join (shuffle on
                               band key, candidates only), exact verify
                               on the candidates.  Everything built-in
                               expressions — no Python in the plan.
* ``simhash_pairs``          — bitwise fingerprint + hamming banding;
                               Arrow-vectorized Pandas UDF for the bit
                               packing (the one genuinely non-SQL step).
* ``embedding_cosine_pairs`` — near-dup in embedding space; brute pairs
                               here, LSH bucketing for scale (see
                               similarity.py).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from financial_data_stream_processing_engine_spark.operators.text import shingles

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one deterministic representative (min id) per exact key.

    Equivalent to ``dropDuplicates`` but with a *defined* survivor, so
    results are reproducible run-to-run (dropDuplicates keeps an
    arbitrary row).  One shuffle on the key columns.

    Key equality is null-safe (``<=>``), so rows with a NULL key column
    form a dedup group like any other and keep their min-id survivor —
    a plain equi-join would silently delete every NULL-keyed row
    (NULL = NULL never matches).  ``min(id)`` ignores NULL ids, so a
    group whose ids are all NULL keeps all its (indistinguishable)
    rows.
    """
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias("__keep_id"))
    cond = df[id_col].eqNullSafe(keep["__keep_id"])
    for c in key_cols:
        cond = cond & df[c].eqNullSafe(keep[c])
    return df.join(keep, cond, "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairs)
# ---------------------------------------------------------------------------


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return inter / union


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard >= threshold.

    Exact but quadratic — the validation oracle for the LSH variants
    and the right tool below ~10⁴ candidates.  Returns
    (id_a, id_b, jaccard).

    The join carries the LENGTH FILTER from the set-similarity-join
    literature (PPJoin family): ``J(A,B) >= θ`` implies
    ``θ·|B| <= |A|`` for ``|A| <= |B|`` (the intersection is at most
    the smaller set, the union at least the larger), so pairs whose
    distinct-shingle counts are off by more than the ratio θ are pruned
    BEFORE the expensive intersection — provably output-identical,
    and it cuts the evaluated pair count by ~the square of the size
    spread.  Still O(n²) pair candidates in the worst case: the scale
    path remains MinHash-LSH.
    """
    sh = df.select(
        F.col(id_col).alias("id_a"), shingles(text_col, n).alias("sh_a")
    ).withColumn("sz_a", F.size("sh_a"))
    sh2 = sh.select(
        F.col("id_a").alias("id_b"),
        F.col("sh_a").alias("sh_b"),
        F.col("sz_a").alias("sz_b"),
    )
    thr = F.lit(float(threshold))
    length_ok = (F.col("sz_a") >= thr * F.col("sz_b")) & (
        F.col("sz_b") >= thr * F.col("sz_a")
    )
    return (
        sh.join(sh2, (F.col("id_a") < F.col("id_b")) & length_ok)
        .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """EXACT Jaccard >= num/den pairs via prefix filtering — the
    AllPairs/PPJoin algorithm (Bayardo, Ma & Srikant, WWW'07;
    Xiao et al., WWW'08), the scalable exact counterpart to both the
    quadratic :func:`ngram_jaccard_pairs` and the probabilistic
    MinHash-LSH path.  Output-identical to brute force, candidate
    count bounded by shared RARE shingles instead of O(n²).

    The filter: order every document's shingles by one GLOBAL total
    order — ascending document frequency, shingle string as the
    tie-break — and keep only the first ``|S| − ceil(θ·|S|) + 1`` as
    blocking keys.  Soundness: J(A,B) ≥ θ implies (with θ = num/den)
    ``|A∩B| ≥ θ·(|A|+|B|)/(1+θ) ≥ θ·max(|A|,|B|)`` (the second step
    is the length filter ``min ≥ θ·max``, itself implied by J ≥ θ),
    and two sets whose overlap is at least ``o`` must share a token
    within their ``(|S|−o+1)``-prefixes under ANY common total order —
    so every qualifying pair collides on some prefix shingle.  The
    threshold is a RATIONAL num/den and the required overlap is
    computed in integer arithmetic (``(num·|S| + den − 1) div den``):
    a double ceil can land one above the exact rational (e.g.
    ``ceil(0.07·100)`` = ceil(7.000000000000001) = 8, not 7), which
    silently shortens the prefix below the sound length — the failure
    is threshold-dependent and invisible until the one corpus that
    hits it, exactly the class of bug exactness rules exist for.

    Why the prefix keeps the RAREST shingles: candidates are generated
    per shared prefix-shingle, so the self-join key distribution is
    exactly the document-frequency tail — stopword-like shingles that
    would explode a naive token-blocking join are pushed OUT of every
    prefix by frequent-last ordering whenever a rarer shingle exists.

    Plan: shingle document-frequency groupBy (vocabulary-sized,
    map-side combinable) → per-doc frequency ranking (one window over
    the doc key — partitions are document-sized) → prefix self-join on
    the shingle key (+ id ordering + integer length filter) → distinct
    candidate pairs → exact verify joining the full shingle arrays
    back by id.  Four shuffles, all keyed and linear in their inputs;
    no Python anywhere.

    Returns (id_a, id_b, jaccard) — the same schema and, by the
    soundness argument, the same rows as the brute-force oracle.
    """
    thr = float(threshold_num) / float(threshold_den)
    sh = (
        df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
        .withColumn("sz", F.size("sh"))
        .where(F.col("sz") > 0)
    )
    flat = sh.select("id", "sz", F.explode("sh").alias("s"))
    dfreq = flat.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy("df", "s")
    ranked = flat.join(dfreq, ["s"]).withColumn("rn", F.row_number().over(w))
    # required overlap o = ceil(num·sz / den), prefix keeps sz − o + 1
    o = F.expr(f"({threshold_num} * sz + {threshold_den - 1}) DIV {threshold_den}")
    pref = ranked.where(F.col("rn") <= F.col("sz") - o + 1).select(
        "id", "sz", "s", "rn"
    )
    a, b = pref.alias("a"), pref.alias("b")
    # PPJoin positional filter: a pair needs overlap
    # o_pair = ceil(num·(sz_a+sz_b) / (num+den)) (from J = O/(szs − O)).
    # At the pair's FIRST shared prefix token no earlier token is
    # shared, so O ≤ 1 + min(sz_a − rn_a, sz_b − rn_b); pruning rows
    # below o_pair keeps that first-match row for every qualifying
    # pair (later duplicate match rows may go — distinct() made them
    # redundant anyway).  Measured at sf0.1, θ = 4/5: 43,543 → 12,784
    # candidates (−70.6 %); wall-flat at survey scale, but the pruned
    # rows are exactly the array-shuffling verify stage's input — the
    # stage that dominates when candidates are billions.
    nd = threshold_num + threshold_den
    o_pair = F.expr(
        f"({threshold_num} * (a.sz + b.sz) + {nd - 1}) DIV {nd}"
    )
    ubound = 1 + F.least(
        F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")
    )
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") * threshold_den >= F.col("b.sz") * threshold_num)
            & (F.col("b.sz") * threshold_den >= F.col("a.sz") * threshold_num)
            & (ubound >= o_pair),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    arr_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    arr_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(arr_a, ["id_a"])
        .join(arr_b, ["id_b"])
        .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= F.lit(thr))
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — per-doc MinHash signature.

    hash_i(s) = xxhash64(i, xxhash64(s)) — the shingle STRING is hashed
    once to a 64-bit value and each of the ``num_hashes`` INDEPENDENT
    slots re-hashes that fixed-width long with its seed.  Hashing the
    string ``num_hashes`` times was the dominant cost of the whole LSH
    pipeline (measured ~2s of 3.1s at sf0.1: 64 × 260k variable-length
    string hashes); the long re-hash is a constant 16-byte input, and a
    2⁻⁶⁴ string-collision folds two shingles together corpus-wide —
    far below the banding miss probability already accepted.
    Independence per slot is load-bearing: a cheaper double-hashing
    family (h1 + i·h2) was measured to correlate the slots so strongly
    that banded candidate volume exploded 68× (two docs sharing one
    argmin shingle collide in EVERY band) — the banding math needs
    P(band collision) = j^r, which only holds for independent slots;
    seeded re-hash of the shingle's hash keeps full independence per
    slot.  Computed as explode → groupBy(id) with ``num_hashes`` MIN
    aggregates.

    The shingle hash is built WITHOUT materializing shingle strings:
    tokens posexplode (codegen'd generate), one xxhash64 per token,
    then ``xxhash64(h_p, h_{p+1}, …)`` over ``lead()`` windows — every
    step whole-stage-codegen'd or vectorized WindowExec.  The previous
    string route (higher-order ``transform``/``array_distinct``/
    ``concat_ws`` building shingle strings, then hashing them) ran as
    interpreted per-element closures; interleaved A/B at sf0.1 measures
    1.52 s → 1.22 s for the signature pass — modest there because 260k
    shingles over 32 tasks is scheduling-bound, but the per-row cost
    that dominates at real scale drops from interpreted string
    allocation + closure dispatch to three codegen'd hash ops.  MinHash
    only needs a uniform per-shingle hash identity, never the string —
    and duplicate shingles are harmless under MIN, so distinctness is
    skipped too.  Docs shorter than ``n`` tokens hash their partial
    token tuple (Spark hash functions skip NULL inputs), mirroring the
    whole-text shingle of the string form.  Slot independence and the
    2⁻⁶⁴ cross-shingle collision rate are unchanged.
    """
    from pyspark.sql import Window

    # Repartition on id BEFORE shingling: both windows and the groupBy
    # below need a hash distribution on id anyway, and exchanging the
    # raw docs (text bytes) moves less data than exchanging the
    # exploded token rows would — while spreading the hash compute
    # across the cluster even when the scan produced few partitions
    # (one small parquet file = one task).
    toks = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .repartition(F.col("id"))
        .select(
            "id",
            (F.size(F.split("__t", " ")) - n).alias("__mx"),
            F.posexplode(F.split("__t", " ")).alias("pos", "__tok"),
        )
        .select("id", "__mx", "pos", F.xxhash64("__tok").alias("th0"))
    )
    w = Window.partitionBy("id").orderBy("pos")
    lead_cols = [F.lead("th0", j).over(w).alias(f"th{j}") for j in range(1, n)]
    exploded = (
        toks.select("id", "__mx", "pos", "th0", *lead_cols)
        # 0-based: full shingles end at pos = len - n; short docs keep
        # their single partial row at pos 0
        .filter(F.col("pos") <= F.greatest(F.col("__mx"), F.lit(0)))
        .select(
            "id",
            F.xxhash64(*[F.col(f"th{j}") for j in range(n)]).alias("s64"),
        )
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("s64"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, exact-verified.

    shingle → minhash(num_hashes) → band into ``bands`` groups of
    num_hashes/bands rows → bucket-join on (band_idx, band_key) →
    exact-Jaccard verify candidates → filter >= threshold.

    With (64, 16) and threshold 0.8 the per-pair miss probability is
    (1-j⁴)¹⁶ ≤ 4e-8, so output equals the exact ``ngram_jaccard_pairs``
    for all practical purposes while scaling linearly in corpus size
    (candidates only; never all pairs).  Returns (id_a, id_b, jaccard).
    """
    if num_hashes % bands != 0:
        # leftover signature slots would be computed but never banded:
        # the caller's (1-j^r)^b recall math would silently understate
        # the true miss probability — refuse rather than under-recall
        raise ValueError(
            f"minhash_lsh_pairs: num_hashes={num_hashes} not divisible "
            f"by bands={bands}"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)

    band_entries = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # hash the band's signature slots directly as
                        # longs — xxhash64 is variadic, no string concat
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")

    # Candidate pairs via bucket-collect instead of a band_entries
    # self-join: the self-join would compute the whole signature
    # pipeline twice (Spark does not reuse the exchange across the two
    # branches) and shuffle both copies.  Buckets hold docs agreeing on
    # an entire band (4 signature slots), so they are tiny by
    # construction — a pathological mega-bucket can only come from
    # massive exact-duplicate clusters, which dedup_exact should remove
    # first (documented contract).  ids are sorted so id_a < id_b is
    # structural; distinct collapses pairs colliding in several bands.
    candidates = (
        band_entries.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )

    # Verify joins carry the RAW text through the (broadcast) candidate
    # joins and shingle only afterwards: computing the shingle arrays
    # before the join would evaluate them for every document, while
    # only candidate rows (a vanishing fraction of the corpus) need
    # them — Catalyst does not defer a projection below a join on its
    # own, so the plan states it explicitly.
    txt = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    verified = (
        candidates.join(txt.withColumnsRenamed({"id": "id_a", "__t": "__ta"}), "id_a")
        .join(txt.withColumnsRenamed({"id": "id_b", "__t": "__tb"}), "id_b")
        .withColumn("jaccard", _jaccard(shingles("__ta", n), shingles("__tb", n)))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def md5_token_hash60(t: Column) -> Column:
    """Engine-portable 60-bit token hash: the first 15 hex chars of
    md5, as a signed bigint (< 2⁶⁰, so no sign issues in either
    engine).  DuckDB spelling:
    ``CAST(('0x' || SUBSTR(MD5(t), 1, 15)) AS BIGINT)`` — this is what
    makes a FULLY engine-independent SimHash oracle possible."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: Callable[[Column], Column] | None = None,
    bits: int = 64,
) -> DataFrame:
    """(id, simhash: bigint) — ``bits``-wide SimHash over whitespace
    tokens.

    Per token: ``token_hash`` (default xxhash64 — fastest); each
    signature bit is the sign of the sum of ±1 contributions across
    tokens.  Pass :func:`md5_token_hash60` with ``bits=60`` for the
    engine-portable family the catalog oracle recomputes in DuckDB.
    The bit-packing loop is genuinely non-relational, so it runs as an
    Arrow-vectorized Pandas UDF over the token-hash arrays (numpy bit
    ops; no per-row Python).
    """
    if not 0 < bits <= 64:
        raise ValueError("bits must be in 1..64")

    @F.pandas_udf("bigint")
    def _pack(hashes: pd.Series) -> pd.Series:
        out = np.empty(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                out[i] = 0
                continue
            arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            # unpack `bits` bits per hash → (n_tokens, bits) of {0,1}
            bmat = (arr[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & 1
            # signed BEFORE the subtraction: the bit matrix is uint64
            # and `sum*2 - n` would underflow to 2⁶⁴-ish for negative
            # votes, setting every bit (caught by the engine-independent
            # DuckDB simhash oracle; the earlier banded-vs-brute
            # invariant was blind to it because both sides consumed the
            # same wrong signatures)
            votes = bmat.sum(axis=0).astype(np.int64) * 2 - len(arr)
            fp = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(b)
            out[i] = fp.astype(np.int64)
        return pd.Series(out)

    th = token_hash if token_hash is not None else F.xxhash64
    token_hashes = F.transform(F.split(F.col(text_col), " "), lambda t: th(t))
    return df.select(F.col(id_col).alias("id"), _pack(token_hashes).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    token_hash: Callable[[Column], Column] | None = None,
    bits: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs with hamming(simhash) <= max_hamming.

    Banding: split the ``bits``-wide fingerprint into ``max_hamming+1``
    chunks — any pair within the hamming budget must agree exactly on
    ≥1 chunk (pigeonhole), so an equi-join per chunk finds all of them
    without an all-pairs compare.  Verify with bit_count(xor).
    """
    n_chunks = max_hamming + 1
    width = bits // n_chunks  # last chunk takes the remainder bits
    sig = simhash_signatures(df, id_col, text_col, token_hash=token_hash, bits=bits)

    def chunk_key(c: int) -> Column:
        shifted = F.shiftrightunsigned(F.col("simhash"), width * c)
        if c < n_chunks - 1:
            return shifted.bitwiseAND(F.lit((1 << width) - 1))
        return shifted  # top chunk: all remaining bits

    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"), chunk_key(c).alias("key")
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "simhash", "ck.chunk", "ck.key")

    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays — built-in fold, no UDF.

    Left-to-right sequential summation: bit-reproducible across engines
    and runs.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def sq(acc, v):
        return acc + v.cast("double") * v.cast("double")

    na = F.sqrt(F.aggregate(a, F.lit(0.0), sq))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), sq))
    # try_divide: a zero-norm vector makes cosine undefined — NULL, not
    # an ANSI DIVIDE_BY_ZERO that fails the whole job for one row.
    return F.try_divide(dot, na * nb)


def vector_norm(col: Column) -> Column:
    """‖v‖ with the same left-to-right fold summation as :func:`cosine`
    (bitwise-compatible wherever either is used)."""

    def sq(acc, v):
        return acc + v.cast("double") * v.cast("double")

    return F.sqrt(F.aggregate(col, F.lit(0.0), sq))


def pair_dot_udf():
    """Arrow-vectorized pairwise dot product, bitwise-equal to the
    ``F.aggregate`` fold.

    Per-pair higher-order expressions run as INTERPRETED closures on
    the JVM — at millions of candidate pairs × 64 dims that dominates
    the runtime (measured 51-60 s at sf0.1).  numpy does the same
    arithmetic vectorized; ``np.cumsum`` over ``[0, x0·y0, x1·y1, …]``
    reproduces the fold's ``((0+x0y0)+x1y1)+…`` summation order
    EXACTLY (including the +0.0 initial term that normalizes -0.0), so
    results stay bit-identical to the expression form and to the
    DuckDB oracle's identical fold.  Fixed-dimension vectors assumed
    (same precondition ``zip_with`` has).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def dot(va, vb):
        import numpy as np
        import pandas as pd

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        z = np.zeros((A.shape[0], 1))
        d = np.cumsum(np.concatenate([z, A * B], axis=1), axis=1)[:, -1]
        return pd.Series(d)

    return dot


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold.

    Brute-force pairs — correct at validation scale.  At corpus scale,
    bucket by sign-LSH (similarity.random_hyperplane_buckets) first and
    run this within buckets only.

    Norms are computed ONCE per vector (JVM fold, n rows) before the
    pair join; only the dot product is per-pair, through the
    Arrow-vectorized :func:`pair_dot_udf` — same values, ~10× less
    per-pair work than folding dot+norms per candidate.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        vector_norm(F.col(vec_col)).alias("na"),
    )
    b = a.select(
        F.col("id_a").alias("id_b"),
        F.col("v_a").alias("v_b"),
        F.col("na").alias("nb"),
    )
    dot = pair_dot_udf()
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.try_divide(dot(F.col("v_a"), F.col("v_b")), F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# near-dup clustering (connected components → canonical survivor)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Collapse near-duplicate PAIRS into clusters: (node, component)
    where component = the minimum id reachable from the node — the last
    step of every dedup pipeline (pick one canonical doc per cluster).

    Algorithm: iterative min-label propagation (the DataFrame form of
    the classic Spark/GraphX connected components): every node starts
    labeled with itself; each round every node takes the min of its own
    label and its neighbors' labels; stop when a round changes nothing.
    Rounds needed = graph diameter, and near-dup graphs are
    overwhelmingly tiny star/clique clusters (diameter ≤ 2-3), so the
    loop converges in a handful of rounds; ``max_iter`` bounds
    pathological chains.  Each round is two shuffles (join + groupBy) on
    the edge list — linear in |E|, never materializing the transitive
    closure.

    The driver-side loop carries only a convergence COUNT per round —
    no row data ever reaches the driver — and that count rides the
    round's one materialization job as an ``Observation`` metric (no
    second count job per round).

    Raises ``RuntimeError`` if the loop exhausts ``max_iter`` while
    labels are still changing: truncated labels would silently keep
    multiple survivors per cluster, and correctness-critical callers
    (``dedup_clusters``) cannot detect that from the output.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    # undirected: propagate both ways
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # materialize the edge list ONCE: `sym` feeds every round's join,
    # and without this the whole upstream pair pipeline (e.g. MinHash
    # signatures → buckets → verify) re-executes per round
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    from pyspark.sql import Observation

    converged = False
    for it in range(max_iter):
        # neighbor labels: for each edge (src, dst), dst's candidate
        # label is src's current label
        neighbor = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).alias("changed"),
            )
        )
        obs = Observation(f"cc_round_{it}")
        updated = updated.observe(
            obs, F.sum(F.col("changed").cast("long")).alias("n_changed")
        )
        # one job per round: the eager checkpoint materializes the new
        # labels (truncating lineage) AND delivers the convergence
        # metric through the observation
        updated = updated.localCheckpoint(eager=True)
        n_changed = obs.get["n_changed"] or 0
        labels = updated.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: labels still changing after max_iter="
            f"{max_iter} rounds (graph diameter exceeds the bound); raise "
            "max_iter — truncated labels would split clusters"
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id, canonical_id, is_survivor) for every row of ``df``: docs in
    a near-dup cluster map to the cluster's min id; untouched docs map
    to themselves.  Downstream keeps ``is_survivor`` rows."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    out = df.select(F.col(id_col).alias("id")).join(
        comp.withColumnRenamed("node", "id"), "id", "left"
    )
    return out.select(
        "id",
        F.coalesce(F.col("component"), F.col("id")).alias("canonical_id"),
    ).withColumn("is_survivor", F.col("id") == F.col("canonical_id"))


# ---------------------------------------------------------------------------
# Bloom-filter membership (probabilistic reference-set dedup)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16   #: filter size m (bits)
BLOOM_WORD = 32        #: bits per packed word (int32 range: sign-safe in
                       #: both engines' BIGINT shifts)


def _bloom_positions(key: Column, k: int) -> list[Column]:
    """k deterministic bit positions: md5(key∥salt) → first 8 hex
    digits → int mod m.  Same arithmetic is re-spelled in the oracle,
    so both engines build the *identical* filter — including identical
    false positives (the filter is a pure function of the data)."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f"#b{i}"))), 1, 8), 16, 10
        ).cast("long")
        % BLOOM_BITS
        for i in range(k)
    ]


def bloom_build(df: DataFrame, key_col: str, k: int = 3) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a (word, bits) relation
    — ``m/32`` rows of OR-ed 32-bit words (stored in BIGINT).

    One explode (k rows per key, map-side) + one tiny groupBy on the
    word index: the shuffle carries at most m/32 = 2048 rows TOTAL at
    any corpus size — this is the aggregate-to-a-sketch pattern, the
    cheapest possible dedup precheck at 100 TB.  The result broadcasts.
    """
    pos = df.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col), k))).alias("pos")
    )
    word = (F.col("pos") / BLOOM_WORD).cast("long").alias("word")
    bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))")
    return (
        pos.select(word, bit.alias("bit"))
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    words: DataFrame,
    key_col: str,
    id_col: str,
    k: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe every row's key against a built filter: ``out_col`` is
    TRUE iff all k bit positions are set (definitely-absent keys are
    FALSE — the Bloom guarantee; TRUE may include false positives at
    the documented (set_bits/m)^k rate).

    The word relation broadcasts (≤2048 rows); the probe is a map-side
    join + one groupBy on the row id.  No full shuffle of the corpus.
    """
    probes = df.select(
        F.col(id_col),
        F.posexplode(F.array(*_bloom_positions(F.col(key_col), k))).alias(
            "__i", "pos"
        ),
    ).select(
        id_col,
        (F.col("pos") / BLOOM_WORD).cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
        ).alias("bit"),
    )
    hit = F.coalesce(
        (F.col("bits").bitwiseAND(F.col("bit")) == F.col("bit")), F.lit(False)
    )
    return (
        probes.join(F.broadcast(words), "word", "left")
        .select(id_col, hit.alias("__hit"))
        .groupBy(id_col)
        .agg(F.min("__hit").alias(out_col))
    )


# ---------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. "Deduplicating Training Data
# Makes Language Models Better" — the span-level duplication signal)
# ---------------------------------------------------------------------------


def duplicated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document exact-substring duplication: the share of a doc's
    ``n``-token spans (multiset, all positions) that also occur in at
    least one OTHER document.

    This is the scalable projection of suffix-array substring dedup:
    fixed-length span fingerprints replace the suffix array, one
    explode + one groupBy(span) + one semi join replace the O(corpus)
    suffix sort.  Spans shuffle by span string — at 100 TB, hash the
    span to a 64-bit key first (same plan, 8-byte keys); kept as
    strings here so the oracle is trivially identical.

    Span strings are assembled codegen-side: posexplode the token
    array and ``concat_ws`` the token with its ``lead()`` successors —
    identical strings to the higher-order ``ngrams_with_repeats`` form
    (concat_ws skips the NULL leads past a short doc's end, matching
    the whole-text span), without the interpreted per-element closures
    that dominated this operator's runtime (measured ~2× at sf0.1).

    Returns (id, n_spans, n_dup_spans, dup_ratio).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        (F.size(F.split(F.col(text_col), " ")) - n).alias("__mx"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "__t0"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = [F.lead("__t0", j).over(w).alias(f"__t{j}") for j in range(1, n)]
    ex = (
        toks.select(id_col, "__mx", "pos", "__t0", *lead_cols)
        # 0-based: full spans end at pos = len - n; docs shorter than n
        # keep their single whole-text row at pos 0
        .filter(F.col("pos") <= F.greatest(F.col("__mx"), F.lit(0)))
        .select(
            F.col(id_col),
            F.concat_ws(" ", *[F.col(f"__t{j}") for j in range(n)]).alias("span"),
        )
    )
    dup = (
        ex.groupBy("span")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("span")
    )
    per_doc = (
        ex.join(dup, "span", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n_dup"))
    )
    totals = df.select(
        F.col(id_col),
        F.greatest(
            F.size(F.split(F.col(text_col), " ")) - (n - 1), F.lit(1)
        ).cast("long").alias("n_spans"),
    )
    return (
        totals.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce(F.col("__n_dup"), F.lit(0).cast("long")).alias("n_dup_spans"),
            (
                F.coalesce(F.col("__n_dup"), F.lit(0).cast("long")).cast("double")
                / F.col("n_spans")
            ).alias("dup_ratio"),
        )
    )

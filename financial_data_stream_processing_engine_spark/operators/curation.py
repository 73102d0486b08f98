"""Corpus-curation operators for large-scale training-data pipelines:
chunking, sequence packing, benchmark-contamination checks, mixture
sampling, and per-group quotas.

These extend the reference's data-processing surface (the reference has
no corpus tooling at all — financial_engine.py is tick-only) with the
operations a 100 TB pretraining pipeline runs between raw documents and
tokenized batches.  Design rules match the rest of the engine: pure
DataFrame expressions wherever the semantics allow (chunking, sampling,
quotas, contamination are all expression/join-shaped); ``applyInPandas``
only where the semantics are genuinely a per-group sequential
recurrence (greedy packing); determinism everywhere — every operator is
reproducible across runs, partitionings, and engines, which is what
makes the DuckDB oracles possible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from financial_data_stream_processing_engine_spark.functions.exprs import bind
from financial_data_stream_processing_engine_spark.operators.text import shingles, tokens


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into token-window chunks with overlap:
    chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; the
    last chunk may be short; every doc yields at least one chunk.

    Pure expressions (split → sequence → explode → slice), so the work
    is embarrassingly parallel and stays in whole-stage codegen — at
    100 TB this is a map-only stage with no shuffle.  Returns
    (doc_id, chunk_idx, chunk_tokens, chunk_text).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    # NULL text would make the explode sequence NULL and emit NOTHING,
    # silently dropping the document from the chunk output — coalesce
    # to '' so every doc keeps its documented at-least-one-chunk row
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    # number of stride steps needed so the last window reaches the end
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(window), F.lit(0)) / F.lit(stride)
    ).cast("int")
    out = (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(
                F.col("__toks"), F.col("chunk_idx") * F.lit(stride) + F.lit(1), window
            ).alias("__chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("__chunk").alias("chunk_tokens"),
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

_PACK_SCHEMA = (
    "source string, shard string, doc_id bigint, n_tokens bigint, pack_idx bigint"
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    budget: int = 256,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing: walk each group's documents in id order
    and append to the current pack while the token budget holds,
    otherwise start a new pack.  A document larger than the budget gets
    a pack of its own.  Returns (source, shard, doc_id, n_tokens,
    pack_idx) — pack identity is (source, shard, pack_idx).  Token
    cost is whitespace tokens by default; pass ``n_tokens_col`` (e.g. a
    :func:`~financial_data_stream_processing_engine_spark.operators.text.bpe_doc_token_counts`
    join) to pack on tokenizer-EXACT counts instead.

    Greedy packing is a prefix recurrence (pack of row i depends on the
    accumulator after row i-1), which no window function expresses, so
    the per-group walk runs in ``applyInPandas`` — one Arrow batch per
    group, a single vectorizable pass.

    Scale: the group key is (group, shard) where shard = first md5
    nibble of the id — 16 deterministic sub-shards per source, so one
    giant source fans out across the cluster instead of serializing on
    one task, and the shard assignment is engine-independent (the
    DuckDB oracle computes the identical partitioning).  At 100 TB you
    raise the nibble count; packing quality is unaffected because packs
    never cross shards by construction.
    """
    ntok = (
        F.col(n_tokens_col) if n_tokens_col is not None
        else F.size(tokens(F.col(text_col)))
    )
    base = df.select(
        F.col(group_col).cast("string").alias("source"),
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        ntok.cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        acc = 0
        idx = -1
        packs = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if idx < 0 or acc + n > budget:
                idx += 1
                acc = n
            else:
                acc += n
            packs.append(idx)
        pdf["pack_idx"] = pd.Series(packs, dtype="int64")
        return pdf

    return base.groupBy("source", "shard").applyInPandas(pack, _PACK_SCHEMA)


def pack_sequences_sql(budget: int = 256) -> str:
    """DuckDB oracle for :func:`pack_sequences`: the same greedy walk
    as a linear recursive CTE — each iteration advances every
    (source, shard) group by one document."""
    return f"""
WITH RECURSIVE d AS (
  SELECT CAST(source AS VARCHAR) AS source,
         SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY source, SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)
           ORDER BY doc_id) AS rn
  FROM documents),
p AS (
  SELECT source, shard, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack_idx, n_tokens AS acc
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.shard, d.doc_id, d.n_tokens, d.rn,
         CASE WHEN p.acc + d.n_tokens <= {budget}
              THEN p.pack_idx ELSE p.pack_idx + 1 END,
         CASE WHEN p.acc + d.n_tokens <= {budget}
              THEN p.acc + d.n_tokens ELSE d.n_tokens END
  FROM p JOIN d ON d.source = p.source AND d.shard = p.shard AND d.rn = p.rn + 1)
SELECT source, shard, doc_id, n_tokens, pack_idx FROM p
"""


# ---------------------------------------------------------------------------
# benchmark contamination
# ---------------------------------------------------------------------------


def contamination_overlap(
    df: DataFrame,
    probe_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_ratio: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination check: how much of each corpus document's
    n-gram set also appears in the probe (benchmark) documents selected
    by ``probe_pred``.  Returns (doc_id, n_shingles, n_overlap,
    overlap_ratio, contaminated) for every NON-probe document.

    Plan shape for 100 TB: the probe side is a benchmark — tiny by
    definition — so its distinct shingle set is broadcast; the corpus
    side explodes its shingles once, left-semi-ish joins against the
    broadcast, and re-aggregates on the already-hash-distributed doc
    id.  One shuffle (the per-doc count), no cartesian anything.
    """
    ids = F.col(id_col).alias("doc_id")
    probe_sh = (
        df.filter(probe_pred)
        .select(F.explode(shingles(F.col(text_col), n)).alias("s"))
        .distinct()
    )
    corpus = df.filter(~probe_pred).select(
        ids, F.explode(shingles(F.col(text_col), n)).alias("s")
    )
    hits = (
        corpus.join(F.broadcast(probe_sh).withColumn("__hit", F.lit(1)), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_overlap"),
        )
    )
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        (F.col("n_overlap") / F.col("n_shingles")).cast("double").alias("overlap_ratio"),
        (F.col("n_overlap") / F.col("n_shingles") >= F.lit(flag_ratio)).alias(
            "contaminated"
        ),
    )


# ---------------------------------------------------------------------------
# mixture sampling + quotas
# ---------------------------------------------------------------------------


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Deterministic source-weighted downsampling: keep a row when the
    first md5 nibble of its id falls inside its source's quota —
    ``weights`` maps source → nibble count (rate = k/16).  Unlisted
    sources are dropped (weight 0).

    This is how mixture weights are applied at 100 TB: a pure per-row
    filter, reproducible across engines and runs (unlike
    ``df.sample``), no shuffle, fully pushed into the scan stage.
    """
    nib = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 1), 16, 10).cast(
        "int"
    )
    quota = None
    for src, k in sorted(weights.items()):
        cond = F.col(group_col) == F.lit(src)
        quota = F.when(cond, F.lit(k)) if quota is None else quota.when(cond, F.lit(k))
    quota = quota.otherwise(F.lit(0)) if quota is not None else F.lit(0)
    return df.filter(nib < quota)


def select_token_budget(
    df: DataFrame,
    budget: int,
    quality_col: str = "quality_score",
    token_col: str = "n_tokens",
    buckets: int = 100,
) -> DataFrame:
    """Budget-bounded corpus selection: keep the highest-quality
    documents whose total tokens fit ``budget``, by quality-histogram
    threshold rather than a global sort.

    The naive form — order the whole corpus by quality and cut at the
    running-token-sum boundary — needs a cumulative window over one
    global ordering: a single reducer at 100 TB.  The scale form here:
    (1) histogram pass: sum tokens per quality bucket (``buckets``
    cells — map-side combinable, tiny result); (2) walk the histogram
    from the top and keep every whole bucket that still fits (the
    cumulative window runs over ≤``buckets`` rows, not the corpus);
    (3) semi-join the corpus against the broadcast keep-set.  The
    selection under-fills by at most one bucket's tokens (granularity
    1/``buckets`` of the quality range) — the documented trade for
    never serializing the corpus through one task.

    Returns the kept rows with their ``bucket`` attached.
    """
    from pyspark.sql import Window

    bucket = F.greatest(
        F.least(
            F.floor(F.col(quality_col) * buckets).cast("int"), F.lit(buckets - 1)
        ),
        F.lit(0),
    )
    with_b = df.withColumn("bucket", bucket)
    hist = with_b.groupBy("bucket").agg(F.sum(token_col).alias("__toks"))
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    keep = (
        hist.withColumn("__cum", F.sum("__toks").over(w))
        .filter(F.col("__cum") <= budget)
        .select("bucket")
    )
    return with_b.join(F.broadcast(keep), "bucket", "left_semi")


def quota_cap(
    df: DataFrame,
    per_group: int,
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Cap each group at ``per_group`` rows, selected deterministically
    by md5(id) order (a reproducible uniform subsample, not "first K by
    storage order").  One window shuffle on the group key; the md5
    order makes the kept set independent of physical layout — the same
    rows survive on any cluster."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_group)
        .drop("__rk")
    )


def train_split(
    df: DataFrame,
    valid_16ths: int = 1,
    test_16ths: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/valid/test assignment from the first md5
    nibble of the id: nibbles ``[0, 16-valid-test)`` → train, the next
    ``valid_16ths`` → valid, the top ``test_16ths`` → test.

    Content-addressed (id-hash) splitting is what keeps the holdout
    stable when the corpus is re-sharded, re-ordered, or incrementally
    extended — exactly the property storage-order splits lose.  Pure
    per-row projection: no shuffle, no RNG, reproducible everywhere.
    """
    nib = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1), 16, 10
    ).cast("int")
    train_lim = 16 - valid_16ths - test_16ths
    return df.withColumn(
        "split",
        F.when(nib < train_lim, F.lit("train"))
        .when(nib < train_lim + valid_16ths, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def dedup_segments(
    df: DataFrame,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment-level exact dedup (the CCNet/line-dedup shape): cut each
    document into consecutive ``window``-token segments, drop every
    repeated segment corpus-wide (survivor = smallest (doc, position)),
    and reassemble the surviving text in original order.

    Plan: explode to segments (map-only), one window shuffle keyed by
    the segment TEXT for the survivor pick, then a groupBy(doc) with an
    order-preserving ``array_agg`` to rebuild — linear, no self-join.
    At 100 TB the segment-key shuffle dominates; hashing the segment to
    a 128-bit md5 key (collision-safe) instead of shuffling raw text
    would halve the shuffle bytes — kept as raw text here so the oracle
    compares the semantics, not the hash.
    """
    from pyspark.sql.window import Window

    # coalesce like chunk_documents: NULL text must not silently drop
    # the document from the segment explode
    # bind the token array once per row (functions.exprs): the split
    # would otherwise re-run per SEGMENT inside the transform lambda —
    # O(len²/window) character work per document
    seg_arr = bind(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda toks: F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size(toks) / F.lit(window)).cast("int") - 1
            ),
            lambda i: F.array_join(F.slice(toks, i * window + 1, window), " "),
        ),
    )
    segs = df.select(
        id_col,
        F.posexplode(seg_arr).alias("seg_idx", "seg_text"),
    )
    w = Window.partitionBy("seg_text").orderBy(id_col, "seg_idx")
    kept = segs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("seg_idx", "seg_text"))
            ).seg_text.alias("parts"),
            " ",
        ).alias("dedup_text"),
    )
    n_seg = F.ceil(
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        / F.lit(window)
    ).cast("int")
    base = df.select(id_col, n_seg.alias("n_segments"))
    return (
        base.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            "n_segments",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )

"""Unigram-LM tokenizer training (SentencePiece-style Viterbi hard-EM)
— the counterpart to the BPE trainer (``operators/text.py::
bpe_train_merges``; VERDICT r12 next-step #4a).

Kudo 2018 ("Subword Regularization") trains a unigram language model
over a piece vocabulary by EM on the segmentation lattice.  This is
the HARD-EM (Viterbi) variant re-expressed relationally and made
EXACT-INTEGER so the driver's cross-engine value hash certifies the
whole training loop:

* **Objective.**  A segmentation of word ``w`` into pieces
  ``p_1..p_t`` costs ``Σ qcost(p_i)`` where
  ``qcost(p) = QLOG(T) − QLOG(cnt_p) + 1`` — an integer surrogate for
  ``−log(cnt_p / T)`` on a 1/256-of-a-bit grid.  ``QLOG`` is the
  classic bit-length + linear-mantissa integer log2:
  ``QLOG(c) = (bitlen(c) − 1)·256 + floor(c·256 / 2^(bitlen(c)−1)) −
  256`` — monotone in ``c``, exactly computable in BOTH engines from
  ``LENGTH(BIN(c))`` and a bigint shift (no float anywhere; the ``+1``
  keeps every piece cost strictly positive so longer segmentations
  can never tie a shorter one at zero marginal cost).
* **E-step (Viterbi).**  Words are bounded at ``MAX_WORD_LEN`` chars
  and pieces at ``MAX_PIECE_LEN``, so the segmentation lattice per
  word is the FIXED composition table :func:`comp_parts_rows`
  (``Σ_n≤8 tetranacci(n) = 223`` compositions, ~1k flat part rows) —
  best segmentation = relational argmin over (cost, n_parts, comp_id),
  fully deterministic, no DP state, no Python in the loop.
* **M-step.**  Piece counts re-estimated from Viterbi usage
  (``Σ word_freq`` over the best segmentations); unused pieces are
  pruned; single-character pieces are re-seeded at count 1 so every
  word stays segmentable (the SentencePiece required-character rule).

Scale design: the corpus is touched ONCE (the word-frequency groupBy);
every EM round runs on the VOCABULARY (distinct words × a constant
~500-row composition fan-out — |vocab|-bounded, never corpus rows),
with round state spilled to parquet (the louvain/Pregel stable-storage
discipline).  The DuckDB oracle unrolls the same rounds as
MATERIALIZED CTEs from the same composition VALUES table and the same
QLOG text (plans/llm_queries.py::_unigram_sql_parts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

#: model hyperparameters — words longer than MAX_WORD_LEN are excluded
#: from training/segmentation (the fixture corpus tops out at 8), and
#: pieces are at most MAX_PIECE_LEN chars.
MAX_WORD_LEN = 8
MAX_PIECE_LEN = 4
MIN_COUNT = 2
DEFAULT_ROUNDS = 3

#: integer log2 surrogate (1/256-bit grid) — ONE template string, both
#: engines: LENGTH(BIN(c)) is the exact bit length (DuckDB bin() and
#: Spark bin() are both unpadded) and the shift is exact bigint math.
QLOG_SQL_T = (
    "CAST((LENGTH(BIN({c})) - 1) * 256"
    " + CAST((({c} * 256) >> (LENGTH(BIN({c})) - 1)) AS BIGINT)"
    " - 256 AS BIGINT)"
)

#: piece cost under model total {t}: QLOG(t) − QLOG(c) + 1 ≥ 1
QCOST_SQL_T = (
    "CAST(" + QLOG_SQL_T.format(c="{t}") + " - " + QLOG_SQL_T.format(c="{c}")
    + " + 1 AS BIGINT)"
)


def _compositions(n: int, max_piece: int) -> list[tuple[int, ...]]:
    """All compositions of ``n`` into parts 1..max_piece, in the
    deterministic first-part-ascending recursion order (comp_id = the
    index in this order — the final Viterbi tie-break)."""
    if n == 0:
        return [()]
    out: list[tuple[int, ...]] = []
    for p in range(1, min(max_piece, n) + 1):
        for rest in _compositions(n - p, max_piece):
            out.append((p,) + rest)
    return out


def comp_parts_rows() -> list[tuple[int, int, int, int, int, int]]:
    """The FLAT composition-parts table
    ``(wlen, comp_id, n_parts, pidx, pstart, plen)`` — one row per
    piece slot of every composition of every word length ≤
    :data:`MAX_WORD_LEN` into parts ≤ :data:`MAX_PIECE_LEN`.  The one
    source of truth for both engines (rendered as a VALUES literal
    into the oracle)."""
    rows = []
    for wlen in range(1, MAX_WORD_LEN + 1):
        for cid, parts in enumerate(_compositions(wlen, MAX_PIECE_LEN)):
            start = 0
            for pidx, plen in enumerate(parts):
                rows.append((wlen, cid, len(parts), pidx, start, plen))
                start += plen
    return rows


def grid_rows() -> list[tuple[int, int, int]]:
    """The substring-extraction grid ``(wlen, start, plen)`` for the
    init vocabulary: every in-bounds (start, plen ≤ MAX_PIECE_LEN)
    slot of every word length ≤ MAX_WORD_LEN."""
    return [
        (wlen, start, plen)
        for wlen in range(1, MAX_WORD_LEN + 1)
        for plen in range(1, min(MAX_PIECE_LEN, wlen) + 1)
        for start in range(0, wlen - plen + 1)
    ]


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the ``[a-z]+`` words of the lowercased corpus,
    words longer than MAX_WORD_LEN excluded — the one corpus pass."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .where(F.length("word") <= MAX_WORD_LEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _comp_df(spark) -> DataFrame:
    return spark.createDataFrame(
        comp_parts_rows(),
        "wlen int, comp_id int, n_parts int, pidx int, pstart int, plen int",
    )


def init_vocab(words: DataFrame) -> DataFrame:
    """Round-0 candidate vocabulary: every ≤MAX_PIECE_LEN substring of
    every word, counted with word frequency × occurrences; multi-char
    pieces below MIN_COUNT pruned, single chars always kept."""
    spark = words.sparkSession
    grid = spark.createDataFrame(grid_rows(), "wlen int, start int, plen int")
    return (
        words.join(F.broadcast(grid), F.length("word") == F.col("wlen"))
        .select(F.expr("substr(word, start + 1, plen)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .where((F.length("piece") == 1) | (F.col("cnt") >= MIN_COUNT))
    )


def _piece_costs(vocab: DataFrame, tot: DataFrame) -> DataFrame:
    """(piece, cnt, qcost) under model total ``tot(t)`` — the shared
    QCOST text on exact bigints."""
    return vocab.crossJoin(F.broadcast(tot)).select(
        "piece", "cnt", F.expr(QCOST_SQL_T.format(t="t", c="cnt")).alias("qcost")
    )


def viterbi_best(words: DataFrame, costs: DataFrame) -> DataFrame:
    """Best segmentation per word under the piece-cost frame: argmin
    over the composition lattice by (cost, n_parts, comp_id) —
    returns (word, freq, comp_id, n_parts, cost).

    The piece-cost frame is broadcast: the vocabulary is hard-bounded
    by construction (``[a-z]`` pieces ≤ MAX_PIECE_LEN chars → at most
    26+26²+26³+26⁴ ≈ 475k rows, a few MB), while the lattice fan-out
    on the probe side is |distinct words| × ~500 part rows — at corpus
    scale the fan-out must never be shuffled just to meet a
    vocabulary-sized build side.  The argmin itself is a min-over-
    struct aggregate (lexicographic (cost, n_parts, comp_id) — the
    same tie-break as an ORDER BY) rather than a row_number window:
    partial aggregation combines map-side and there is no per-word
    sort."""
    comp = _comp_df(words.sparkSession)
    scored = (
        words.join(F.broadcast(comp), F.length("word") == F.col("wlen"))
        .select(
            "word", "freq", "comp_id", "n_parts",
            F.expr("substr(word, pstart + 1, plen)").alias("piece"),
        )
        .join(F.broadcast(costs.select("piece", "qcost")), ["piece"])
        .groupBy("word", "freq", "comp_id", "n_parts")
        .agg(
            F.sum("qcost").cast("long").alias("cost"),
            F.count(F.lit(1)).alias("n_match"),
        )
        .where(F.col("n_match") == F.col("n_parts"))
    )
    return (
        scored.groupBy("word", "freq")
        .agg(F.min(F.struct("cost", "n_parts", "comp_id")).alias("b"))
        .select(
            "word",
            "freq",
            F.col("b.comp_id").alias("comp_id"),
            F.col("b.n_parts").alias("n_parts"),
            F.col("b.cost").alias("cost"),
        )
    )


def _usage(best: DataFrame) -> DataFrame:
    """M-step piece usage counts from the Viterbi segmentations."""
    comp = _comp_df(best.sparkSession)
    return (
        best.join(
            F.broadcast(comp),
            (F.length("word") == F.col("wlen"))
            & (best["comp_id"] == comp["comp_id"]),
        )
        .select(F.expr("substr(word, pstart + 1, plen)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def unigram_train(
    df: DataFrame,
    rounds: int = DEFAULT_ROUNDS,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train the unigram LM from a document corpus: one corpus word
    pass (:func:`word_freqs`), then :func:`unigram_train_words` on the
    (word, freq) relation.  See that function for the full contract."""
    return unigram_train_words(word_freqs(df, text_col), rounds=rounds)


def unigram_train_words(
    words_df: DataFrame,
    rounds: int = DEFAULT_ROUNDS,
    spill: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Train the unigram LM from a ``(word, freq)`` relation —
    ``rounds`` Viterbi-EM iterations from the substring-count init.

    Split out of :func:`unigram_train` because (word, freq) is the
    ADDITIVELY MERGEABLE training state: a streamed corpus maintains
    it per micro-batch with one groupBy-sum (like the NB word counts
    in ``streaming_nb_model_cdc``) and retrains the vocabulary-sized
    EM from the merged relation — the corpus is never re-read
    (``plans/streaming_queries.py::streaming_unigram_cdc``).

    Returns ``(vocab, report)``:

    * ``vocab`` — the final model ``(piece, cnt, cost)`` with cost
      under the final total (the rows a tokenizer ships),
    * ``report`` — one row per round ``(round, corpus_cost,
      model_pieces, model_total)``: the exact corpus Viterbi cost
      under that round's model — the fit certificate (hard-EM drives
      it down; a flat or rising ladder says the init was already the
      fixpoint).

    The corpus text is scanned exactly once (``word_freqs`` spills the
    (word, freq) frame); every round after that is vocabulary-sized.

    Round state (vocab, best-segmentation frames) spills to parquet —
    the louvain stable-storage discipline; every per-round frame is
    vocabulary-sized.  ``spill=False`` keeps every round frame lazy
    (no parquet round-trips, no extra Spark jobs) — right for a
    SHALLOW retrain consumed by exactly one downstream action, e.g.
    the per-micro-batch rounds=1 retrain in streaming_unigram_cdc,
    where five per-training spill jobs would dominate the batch; deep
    training keeps the default (lineage across many rounds must not
    re-execute)."""
    from financial_data_stream_processing_engine_spark.io_utils import scratch_dir
    from financial_data_stream_processing_engine_spark.operators.graph import (
        _iterative_gc_hint,
    )

    spark = words_df.sparkSession
    spill_rounds = spill
    if spill_rounds:
        root = scratch_dir("unigram_spill_")

        def spill(d: DataFrame, name: str) -> DataFrame:  # noqa: F811
            path = os.path.join(root, name)
            d.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

    else:
        # lazy rounds: no per-frame jobs; the ONE materialization is
        # the final vocabulary below (without it, the vocab lineage
        # would re-execute inside every broadcast that consumes it)
        def spill(d: DataFrame, name: str) -> DataFrame:
            return d

    words = spill(words_df, "words")
    vocab = spill(init_vocab(words), "v0")
    # char inventory = v0's single-character pieces: init_vocab keeps
    # every length-1 substring unconditionally (the `length == 1 |
    # cnt >= MIN_COUNT` filter), and every character of every bounded
    # word IS a (start, 1) grid slot — so the re-seed floor reads off
    # the already-spilled v0 instead of paying its own corpus-
    # vocabulary pass + distinct exchange + spill job (r17; the
    # retired :func:`_char_inventory` computed the same set
    # independently)
    chars = vocab.where(F.length("piece") == 1).select("piece")
    vocabs: list[DataFrame] = [vocab]
    bests: list[DataFrame] = []
    for r in range(rounds):
        _iterative_gc_hint(spark)
        tot = vocab.agg(F.sum("cnt").cast("long").alias("t"))
        best = spill(viterbi_best(words, _piece_costs(vocab, tot)), f"b{r}")
        bests.append(best)
        usage = _usage(best)
        vocab = spill(
            usage.unionByName(
                chars.join(usage.select("piece"), ["piece"], "left_anti").select(
                    "piece", F.lit(1).cast("long").alias("cnt")
                )
            ),
            f"v{r + 1}",
        )
        vocabs.append(vocab)
    report = None
    for r, best in enumerate(bests):
        row = (
            best.agg(
                F.sum(F.col("freq") * F.col("cost"))
                .cast("long")
                .alias("corpus_cost")
            )
            .crossJoin(
                vocabs[r].agg(
                    F.count(F.lit(1)).cast("long").alias("model_pieces"),
                    F.sum("cnt").cast("long").alias("model_total"),
                )
            )
            .select(
                F.lit(r).cast("int").alias("round"),
                "corpus_cost",
                "model_pieces",
                "model_total",
            )
        )
        report = row if report is None else report.unionByName(row)
    if not spill_rounds:
        # the model total rides the final checkpoint's own job (r18,
        # the Observation idiom): every consumer broadcast of the cost
        # frame re-executes the crossJoined tot subplan on unbroken
        # lineage — a literal 1-row frame read off the checkpoint job
        # makes that re-execution free.  Exact: sum over the same
        # materialized rows the frame serves.
        from pyspark.sql import Observation

        obs = Observation()
        vocab = vocab.observe(
            obs, F.sum("cnt").cast("long").alias("t")
        ).localCheckpoint(eager=True)
        tot_k = spark.createDataFrame([(obs.get["t"],)], "t long")
    else:
        tot_k = vocab.agg(F.sum("cnt").cast("long").alias("t"))
    final_vocab = _piece_costs(vocab, tot_k).select(
        "piece", "cnt", F.col("qcost").alias("cost")
    )
    return final_vocab, report


def unigram_segment(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document segmentation accounting under a trained vocabulary:
    one Viterbi pass over the distinct (bounded) words, joined back to
    per-doc word occurrence counts — ``(doc_id, n_words, n_pieces,
    total_cost)``.  The corpus text is scanned ONCE: the distinct-word
    frame Viterbi needs is re-aggregated from the per-doc counts (the
    shared (doc_id, word) aggregate subtree is plan-identical in both
    branches, so Catalyst reuses its exchange rather than re-reading
    the corpus — pinned in tests/test_unigram.py); the lattice fan-out
    is vocabulary-sized."""
    tot = vocab.agg(F.sum("cnt").cast("long").alias("t"))
    costs = _piece_costs(vocab, tot)
    per_doc = (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("word"),
        )
        .where(F.length("word") <= MAX_WORD_LEN)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    words = per_doc.groupBy("word").agg(F.sum("n").cast("long").alias("freq"))
    best = viterbi_best(words, costs)
    return (
        per_doc.join(best.select("word", "n_parts", "cost"), ["word"])
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("n_parts")).cast("long").alias("n_pieces"),
            F.sum(F.col("n") * F.col("cost")).cast("long").alias("total_cost"),
        )
    )

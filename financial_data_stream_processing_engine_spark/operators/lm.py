"""N-gram language-model quality scoring (CCNet/Gopher-style filter).

The standard pretraining-curation signal the heuristic quality score
(operators/text.py::with_text_stats) cannot give: how *fluent* a
document is under a small language model trained on a trusted
reference slice.  CCNet buckets Common-Crawl documents by the
perplexity of a Wikipedia-trained 5-gram KenLM; the Gopher/MassiveText
pipeline applies the same idea as a filter.  This module is the
engine-exact distributed restatement of that recipe:

* **Model**: a bigram LM with add-one (Laplace) smoothing over
  lowercase whitespace tokens —

      P(v | u) = (c(u,v) + 1) / (c(u) + V)

  where ``c`` are reference-slice bigram/context counts and ``V`` the
  reference vocabulary size.  Counts-based smoothing keeps every
  probability a ratio of two exact integers, so each P is ONE
  correctly-rounded IEEE division — identical in any engine.

* **Score**: the per-document MEAN transition probability (arithmetic
  mean of P over the document's bigrams), a RATIONAL fluency
  surrogate for perplexity.  True perplexity is
  ``exp(-mean log P)`` — a transcendental whose last-ulp behavior is
  libm-specific, the exact reason the tf·idf and BM25 operators use
  rational idf surrogates (operators/text.py::tfidf_top_terms).  The
  mean keeps the same direction (fluent text has high-probability
  transitions, gibberish has floor-probability ones); it weighs one
  very-improbable bigram less severely than the geometric mean — a
  documented, deterministic variant, not an approximation error.
  Per-document summation quantizes each P to the 1e-9 grid and sums
  the resulting integers exactly (functions/numeric.py::qint), so the
  score is bit-identical at any parallelism and in any engine.

Scale shape: training is two groupBys over the reference slice's
bigrams (map-side combinable, vocabulary-sized results); scoring is
one explode and two joins keyed on vocabulary-sized tables — AQE
broadcasts them at survey scale, and at 100 TB the fallback is a
shuffle join on the token key, still linear in corpus bigrams.  No
Python anywhere: the whole path is codegen'd expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from financial_data_stream_processing_engine_spark.functions.numeric import qint

#: bucket thresholds on the mean transition probability — the fixture
#: corpus's terciles (sf0.01 p33≈0.0329, p66≈0.0348), mirroring how
#: CCNet buckets by reference-corpus perplexity terciles.  Real
#: deployments recalibrate against their own reference slice.
LM_BUCKETS: tuple[tuple[str, float], ...] = (("high", 3.5e-2), ("mid", 3.3e-2))


def _bigrams(text: Column, out_u: str = "u", out_v: str = "v") -> Column:
    """array<struct<u,v>> of adjacent lowercase whitespace-token pairs.

    Empty tokens (consecutive/leading/trailing spaces) are dropped
    BEFORE pairing, for two reasons: the vocabulary the smoothing
    denominator uses excludes '' (mixing a ''-inclusive c(u) with a
    ''-exclusive V would be incoherent), and whitespace formatting
    should not change a document's transition count — 'a  b' and
    'a b' score identically."""
    toks = F.filter(F.split(F.lower(text), " "), lambda t: t != F.lit(""))
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias(out_u), F.slice(toks, 2, n - 1).alias(out_v)
        ),
    ).otherwise(F.array())


def bigram_lm_counts(ref: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the counts model on a reference slice.

    Returns ``(pair_counts(u, v, c_uv), context_counts(u, c_u),
    vocab_size(v_size))`` — the complete add-one bigram model.  Two
    map-side-combinable aggregations plus a distinct over unigrams;
    results are vocabulary-sized, never corpus-sized.
    """
    pairs = ref.select(F.explode(_bigrams(F.col(text_col))).alias("b")).select(
        F.col("b.u").alias("u"), F.col("b.v").alias("v")
    )
    pair_counts = pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c_uv"))
    context_counts = pairs.groupBy("u").agg(F.count(F.lit(1)).alias("c_u"))
    vocab = (
        ref.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("t"))
        .where(F.col("t") != "")
        .agg(F.count_distinct("t").alias("v_size"))
    )
    return pair_counts, context_counts, vocab


def with_lm_score(
    df: DataFrame,
    pair_counts: DataFrame,
    context_counts: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: tuple[tuple[str, float], ...] = LM_BUCKETS,
) -> DataFrame:
    """Score every document under the trained model →
    (id, n_bigrams, n_unseen_bigrams, mean_tp, lm_bucket).

    ``mean_tp`` is the 1e-9-grid mean transition probability (NULL for
    documents with fewer than two tokens, which have no transitions);
    ``n_unseen_bigrams`` counts transitions never seen in the
    reference (they score the smoothing floor 1/(c(u)+V));
    ``lm_bucket`` is the CCNet-style tercile label ('high'/'mid'/
    'low', 'und' when unscorable).
    """
    bg = df.select(
        F.col(id_col), F.explode(_bigrams(F.col(text_col))).alias("b")
    ).select(id_col, F.col("b.u").alias("u"), F.col("b.v").alias("v"))
    scored = (
        bg.join(pair_counts, ["u", "v"], "left")
        .join(context_counts, ["u"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.col("c_uv").isNull().cast("long").alias("unseen"),
            (
                (F.coalesce(F.col("c_uv"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col("c_u"), F.lit(0)) + F.col("v_size")).cast("double")
            ).alias("p"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("unseen").alias("n_unseen_bigrams"),
        (F.sum(qint(F.col("p"))).cast("double") * F.lit(1e-9)).alias("sum_tp"),
    )
    mean_tp = F.col("sum_tp") / F.col("n_bigrams")
    bucket = F.lit("low")
    for name, lo in reversed(buckets):
        bucket = F.when(mean_tp >= F.lit(lo), F.lit(name)).otherwise(bucket)
    out = per_doc.select(
        id_col,
        "n_bigrams",
        "n_unseen_bigrams",
        mean_tp.alias("mean_tp"),
        bucket.alias("lm_bucket"),
    )
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("n_unseen_bigrams"), F.lit(0))
            .cast("long")
            .alias("n_unseen_bigrams"),
            F.col("mean_tp").cast("double").alias("mean_tp"),
            F.coalesce(F.col("lm_bucket"), F.lit("und")).alias("lm_bucket"),
        )
    )


def lm_quality_score(
    docs: DataFrame,
    ref_filter: Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train-on-slice + score-everything convenience wrapper.

    ``ref_filter`` selects the trusted reference slice (default: every
    fifth document by id — the deterministic stand-in for 'a Wikipedia
    dump' in the fixture world).
    """
    if ref_filter is None:
        ref_filter = F.col(id_col) % 5 == 0
    ref = docs.where(ref_filter)
    pair_counts, context_counts, vocab = bigram_lm_counts(ref, text_col=text_col)
    return with_lm_score(
        docs, pair_counts, context_counts, vocab, id_col=id_col, text_col=text_col
    )


def nb_lang_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    pos_label: str = "en",
    holdout: Column | None = None,
) -> DataFrame:
    """Multinomial Naive Bayes document classifier, counts-only and
    engine-exact — the learned complement to the heuristic
    ``text.with_language_id`` and the model pair of the bigram LM
    above (fastText-style classifiers fill both the language-ID and
    quality-filter roles in CCNet/LLaMA-era curation pipelines; NB is
    the classic counts-based form whose every likelihood is a ratio of
    two exact integers).

    Model (binary, pos = ``label_col == pos_label``): add-one token
    likelihoods trained on the non-holdout slice,

        P(w | c) = (count(w, c) + 1) / (total_tokens_c + V).

    Decision score: the per-document MEAN of
    ``P(w|pos) − P(w|neg)`` over its tokens — each term is two
    correctly-rounded IEEE divisions and one subtraction, summed
    exactly on the 1e-9 grid (functions/numeric.py::qint), so the
    score is bit-identical at any parallelism and in any engine.  This
    is the equal-prior linear-probability decision rule: the rational
    surrogate for the log-likelihood-ratio sign test, the same
    transcendental-free trade the LM score above and the tf·idf/BM25
    rational idf make (ln() differs at the last ulp between engines).
    Out-of-vocabulary tokens score the smoothing-floor difference.

    Returns one row per input document: (id, n_tokens,
    n_oov_tokens, mean_delta, nb_pred, label_bin, is_holdout) —
    ``nb_pred`` ∈ {pos_label, 'other', 'und'} ('und' when the document
    has no tokens), ``label_bin`` the binarized true label, so
    holdout accuracy is one filter+agg away.

    Scale shape: training is one map-side-combinable groupBy over
    train tokens (vocabulary-sized result) plus a 3-scalar totals row;
    scoring is one explode + one vocabulary-keyed join (the model join
    carries an explicit broadcast hint — a deliberate, plan-pinned
    choice: the classifier vocabulary is model-sized, and keeping the
    scoring fully map-side is the point; a model too large to
    broadcast should be pruned to a bounded vocabulary, not shuffled)
    + one per-doc aggregation.  No Python anywhere — the whole path is
    codegen'd expressions.
    """
    if holdout is None:
        holdout = F.col(id_col) % 5 == 0
    word_counts, totals = nb_train(
        docs,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        pos_label=pos_label,
        holdout=holdout,
    )
    return nb_score(
        docs,
        word_counts,
        totals,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        pos_label=pos_label,
        holdout=holdout,
    )


def _nb_tokens(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    pos_label: str,
    holdout: Column,
) -> DataFrame:
    """(id, is_pos, is_holdout, t) token rows — the shared tokenize
    step of training and scoring (lower + space split, empties out)."""
    return docs.select(
        F.col(id_col),
        (F.col(label_col) == F.lit(pos_label)).alias("is_pos"),
        holdout.alias("is_holdout"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("t"),
    ).where(F.col("t") != "")


def nb_train(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    pos_label: str = "en",
    holdout: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The training half of :func:`nb_lang_classifier`: one map-side-
    combinable groupBy over the non-holdout token stream → the
    vocabulary-sized ``word_counts(t, c_pos, c_neg)`` model plus the
    3-scalar ``totals(tot_pos, tot_neg, v_size)`` row.  Factored out
    so the streaming gate can train ONCE batch-side (localCheckpoint
    the two frames) and score micro-batches under the static model —
    the same train-once/score-continuously split as the bigram LM's
    ``bigram_lm_counts``/``with_lm_score`` pair."""
    if holdout is None:
        holdout = F.col(id_col) % 5 == 0
    train = _nb_tokens(docs, id_col, text_col, label_col, pos_label, holdout).where(
        ~F.col("is_holdout")
    )
    word_counts = train.groupBy("t").agg(
        F.sum(F.col("is_pos").cast("long")).alias("c_pos"),
        F.sum((~F.col("is_pos")).cast("long")).alias("c_neg"),
    )
    totals = train.agg(
        F.sum(F.col("is_pos").cast("long")).alias("tot_pos"),
        F.sum((~F.col("is_pos")).cast("long")).alias("tot_neg"),
        F.count_distinct("t").alias("v_size"),
    )
    return word_counts, totals


def nb_score(
    docs: DataFrame,
    word_counts: DataFrame,
    totals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    pos_label: str = "en",
    holdout: Column | None = None,
) -> DataFrame:
    """The scoring half of :func:`nb_lang_classifier`: explode the
    documents' tokens, join the vocabulary-keyed model, aggregate the
    per-token likelihood differences per document on the 1e-9 grid.
    Scoring is PER-DOCUMENT (a doc's tokens live inside its own rows),
    so the result is batching-independent under a static model — the
    property the streaming gate's shared-oracle argument rests on."""
    if holdout is None:
        holdout = F.col(id_col) % 5 == 0
    tok = _nb_tokens(docs, id_col, text_col, label_col, pos_label, holdout)
    p_pos = (F.coalesce(F.col("c_pos"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("tot_pos") + F.col("v_size")
    ).cast("double")
    p_neg = (F.coalesce(F.col("c_neg"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("tot_neg") + F.col("v_size")
    ).cast("double")
    scored = (
        # the model is vocabulary-sized (bounded by the training
        # corpus's distinct tokens, not the scored corpus), so the
        # broadcast hint makes per-doc/per-batch scoring fully
        # map-side — no shuffle of the scored tokens at any scale
        tok.join(F.broadcast(word_counts), ["t"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.col("c_pos").isNull().cast("long").alias("oov"),
            (p_pos - p_neg).alias("delta"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").alias("n_oov_tokens"),
        (F.sum(qint(F.col("delta"))).cast("double") * F.lit(1e-9)).alias("sum_delta"),
    )
    return (
        docs.select(
            F.col(id_col),
            (F.col(label_col) == F.lit(pos_label)).alias("is_pos"),
            holdout.alias("is_holdout"),
        )
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_oov_tokens"), F.lit(0))
            .cast("long")
            .alias("n_oov_tokens"),
            (F.col("sum_delta") / F.col("n_tokens")).cast("double").alias("mean_delta"),
            F.when(F.col("n_tokens").isNull(), F.lit("und"))
            .when(
                F.col("sum_delta") / F.col("n_tokens") > 0, F.lit(pos_label)
            )
            .otherwise(F.lit("other"))
            .alias("nb_pred"),
            F.when(F.col("is_pos"), F.lit(pos_label))
            .otherwise(F.lit("other"))
            .alias("label_bin"),
            F.col("is_holdout"),
        )
    )


def cramer3_exprs() -> tuple[str, list[str]]:
    """Engine-neutral SQL for solving a symmetric 3×3 linear system by
    Cramer's rule over DOUBLE columns named ``C11..C33`` (the upper
    triangle of the CENTERED covariance-form Gram matrix — ``Cij``
    with i ≤ j) and ``d1..d3``: returns ``(det_expr, [num1..num3])``
    with ``coef_i = num_i / det``.  Each determinant is the 6-term
    permutation expansion emitted as ONE left-associated chain
    ``0.0e0 + t1 - t2 + …`` with a fixed term order, every term a
    left-associated 3-factor product — Spark SQL and DuckDB build the
    identical IEEE tree, so the solve is bit-identical cross-engine
    (the shared-expression-text contract of the audio oracles).

    Why 3×3 CENTERED and not the raw 4×4: the raw normal-equations
    determinant subtracts ~1e90-scale products whose true difference
    is variance-sized — double precision cancels to garbage (measured:
    det → 0 on the fixture, NULL coefficients).  The centered moments
    ``Cij = n·Σxixj − Σxi·Σxj`` cancel in EXACT integer arithmetic
    before any float exists, so the float solve only faces the mild
    (correlation-level) conditioning of the covariance matrix."""
    from itertools import permutations

    def c(i: int, j: int) -> str:
        return f"C{min(i, j)}{max(i, j)}"

    def det(cell) -> str:
        parts = ["0.0e0"]
        for p in permutations(range(1, 4)):
            pl = list(p)
            inv = sum(
                1 for i in range(3) for j in range(i + 1, 3) if pl[i] > pl[j]
            )
            prod = " * ".join(cell(r, pl[r - 1]) for r in range(1, 4))
            parts.append(("+ " if inv % 2 == 0 else "- ") + prod)
        return " ".join(parts)

    base = det(lambda r, col: c(r, col))
    nums = [
        det(lambda r, col, i=i: f"d{r}" if col == i else c(r, col))
        for i in range(1, 4)
    ]
    return base, nums


#: quantization exponent for the probe's features/target — coarser
#: than the global 1e-9 grid so the exact covariance moments
#: ``n·Σxixj − Σxi·Σxj`` stay inside decimal(38,0)/HUGEINT through
#: ~10¹² rows (ratio-valued features need nowhere near 1e-9).
OLS_QSCALE = 6

#: the grid constant G = 10**OLS_QSCALE and its reciprocal, as SQL
#: literal TEXT derived from the one scale constant — both engines
#: parse the same string to the same double, and changing OLS_QSCALE
#: can no longer silently desynchronize the literals (ADVICE r12).
OLS_G_SQL = f"{float(10**OLS_QSCALE):.1f}e0"  # "1000000.0e0" at scale 6
OLS_GRID_SQL = f"1e-{OLS_QSCALE:02d}"  # "1e-06" at scale 6

#: shared prediction expression over the quantized feature columns and
#: the broadcast coefficients — one text, both engines, same IEEE tree.
OLS_PRED_SQL = (
    "c0 * CAST(q0 AS DOUBLE) + c1 * CAST(q1 AS DOUBLE)"
    " + c2 * CAST(q2 AS DOUBLE) + c3 * CAST(q3 AS DOUBLE)"
)

#: shared intercept expression over the exact first-moment columns —
#: the centered solve recovers w0 from the means: in the quantized
#: model ``c0 = (Σqy − c1·Σq1 − c2·Σq2 − c3·Σq3) / n / G`` with G the
#: grid constant (q0 ≡ G for every row).
OLS_C0_SQL = (
    "((CAST(sy AS DOUBLE) - c1 * CAST(s1 AS DOUBLE)"
    " - c2 * CAST(s2 AS DOUBLE) - c3 * CAST(s3 AS DOUBLE))"
    f" / CAST(n AS DOUBLE)) / {OLS_G_SQL}"
)


def ols_probe(
    df: DataFrame,
    feature_cols: tuple[str, str, str],
    target_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-arithmetic ordinary-least-squares probe — fit
    ``target ≈ w0 + w1·x1 + w2·x2 + w3·x3`` over the whole frame and
    return per-row predictions and residuals (the fastText-style
    "distill the gate into a linear model" stage: a linear probe over
    engineered signals tells a curation pipeline how much of a quality
    gate a cheap model can reproduce, and its residual outliers are
    the documents worth a second look).

    Distributed shape: ONE map-side-combinable aggregation builds all
    the moments — features and target quantize to the 1e-6 grid
    (:data:`OLS_QSCALE`; ratio-scale signals need nowhere near the
    global 1e-9 grid, and the coarser grid is what bounds the centered
    moments through ~10¹² rows), raw sums and pairwise-product sums
    accumulate as exact decimal(38,0) integers, and the CENTERED
    covariance-form moments ``Cij = n·Σqiqj − Σqi·Σqj`` are computed
    in the SAME exact integer domain — the catastrophic cancellation
    that kills a raw normal-equations determinant in doubles happens
    here losslessly (measured: the raw 4×4 det cancels to exactly 0 on
    the fixture).  Each centered moment casts to double ONCE
    (correctly rounded); the 3×3 solve is Cramer's rule stated as
    shared SQL text (:func:`cramer3_exprs`) on the one-row moment
    frame — no driver-side linear algebra, no collect — the intercept
    is recovered from the exact first moments (:data:`OLS_C0_SQL`),
    and the coefficient row broadcast-joins back onto the rows for
    predictions.  Rows with a NULL feature or target are excluded from
    BOTH the fit and the output (the oracle states the same filter).
    A singular covariance matrix (collinear features) yields NULL
    coefficients (NULLIF on the determinant) rather than a crash.

    Returns (id, target, pred, residual, c0..c3) — coefficients
    repeated per row (constant columns) so a value hash certifies the
    solve itself, not just the residual arithmetic.  ``target`` is the
    1e-6-grid value of ``target_col``."""
    x1, x2, x3 = feature_cols
    filt = (
        F.col(x1).isNotNull()
        & F.col(x2).isNotNull()
        & F.col(x3).isNotNull()
        & F.col(target_col).isNotNull()
    )
    G = 10**OLS_QSCALE
    q = df.where(filt).select(
        F.col(id_col),
        F.lit(G).cast("decimal(38,0)").alias("q0"),
        qint(F.col(x1), OLS_QSCALE).alias("q1"),
        qint(F.col(x2), OLS_QSCALE).alias("q2"),
        qint(F.col(x3), OLS_QSCALE).alias("q3"),
        qint(F.col(target_col), OLS_QSCALE).alias("qy"),
    )
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for i in (1, 2, 3):
        aggs.append(F.sum(F.col(f"q{i}")).alias(f"s{i}"))
    aggs.append(F.sum(F.col("qy")).alias("sy"))
    for i in (1, 2, 3):
        for j in (1, 2, 3):
            if i <= j:
                aggs.append(F.sum(F.col(f"q{i}") * F.col(f"q{j}")).alias(f"a{i}{j}"))
        aggs.append(F.sum(F.col(f"q{i}") * F.col("qy")).alias(f"b{i}"))
    mom = q.agg(*aggs)
    # centered covariance-form moments — EXACT decimal arithmetic,
    # cast to double once at the end
    cent = []
    for i in (1, 2, 3):
        for j in (1, 2, 3):
            if i <= j:
                cent.append(
                    (F.col("n") * F.col(f"a{i}{j}") - F.col(f"s{i}") * F.col(f"s{j}"))
                    .cast("double")
                    .alias(f"C{i}{j}")
                )
        cent.append(
            (F.col("n") * F.col(f"b{i}") - F.col(f"s{i}") * F.col("sy"))
            .cast("double")
            .alias(f"d{i}")
        )
    cmom = mom.select(*cent, "n", "s1", "s2", "s3", "sy")
    det_s, nums = cramer3_exprs()
    coef = cmom.select(
        "n", "s1", "s2", "s3", "sy",
        *[
            (F.expr(nums[i]) / F.expr(f"nullif({det_s}, 0.0e0)")).alias(f"c{i + 1}")
            for i in range(3)
        ],
    ).select(F.expr(OLS_C0_SQL).alias("c0"), "c1", "c2", "c3")
    grid = F.lit(float(10**-OLS_QSCALE))
    pred_q = F.expr(OLS_PRED_SQL)
    return q.crossJoin(F.broadcast(coef)).select(
        F.col(id_col),
        (F.col("qy").cast("double") * grid).alias("target"),
        (pred_q * grid).alias("pred"),
        ((F.col("qy").cast("double") - pred_q) * grid).alias("residual"),
        "c0", "c1", "c2", "c3",
    )


def ols_fit_report(probe_df: DataFrame) -> DataFrame:
    """Goodness-of-fit report over an :func:`ols_probe` result — the
    model-evaluation row a curation pipeline reads before trusting the
    cheap probe (a high R² says the linear model can replace the gate
    at scan time; a low one says the gate's signal is genuinely
    nonlinear): one row (n_docs, ybar, sse, sst, r2, c0..c3).

    Exactness: the probe's ``target``/``residual``/coefficients are
    deterministic doubles (hash-proven cross-engine), so every derived
    quantity here is too — targets and squared deviations quantize to
    the 1e-9 grid and sum EXACTLY (decimal(38,0)), the mean and R² are
    single IEEE divisions, and ``dev = target − ybar`` is one subtract
    of two deterministic doubles.  Two aggregation passes with the
    one-row mean broadcast between them — nothing driver-side, nothing
    order-dependent.  R² is NULL when SST is 0 (a constant target has
    no variance to explain — NULLIF, not a crash)."""
    from financial_data_stream_processing_engine_spark.functions.numeric import QSCALE

    grid = F.lit(float(10**-QSCALE))
    base = probe_df.select("target", "residual", "c0", "c1", "c2", "c3")
    m1 = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            (F.sum(qint(F.col("target"))).cast("double") * grid)
            / F.count(F.lit(1)).cast("double")
        ).alias("ybar"),
        (F.sum(qint(F.col("residual") * F.col("residual"))).cast("double") * grid)
        .alias("sse"),
        F.first("c0").alias("c0"),
        F.first("c1").alias("c1"),
        F.first("c2").alias("c2"),
        F.first("c3").alias("c3"),
    )
    dev = F.col("target") - F.col("ybar")
    m2 = (
        base.select("target")
        .crossJoin(F.broadcast(m1.select("ybar")))
        .agg(
            (F.sum(qint(dev * dev)).cast("double") * grid).alias("sst")
        )
    )
    return m1.crossJoin(F.broadcast(m2)).select(
        "n_docs",
        "ybar",
        "sse",
        "sst",
        (F.lit(1.0) - F.col("sse") / F.expr("nullif(sst, 0.0e0)")).alias("r2"),
        "c0", "c1", "c2", "c3",
    )

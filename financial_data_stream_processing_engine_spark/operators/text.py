"""Text-analysis operators for LLM-data pipelines.

All hot-path computation is built-in expressions (split/regexp/array
functions) — JVM-side, whole-stage-codegen, no Python.  At 100 TB these
are embarrassingly parallel per-row maps: no shuffle at all.

Operators: tokenization + shingling, text statistics / quality score,
marker-based language ID, rolling-hash document fingerprinting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from financial_data_stream_processing_engine_spark.functions.exprs import bind

# ---------------------------------------------------------------------------
# tokenization / shingling
# ---------------------------------------------------------------------------


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the fixture's documents are space-separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles ('w1 w2 w3' strings).

    Documents shorter than ``n`` tokens contribute their whole text as
    a single shingle.  Pure expression: sequence → slice → concat_ws.
    The token array is ``bind``-bound so the split runs once per row,
    not once per shingle position (functions.exprs — measured 4.3× on
    this operator at sf0.1, and the gap grows with document length).
    """
    return bind(tokens(text), lambda t: _shingles_of(t, n))


def _shingles_of(toks: Column, n: int) -> Column:
    """Shingle array over an already-bound token array."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def ngrams_with_repeats(text: Column | str, n: int = 3) -> Column:
    """ALL n-token shingles, duplicates preserved — the multiset the
    repetition detector counts over (unlike :func:`shingles`, which is
    the dedup/similarity set form).  Same once-per-row token binding
    as :func:`shingles`."""
    def over(toks: Column) -> Column:
        m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), m), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        )

    return bind(tokens(text), over)


#: PII patterns — written to the common Java-regex / RE2 subset so the
#: identical pattern string runs in Spark and the DuckDB oracle.
#: Order is semantic: ipv4 runs BEFORE phone because the loose phone
#: pattern also matches many dotted IPv4 literals (192.168.100.42) —
#: redacting IPs first types those spans <IP>, and the per-category
#: counts are taken on the progressively-redacted text so every count
#: equals the number of placeholders that category actually emitted.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Replace email / phone / IPv4 literals with typed placeholder
    tokens and count the hits per category — the scrubbing pass every
    pretraining pipeline runs before anything else sees the bytes.

    Pure per-row ``regexp_replace`` / ``regexp_count`` expressions: no
    shuffle, no Python, linear scan; the patterns live in
    :data:`PII_PATTERNS` in the Java∩RE2 regex subset so the DuckDB
    oracle applies the very same strings.

    Each category's count is taken on the text AS IT EXISTS when that
    category's replace runs (after the earlier categories'), so
    ``n_<cat>`` always equals the number of ``<CAT>`` placeholders in
    the output — counting every pattern against the ORIGINAL text
    would double-count spans that two patterns overlap (an IPv4 also
    matched by the loose phone pattern) and report categories that
    emitted nothing.
    """
    out = df
    redacted = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(redacted, F.lit(pat)))
        redacted = F.regexp_replace(redacted, pat, repl)
    return out.withColumn(out_col, redacted)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_ratio: float = 0.1,
) -> DataFrame:
    """Boilerplate/looping detector: the share of a document's n-gram
    multiset taken by its single most frequent n-gram.  Returns
    (doc_id, n_ngrams, top_ngram_count, repetition_ratio, repetitive).

    explode → two-level aggregate, both stages map-side combinable; one
    shuffle on the doc id (already the natural distribution).
    """
    ng = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ngrams_with_repeats(F.col(text_col), n)).alias("g"),
    )
    per_gram = ng.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_ngrams"), F.max("c").alias("top_ngram_count")
    )
    ratio = F.col("top_ngram_count") / F.col("n_ngrams")
    return per_doc.select(
        "doc_id",
        "n_ngrams",
        "top_ngram_count",
        ratio.cast("double").alias("repetition_ratio"),
        (ratio >= F.lit(flag_ratio)).alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# statistics & quality
# ---------------------------------------------------------------------------

#: tiny English stopword list (public, standard head-of-Zipf words).
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "for on with as at by from".split()
)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-document statistics columns.

    ``n_chars_actual``, ``n_tokens``, ``n_unique_tokens``,
    ``avg_token_len``, ``punct_ratio``, ``digit_ratio``,
    ``stopword_ratio``, ``quality_score``.

    The quality score is a transparent heuristic in [0,1] (length band,
    lexical diversity, stopword plausibility, low punctuation/digit
    noise) of the kind used for pretraining-corpus filtering — each
    component is exposed so downstream filters can recombine them.
    """
    text = F.col(text_col)
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct-stopword hits
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    digits = F.size(F.regexp_extract_all(text, F.lit(r"[0-9]"), 0))

    # try_divide everywhere: an empty document makes n_chars 0, and a
    # plain `/` under ANSI mode would fail the whole job for one
    # degenerate row (DIVIDE_BY_ZERO).  Ratios are NULL when undefined.
    df = (
        df.withColumn("n_chars_actual", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_unique_tokens", F.size(F.array_distinct(toks)).cast("long"))
        .withColumn(
            "avg_token_len",
            F.try_divide((n_chars - (n_tokens - 1)).cast("double"), n_tokens),
        )
        .withColumn("punct_ratio", F.try_divide(punct.cast("double"), n_chars))
        .withColumn("digit_ratio", F.try_divide(digits.cast("double"), n_chars))
        .withColumn(
            "stopword_ratio",
            F.try_divide(n_stop.cast("double"), F.size(F.array_distinct(toks))),
        )
    )
    # quality: each component clamped to [0,1], equal-weighted.
    length_ok = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    diversity = F.col("n_unique_tokens") / F.col("n_tokens")
    low_noise = F.greatest(
        F.lit(0.0), F.lit(1.0) - 4.0 * (F.col("punct_ratio") + F.col("digit_ratio"))
    )
    return df.withColumn(
        "quality_score",
        ((length_ok + diversity + low_noise) / F.lit(3.0)).cast("double"),
    )


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish subword estimate)
# ---------------------------------------------------------------------------

#: BPE-style pre-tokenizer pattern (the GPT-2 pre-tokenizer family,
#: restricted to constructs RE2 and Java regex agree on byte-for-byte):
#: a piece is a letter run, a digit run, or a punctuation run.
BPE_PIECE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]+"

#: average characters per BPE token in public tokenizer docs — the
#: standard "~4 chars/token" estimator used for budget planning.
CHARS_PER_BPE_TOKEN = 4.0


def with_token_counts(
    df: DataFrame, text_col: str = "text", id_col: str | None = None
) -> DataFrame:
    """Token-count estimators per document, all engine-side:

    * ``n_ws_tokens``    — whitespace tokens (exact);
    * ``n_bpe_pieces``   — pre-tokenizer pieces (letter / digit /
      punctuation runs): the upper-bound shape a byte-pair tokenizer
      starts from — every real BPE token boundary is inside one piece;
    * ``n_tokens_est``   — the ceil(chars/4) budget estimator;
    * ``chars_per_piece``— payload density, a cheap quality signal;
    * ``n_bpe_tokens``   — only when ``id_col`` is given: the EXACT
      token count under the real merges-table BPE
      (:func:`bpe_doc_token_counts` — word-cache walk over distinct
      pieces, per-occurrence arithmetic JVM-side).

    Without ``id_col`` everything is a pure per-row expression (regexp
    + arithmetic): no shuffle, scales linearly, and the pattern is
    deliberately RE2-compatible so external engines reproduce it
    byte-for-byte.  The exact count adds one vocabulary-sized join —
    a LEFT join, so rows survive even when ``id_col`` is NULL (their
    exact count is 0, the empty-document convention).  ``id_col`` is
    assumed unique per row, as for any per-document id; duplicate ids
    would multiply through the join.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    pieces = F.regexp_extract_all(text, F.lit(BPE_PIECE_PATTERN), 0)
    n_pieces = F.size(pieces)
    out = (
        df.withColumn("n_ws_tokens", F.size(tokens(text)).cast("long"))
        .withColumn("n_bpe_pieces", n_pieces.cast("long"))
        .withColumn(
            "n_tokens_est",
            F.ceil(n_chars.cast("double") / F.lit(CHARS_PER_BPE_TOKEN)).cast("long"),
        )
        .withColumn(
            "chars_per_piece",
            F.try_divide(n_chars.cast("double"), n_pieces.cast("double")),
        )
    )
    if id_col is not None:
        exact = bpe_doc_token_counts(df, id_col, text_col=text_col)
        out = out.join(exact, id_col, "left").withColumn(
            "n_bpe_tokens", F.coalesce(F.col("n_bpe_tokens"), F.lit(0))
        )
    return out


# ---------------------------------------------------------------------------
# language identification (marker heuristic)
# ---------------------------------------------------------------------------

#: distinct high-frequency marker words per language (public stopword
#: heads); CJK is detected by charset before word markers apply.
LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is that for with was".split(),
    "de": "der die das und ist nicht ein eine mit von".split(),
    "es": "el la los las es de que en una para".split(),
    "fr": "le la les est et une dans que pour des".split(),
}


def with_language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: CJK charset test, then argmax of
    marker-word hit counts (ties → 'en', then lexicographic).

    A character-n-gram model is the heavier public alternative; the
    marker method is O(row) with no state and catches the same
    head-of-Zipf signal.  Returns 'und' when nothing matches.
    """
    text = F.col(text_col)
    toks = tokens(F.lower(text))
    cjk = F.size(F.regexp_extract_all(text, F.lit(r"[一-鿿]"), 0))

    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append((lang, hits))

    # argmax via chained comparisons (4 langs — fine as an expression).
    # The strict `>` is load-bearing for tie-breaks: the FIRST language
    # reaching the max score wins, so LANG_MARKERS' insertion order
    # ('en' first, then lexicographic) IS the documented tie rule — a
    # later language only displaces an earlier one by strictly beating
    # it.  (An earlier second disjunct for the score==best case was
    # dead code: best_score > 0 implies best != 'und' already.)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        take = score > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return df.withColumn(
        out_col,
        F.when(cjk * 2 > F.length(text), F.lit("zh")).otherwise(best),
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def with_fingerprints(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprints: ``md5_full`` (exact-dup key over
    whitespace-normalized text) and ``min_shingle_fp`` (winnowing-style
    minimum shingle hash — stable under small local edits).

    md5 is used (not xxhash64) so fingerprints are portable across
    engines and runs — a practical property for dedup ledgers shared
    between systems.

    BOTH fingerprints are computed over the whitespace-NORMALIZED
    text: shingling the raw text would make the near-dup key disagree
    on whitespace-variant duplicates (two crawls of 'a b c' vs
    'a  b c') that the exact-dup key already identifies — the most
    common crawl edit must not defeat the edit-stable fingerprint.
    """
    text = F.col(text_col)
    normalized = F.regexp_replace(F.trim(text), r"\s+", " ")
    sh = shingles(normalized, n)
    return df.withColumn("md5_full", F.md5(normalized)).withColumn(
        "min_shingle_fp", F.array_min(F.transform(sh, lambda s: F.md5(s)))
    )


# ---------------------------------------------------------------------------
# tf-idf term ranking
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf with a
    RATIONAL idf: ``score = tf · (N / df)``.

    The rational form (not ``tf·ln(N/df)``) on purpose: ``ln`` differs
    in the last ulp between libm builds, breaking cross-engine bitwise
    comparison, while ``N/df`` is one IEEE division.  Ranking order is
    NOT identical to log-idf order when tf varies (the weighting is
    steeper), which is acceptable for the keyword-extraction role and
    is the documented semantic; ties break on the term text.

    Plan: explode → tf groupBy (shuffle on (doc, term)) → df groupBy
    (shuffle on term) → tf ⋈ broadcast(df) — document-frequency tables
    are vocabulary-sized, so the join adds no shuffle — → per-doc
    window top-k.  At 100 TB the vocabulary may outgrow a broadcast;
    the fallback is a shuffle join on term, still linear.
    """
    from pyspark.sql.window import Window

    words = df.select(
        id_col, F.explode(tokens(text_col)).alias("term")
    ).where(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    # no broadcast HINT on dfreq: a hint would force the broadcast at
    # any vocabulary size, defeating the documented shuffle fallback —
    # AQE broadcasts when the vocabulary is actually small and falls
    # back to the term-keyed shuffle join when it is not.  The 1-row
    # n_docs frame keeps its hint (always bounded).
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def nfc_normalize(df, text_col: str = "text", out_col: str = "text_nfc"):
    """Unicode NFC normalization of a text column — the cleanup step a
    multilingual corpus needs before tokenization/dedup (the same
    logical text arrives as composed or decomposed codepoints from
    different crawlers; fingerprints then disagree on identical text).

    Runs as an Arrow-vectorized pandas UDF over ``unicodedata``
    (Python's normalizer implements Unicode Annex #15, the same
    algorithm DuckDB's ``nfc_normalize`` implements — verified
    identical on composed/decomposed/compatibility samples).  One of
    the few justified Python-path operators: Spark has no built-in
    normalizer expression, and normalization tables are not SQL.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return df.withColumn(out_col, _nfc(F.col(text_col)))


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 for a fixed query term set →
    (doc_id, dl, tf_<term>..., score, rank).

    BM25's tf-saturation term is kept intact — score_t =
    idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) — but the idf is
    the RATIONAL surrogate (N − df + 0.5)/(df + 0.5) instead of its
    log: ln()'s last-ulp behavior is engine-specific (the tfidf entry
    makes the same trade), and the rational idf is order-preserving
    within any fixed corpus for df ≥ 1, so rankings for single-term
    scores are unchanged and multi-term totals remain a documented,
    deterministic variant.  Per-document totals are added in FIXED
    query-term order (explicit ``+`` chain, no SUM over a shuffled
    frame), so every double op is a single correctly-rounded IEEE
    instruction — bit-identical across engines and parallelism.

    Plan: one explode + one groupBy(doc) with conditional-count tf
    columns (map-side combine), one broadcast 1-row corpus-stats
    frame, top-k via TakeOrdered — linear, two shuffles, no UDFs.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    # internal columns are INDEXED (__tf_0, __df_0…): a raw query term
    # interpolated into a name that is later re-resolved with F.col
    # would parse '.' as a struct accessor and backticks not at all —
    # the term text appears only in the OUTPUT aliases, never in a
    # name that gets parsed
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count_if(F.col("term") == F.lit(t)).alias(f"__tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.count_if(F.col(f"__tf_{i}") > 0).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"__tf_{i}")
        idf = (F.col("n_docs") - F.col(f"__df_{i}") + F.lit(0.5)) / (
            F.col(f"__df_{i}") + F.lit(0.5)
        )
        s_t = F.when(tf > 0, idf * (tf * F.lit(k1 + 1.0))
                     / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)))
                     ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
    from pyspark.sql import Window

    ranked = scored.select(
        id_col,
        "dl",
        *[
            F.col(f"__tf_{i}").alias(f"tf_{t}")
            for i, t in enumerate(query_terms)
        ],
        score.alias("score"),
    )
    # rank window runs over the already-limited k rows, never the corpus
    return (
        ranked.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col))),
        )
    )


# ---------------------------------------------------------------------------
# real-merges BPE tokenization
# ---------------------------------------------------------------------------

#: A loadable byte-pair-encoding merges table (the ``merges.txt`` shape
#: every published BPE tokenizer ships): pair i is merged before pair
#: i+1.  Every composite operand is produced by an earlier merge, the
#: well-formedness property real vocabularies have by construction (a
#: token must be minted before a later merge can reference it).
DEFAULT_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("a", "n"), ("e", "r"), ("i", "n"),
    ("o", "r"), ("s", "c"), ("sc", "an"), ("o", "w"), ("l", "ow"),
    ("s", "low"), ("r", "ow"), ("a", "t"), ("c", "h"), ("b", "at"),
    ("bat", "ch"), ("or", "d"), ("ord", "er"), ("a", "l"), ("v", "al"),
    ("u", "e"), ("val", "ue"), ("e", "y"), ("k", "ey"), ("j", "o"),
    ("jo", "in"), ("h", "a"), ("ha", "s"), ("has", "h"),
)


def bpe_tokenize_pieces(
    pieces: DataFrame,
    merges: tuple[tuple[str, str], ...] = DEFAULT_BPE_MERGES,
    piece_col: str = "piece",
    out_col: str = "tokens",
) -> DataFrame:
    """Apply a REAL merges-table BPE to a frame of DISTINCT lowercase
    word pieces → adds ``out_col: array<string>``.

    Algorithm (the classic greedy BPE loop of Sennrich et al. 2016 /
    the GPT-2 reference tokenizer): start from the character sequence,
    repeatedly merge all left-to-right non-overlapping occurrences of
    the highest-priority pair present until no merge applies.  Because
    a merge's output token is minted by that merge (no earlier pair
    references it) and merging two tokens never makes their outer
    neighbours adjacent, applying the merges IN TABLE ORDER — each to
    fixpoint — is exactly equivalent to the greedy
    lowest-rank-first loop, and both equal a delimiter-string
    ``replace()`` fixpoint: tokens are joined as ``|t1|t2|…|`` and pair
    (a,b) is the substring ``|a|b|`` → ``|ab|``, Python's left-to-right
    non-overlapping replace matching BPE's in-pass scan.  That same
    walk is restatable one-to-one in SQL (recursive CTE over
    ``contains``/``replace``) — see the catalog oracle.

    Runs as an Arrow-batched pandas UDF over the DISTINCT piece frame
    — the standard word-cache trick: at corpus scale the Python path
    touches only the vocabulary (|distinct words|, ~10⁶–10⁷ for web
    text), never the corpus; per-occurrence costs stay JVM-side in the
    piece-count aggregation.  Pieces must not contain ``|`` (the
    caller restricts to ``[a-z]+`` runs).
    """
    from pyspark.sql.functions import pandas_udf

    merge_strs = tuple((f"|{a}|{b}|", f"|{a}{b}|") for a, b in merges)

    @pandas_udf("array<string>")
    def _bpe(s: pd.Series) -> pd.Series:
        def walk(piece: str) -> list[str]:
            t = "|" + "|".join(piece) + "|"
            for pat, rep in merge_strs:
                while pat in t:
                    t = t.replace(pat, rep)
            return t.strip("|").split("|")

        return s.map(walk)

    return pieces.withColumn(out_col, _bpe(F.col(piece_col)))


def bpe_token_counts(
    df: DataFrame,
    merges: tuple[tuple[str, str], ...] = DEFAULT_BPE_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide BPE token histogram → (token, n_occurrences).

    Pipeline: lowercase pre-tokenization into pieces with the shared
    :data:`BPE_PIECE_PATTERN` (letter / digit / punctuation runs — the
    GPT-2 pre-tokenizer family), count occurrences per DISTINCT piece
    (one JVM-side explode + groupBy, map-side combined), then BPE-walk
    only the distinct ``[a-z]+`` pieces through
    :func:`bpe_tokenize_pieces`; digit/punctuation pieces pass through
    as atomic tokens (the byte-fallback analogue).  Occurrence counts
    re-weight the per-piece tokens, so the Python path is
    O(vocabulary), not O(corpus) — the design that makes exact token
    accounting affordable at 100 TB.
    """
    pieces = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_PIECE_PATTERN), 0)
        ).alias("piece")
    )
    pc = pieces.groupBy("piece").agg(F.count(F.lit(1)).alias("__n"))
    is_alpha = F.col("piece").rlike("^[a-z]+$")
    walked = bpe_tokenize_pieces(pc.filter(is_alpha), merges=merges)
    alpha_tokens = walked.select(
        F.explode("tokens").alias("token"), F.col("__n")
    )
    atomic = pc.filter(~is_alpha).select(F.col("piece").alias("token"), F.col("__n"))
    return (
        alpha_tokens.unionByName(atomic)
        .groupBy("token")
        .agg(F.sum("__n").alias("n_occurrences"))
    )


def bpe_doc_token_counts(
    df: DataFrame,
    id_col: str,
    merges: tuple[tuple[str, str], ...] = DEFAULT_BPE_MERGES,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Tokenizer-EXACT per-document token counts → (id, ``out_col``).

    The per-document analogue of :func:`bpe_token_counts`, sharing its
    word-cache shape: the BPE walk runs once per DISTINCT lowercase
    piece (O(vocabulary) Python work), per-piece token counts are
    joined back to the per-(doc, piece) occurrence counts JVM-side,
    and a map-side-combinable sum yields each document's exact token
    total.  Documents with no pieces (empty / whitespace-only text)
    count 0.  This is what makes token-budget selection EXACT instead
    of the chars/4 estimate — at 100 TB the UDF cost is still only the
    vocabulary, never the corpus.
    """
    pieces = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_PIECE_PATTERN), 0)
        ).alias("piece"),
    )
    per = pieces.groupBy(id_col, "piece").agg(F.count(F.lit(1)).alias("__n"))
    vocab = per.select("piece").distinct()
    is_alpha = F.col("piece").rlike("^[a-z]+$")
    walked = bpe_tokenize_pieces(vocab.filter(is_alpha), merges=merges).select(
        "piece", F.size("tokens").cast("long").alias("__ntok")
    )
    atomic = vocab.filter(~is_alpha).select(
        "piece", F.lit(1).cast("long").alias("__ntok")
    )
    ptok = walked.unionByName(atomic)
    counts = (
        per.join(ptok, "piece")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__ntok")).alias(out_col))
    )
    return df.select(id_col).join(counts, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col(out_col), F.lit(0)).cast("long").alias(out_col)
    )


def bpe_ptok_sql_ctes(
    merges: tuple[tuple[str, str], ...] = DEFAULT_BPE_MERGES,
    source: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB CTE chain (for a ``WITH RECURSIVE`` prologue) ending in
    ``ptok(piece, ntok)`` — the exact BPE token count of every distinct
    lowercase piece of ``source.text_col``, plus ``docpieces(doc_id,
    piece)``, the per-document piece multiset.

    The walk is the same replace-to-fixpoint-in-table-order recursion
    proven equivalent to greedy BPE in :func:`bpe_tokenize_pieces`
    (and used verbatim by the ``text_bpe_tokenize`` oracle); oracles
    that need per-document exact counts join ``docpieces`` to ``ptok``
    and sum.
    """
    vals = ", ".join(
        f"({i}, '|{a}|{b}|', '|{a}{b}|')" for i, (a, b) in enumerate(merges)
    )
    n = len(merges)
    return f"""
merges(mi, pat, rep) AS (SELECT * FROM (VALUES {vals})),
docpieces AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower({text_col}), '{BPE_PIECE_PATTERN}')) AS piece
  FROM {source}),
vocab AS (SELECT DISTINCT piece FROM docpieces),
walk(piece, s, mi) AS (
  SELECT piece, '|' || array_to_string(regexp_extract_all(piece, '.'), '|') || '|', 0
  FROM vocab WHERE regexp_full_match(piece, '[a-z]+')
  UNION ALL
  SELECT w.piece,
         CASE WHEN contains(w.s, m.pat) THEN replace(w.s, m.pat, m.rep) ELSE w.s END,
         CASE WHEN contains(w.s, m.pat) THEN w.mi ELSE w.mi + 1 END
  FROM walk w JOIN merges m ON m.mi = w.mi),
ptok AS (
  SELECT piece, CAST(LEN(string_split(trim(s, '|'), '|')) AS BIGINT) AS ntok
  FROM walk WHERE mi = {n}
  UNION ALL
  SELECT piece, CAST(1 AS BIGINT) AS ntok FROM vocab
  WHERE NOT regexp_full_match(piece, '[a-z]+'))"""


def bpe_train_merges(
    df: DataFrame, k: int = 10, text_col: str = "text"
) -> DataFrame:
    """LEARN a BPE merges table from the corpus (Sennrich, Haddow &
    Birch 2016) — the training half of the tokenizer story whose
    applying half is :func:`bpe_tokenize_pieces`: k greedy rounds of
    merge-the-most-frequent-adjacent-pair over the word-frequency
    vocabulary.

    → (rank, left_tok, right_tok, pair_count): merge i+1 is learned
    AFTER merge i is applied, so composite operands reference earlier
    outputs — exactly the well-formedness property
    ``DEFAULT_BPE_MERGES`` documents and real merges.txt files have.

    Scale design (the word-cache argument, now for TRAINING): the
    corpus is touched ONCE — one explode + map-side-combinable groupBy
    building the ``[a-z]+`` word-frequency table — and every training
    round after that runs on the VOCABULARY (|distinct words| ~10⁶–10⁷
    at web scale, never corpus rows): one adjacent-pair explode +
    groupBy per round, weighted by word frequency (overlapping
    adjacencies counted, per the reference ``get_stats``), one
    1-row argmax collect (count DESC, then (left, right) lexicographic
    — fully deterministic), and the merge applied by the SAME
    replace-to-fixpoint walk :func:`bpe_tokenize_pieces` uses
    (delimiter-string ``replace`` repeated until the pair is absent).
    One pass is NOT enough: adjacent occurrences share their boundary
    delimiter (``|a|b|a|b|b|`` leaves ``|ab|a|b|b|`` after one pass —
    a divergence our own property sweep caught), so each round loops
    replace-and-recheck; the recheck is a bounded ``limit(1).count()``
    and rounds almost always converge in one or two passes.  Trainer
    and tokenizer thereby share ONE merge-application semantic — the
    self-consistency a retrain-then-retokenize pipeline needs.  (The
    walk coincides with the reference's single zero-width ``re.sub``
    pass everywhere except same-symbol runs ≥5 of an (x,x) merge,
    where re-scanning regroups the run's tail — a documented
    deterministic variant.)  Each round's vocabulary is
    ``localCheckpoint``-ed: k rounds of lineage over a re-derived
    frame would otherwise re-execute the whole prefix per round (the
    kmeans_train/pagerank precedent).  This is how production
    vocabularies are actually trained — GPT-2's BPE was learned from
    word frequencies, not raw text passes.

    Oracle: :func:`bpe_train_sql_ctes` unrolls the same k rounds in
    DuckDB (MATERIALIZED per-round CTEs — each round is referenced
    more than once downstream, and un-materialized inlining is
    exponential in k — plus one small recursive walk per round for
    the fixpoint application).
    """
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = words.select(
        F.concat(
            F.lit("|"), F.regexp_replace("piece", "(.)", "$1|")
        ).alias("toks"),
        "cnt",
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    # pending replace from the previous round, applied (to fixpoint)
    # before this round's pair counts are read
    pat = rep = None
    for rank in range(1, k + 1):
        retrying = False
        while True:
            if pat is not None:
                vocab = vocab.select(
                    F.replace(F.col("toks"), F.lit(pat), F.lit(rep)).alias("toks"),
                    "cnt",
                ).localCheckpoint()
            if retrying:
                # non-first replace pass (ADVICE r17 #2): the fused
                # argmax below would re-pay the full pair explode /
                # groupBy aggregation once per extra pass on corpora
                # with long same-pair runs — but a retry pass only
                # needs the cheap contains probe; the argmax runs once
                # on the converged vocabulary when the loop exits
                again = vocab.agg(
                    F.max(F.col("toks").contains(pat)).alias("again")
                ).collect()[0]["again"]
                if again:
                    continue
            pairs = (
                vocab.select(
                    F.split(F.expr("trim(BOTH '|' FROM toks)"), "\\|").alias("l"),
                    "cnt",
                )
                .select(
                    # size(l) == 1 must yield NO pairs: Spark's
                    # sequence(1, 0) DESCENDS instead of being empty
                    F.explode(
                        F.expr(
                            "CASE WHEN size(l) >= 2 THEN"
                            " transform(sequence(1, size(l) - 1),"
                            " j -> struct(element_at(l, j) AS a,"
                            " element_at(l, j + 1) AS b))"
                            " ELSE array() END"
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("pc"))
            )
            sel = pairs.orderBy(F.desc("pc"), "a", "b").limit(1)
            if pat is None or retrying:
                # rank 1 has no pending pattern; a retry pass already
                # proved convergence with the cheap probe above —
                # either way the argmax runs exactly once per round,
                # on the converged vocabulary
                best = sel.collect()
                break
            # FUSED fixpoint check (r17, one job fewer per round): the
            # argmax job also reads "does the previous round's pattern
            # survive one replace pass?" — adjacent occurrences share
            # their boundary '|', so one pass can leave instances.  A
            # flagged round discards this argmax and re-replaces (via
            # the cheap retry probe above, ADVICE r17 #2), so the merge
            # sequence is identical to the check-then-argmax spelling;
            # converged rounds (the common case) pay ONE collect
            # instead of a count job plus a collect.
            flag = vocab.agg(
                F.max(F.col("toks").contains(pat)).alias("again")
            )
            best = sel.crossJoin(flag).collect()
            if best and best[0]["again"]:
                retrying = True
                continue
            # an EMPTY pairs frame proves convergence by itself: a
            # surviving "|a|b|" instance implies an adjacent (a, b)
            # pair, so pairs-empty ⟹ pattern absent (the crossJoin
            # yields no row to read the flag from, and none is needed)
            break
        if not best:
            break
        a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pc"])
        merges.append((rank, a, b, pc))
        pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "rank int, left_tok string, right_tok string, pair_count bigint"
    )


def bpe_train_sql_parts(k: int = 10) -> str:
    """The comma-joined CTE chain of the unrolled DuckDB trainer
    (w0/v0, then p{i}/b{i}/mw{i}/v{i+1} per round — counts, argmax,
    recursive fixpoint merge walk, next vocabulary; non-recursive CTEs
    MATERIALIZED because the round CTEs fan out and DuckDB's default
    inlining would replan an exponentially growing tree).  Must be
    wrapped in ``WITH RECURSIVE``.  Composable: the train-then-
    tokenize oracle appends the apply walk to this chain."""
    parts = [
        """w0 AS MATERIALIZED (
  SELECT piece, COUNT(*) AS cnt
  FROM (SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS piece
        FROM documents)
  GROUP BY piece),
v0 AS MATERIALIZED (
  SELECT '|' || REGEXP_REPLACE(piece, '(.)', '\\1|', 'g') AS toks, cnt
  FROM w0)"""
    ]
    for i in range(k):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT l[j] AS a, l[j + 1] AS b, SUM(cnt) AS pc
  FROM (SELECT STRING_SPLIT(TRIM(toks, '|'), '|') AS l, cnt FROM v{i}),
       UNNEST(GENERATE_SERIES(1, LEN(l) - 1)) AS t(j)
  GROUP BY 1, 2),
b{i} AS MATERIALIZED (
  SELECT a, b, '|' || a || '|' || b || '|' AS pat,
         '|' || a || b || '|' AS rep, pc
  FROM p{i} ORDER BY pc DESC, a, b LIMIT 1),
mw{i}(toks, cnt, st) AS (
  SELECT toks, cnt, 0 FROM v{i}
  UNION ALL
  SELECT CASE WHEN contains(w.toks, b.pat)
              THEN replace(w.toks, b.pat, b.rep) ELSE w.toks END,
         w.cnt,
         CASE WHEN contains(w.toks, b.pat) THEN 0 ELSE 1 END
  FROM mw{i} w, b{i} b WHERE w.st = 0),
v{i + 1} AS MATERIALIZED (SELECT toks, cnt FROM mw{i} WHERE st = 1)"""
        )
    return ",".join(parts)


def bpe_train_sql_union(k: int = 10) -> str:
    """The (rank, left_tok, right_tok, pair_count) union over the
    per-round argmax CTEs of :func:`bpe_train_sql_parts`."""
    return "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS INTEGER) AS rank, a AS left_tok, b AS right_tok,"
        f" CAST(pc AS BIGINT) AS pair_count FROM b{i}"
        for i in range(k)
    )


def bpe_train_sql_ctes(k: int = 10) -> str:
    """DuckDB restatement of :func:`bpe_train_merges`: the word-
    frequency table once, then k unrolled rounds of pair-count →
    deterministic argmax → merge applied by a per-round recursive
    replace-to-fixpoint walk (``mw{i}``: a row re-replaces while the
    pattern is present, then exits with st = 1 — the trainer-side twin
    of the apply oracle's merge walk).  Returns a complete query
    ending in the (rank, left_tok, right_tok, pair_count) union."""
    return "WITH RECURSIVE " + bpe_train_sql_parts(k) + "\n" + bpe_train_sql_union(k)

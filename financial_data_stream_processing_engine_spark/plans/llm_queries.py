"""Catalog entries: LLM-data-pipeline operators over documents /
embeddings (dedup, similarity search, text analysis, multimodal).

Oracle notes:
* shingle/Jaccard/cosine arithmetic is expressed identically on both
  sides (double-precision sequential folds) → bit-exact hashes;
* MinHash-LSH's oracle is the *exact* all-pairs SQL — with (64 hashes,
  16 bands) at threshold 0.8 the per-pair miss probability is ≤4e-8,
  so verified-LSH output equals the exact answer;
* engine-specific hash values (xxhash64 signatures, SimHash bits, HLL
  sketches) are rows-only by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from financial_data_stream_processing_engine_spark.io_utils import load_table
from financial_data_stream_processing_engine_spark.operators import dedup, multimodal, similarity, text
from financial_data_stream_processing_engine_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments (kept next to the Spark ops they mirror)
# ---------------------------------------------------------------------------

#: distinct 3-token shingles of ``text`` (mirrors text.shingles(n=3))
_SH = (
    "LIST_DISTINCT(LIST_TRANSFORM("
    "GENERATE_SERIES(1, GREATEST(LEN(STRING_SPLIT({t}, ' ')) - 2, 1)), "
    "i -> ARRAY_TO_STRING(STRING_SPLIT({t}, ' ')[i:i+2], ' ')))"
)

#: double-precision sequential-fold cosine (mirrors dedup.cosine)
_COS = (
    "(list_reduce(list_transform(list_zip({a}, {b}),"
    " s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x,y) -> x+y)"
    " / NULLIF(sqrt(list_reduce(list_transform({a}, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)), (x,y)->x+y))"
    " * sqrt(list_reduce(list_transform({b}, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)), (x,y)->x+y)), 0))"
)

_EXACT_PAIRS_SQL = f"""
WITH sh AS (SELECT doc_id, {_SH.format(t='text')} AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS DOUBLE)
       / (CAST(LEN(a.s) + LEN(b.s) AS DOUBLE) - CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS DOUBLE))
       AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS DOUBLE)
      / (CAST(LEN(a.s) + LEN(b.s) AS DOUBLE) - CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS DOUBLE)) >= 0.8
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS) + "]"


@register(
    "text_stats",
    sql=f"""
WITH t AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars_actual,
         LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
         LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_unique_tokens,
         LEN(REGEXP_EXTRACT_ALL(text, '[^\\w\\s]')) AS n_punct,
         LEN(REGEXP_EXTRACT_ALL(text, '[0-9]')) AS n_digit,
         LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')), {_STOP_SQL})) AS n_stop
  FROM documents)
SELECT doc_id, n_chars_actual, n_tokens, n_unique_tokens,
       CAST(n_chars_actual - (n_tokens - 1) AS DOUBLE) / NULLIF(n_tokens, 0) AS avg_token_len,
       CAST(n_punct AS DOUBLE) / NULLIF(n_chars_actual, 0) AS punct_ratio,
       CAST(n_digit AS DOUBLE) / NULLIF(n_chars_actual, 0) AS digit_ratio,
       CAST(n_stop AS DOUBLE) / NULLIF(n_unique_tokens, 0) AS stopword_ratio,
       (LEAST(n_tokens / 20.0, 1.0)
        + n_unique_tokens / n_tokens
        + GREATEST(0.0, 1.0 - 4 * (CAST(n_punct AS DOUBLE) / n_chars_actual
                                   + CAST(n_digit AS DOUBLE) / n_chars_actual))) / 3.0
           AS quality_score
FROM t
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistics + pretraining-style quality score.

    Pure per-row expressions — no shuffle at any scale.
    """
    out = text.with_text_stats(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_chars_actual",
        "n_tokens",
        "n_unique_tokens",
        "avg_token_len",
        "punct_ratio",
        "digit_ratio",
        "stopword_ratio",
        "quality_score",
    )


def _marker_hits_sql(lang: str) -> str:
    markers = "[" + ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang]) + "]"
    return (
        f"LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), "
        f"t -> LIST_CONTAINS({markers}, t)))"
    )


# CASE-chain equivalent of the operator's scan-order argmax: the winner
# is the FIRST language in (en, de, es, fr) whose hit count equals the
# maximum (later languages replace only on strictly-greater scores).
_LANG_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         {_marker_hits_sql('en')} AS h_en,
         {_marker_hits_sql('de')} AS h_de,
         {_marker_hits_sql('es')} AS h_es,
         {_marker_hits_sql('fr')} AS h_fr,
         LEN(REGEXP_EXTRACT_ALL(text, '[一-鿿]')) AS n_cjk,
         LENGTH(text) AS n_chars
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN n_cjk * 2 > n_chars THEN 'zh'
            WHEN GREATEST(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
            WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
            WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
            WHEN h_es >= h_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM h
"""


@register("text_language_id", sql=_LANG_SQL)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker/charset language ID (see operators.text.with_language_id).

    Oracle: the same marker-count argmax expressed as a SQL CASE chain;
    classification behavior on real multilingual samples is additionally
    golden-tested in tests/test_llm_ops.py.
    """
    out = text.with_language_id(_docs(spark, sf_dir))
    return out.select("doc_id", "lang", "lang_pred")


@register(
    "text_fingerprints",
    sql=f"""
SELECT doc_id,
       MD5(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g')) AS md5_full,
       LIST_AGGREGATE(LIST_TRANSFORM({_SH.format(t='text')}, s -> MD5(s)), 'min')
           AS min_shingle_fp
FROM documents
""",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: normalized-text md5 + winnowing-style
    minimum shingle hash (md5-based → engine-portable)."""
    out = text.with_fingerprints(_docs(spark, sf_dir))
    return out.select("doc_id", "md5_full", "min_shingle_fp")


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    sql="""
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
FROM documents d
JOIN (SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text) k
  ON d.text = k.text AND d.doc_id = k.doc_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the minimum doc_id per distinct text."""
    out = dedup.dedup_exact(_docs(spark, sf_dir), key_cols=["text"], id_col="doc_id")
    return out.select("doc_id", "text", "lang", "source", "n_chars")


@register("dedup_ngram_jaccard", sql=_EXACT_PAIRS_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram Jaccard near-dup pairs (threshold 0.8).

    Quadratic validation oracle for the LSH path — same output schema.
    """
    return dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", n=3, threshold=0.8
    )


@register("dedup_minhash_lsh", sql=_EXACT_PAIRS_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands) near-dup pairs, exact-verified.

    The scale path: linear in corpus size.  Oracle = the exact
    all-pairs SQL; miss probability ≤4e-8 per qualifying pair.
    """
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir),
        id_col="doc_id",
        text_col="text",
        n=3,
        num_hashes=64,
        bands=16,
        threshold=0.8,
    )


@register("dedup_simhash", sql=None)  # simhash bits are engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup candidate pairs within hamming ≤ 3,
    found by 16-bit chunk banding (pigeonhole-complete).

    Rows-only: the fingerprints derive from xxhash64.  Pair recall vs
    the Jaccard ground truth is asserted in tests/test_llm_ops.py.
    """
    return dedup.simhash_pairs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", max_hamming=3
    )


@register(
    "dedup_embedding_cosine",
    sql=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS.format(a='a.embedding', b='b.embedding')} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.3
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup pairs (cosine ≥ 0.3 on this corpus —
    the fixture's 10 classes are far apart, max pairwise ≈0.37).

    Brute pairs at validation scale; at corpus scale the same operator
    runs within sign-LSH buckets (similarity.random_hyperplane_buckets).
    """
    return dedup.embedding_cosine_pairs(
        _embs(spark, sf_dir), id_col="vec_id", vec_col="embedding", threshold=0.3
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@register(
    "similarity_cosine_topk",
    sql=f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {_COS.format(a='embedding', b='qvec')} AS cos
FROM embeddings, q
ORDER BY cos DESC, vec_id
LIMIT 10
""",
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for the vec_id=0 query vector."""
    embs = _embs(spark, sf_dir)
    query = embs.filter(F.col("vec_id") == 0)
    return similarity.cosine_topk(embs, query, k=10, id_col="vec_id", vec_col="embedding")


@register("similarity_ivf_topk", sql=None)  # ANN: recall<1 by design
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for the same query (label-mean centroids,
    nprobe=3).  Rows-only; recall vs exact top-k asserted in tests."""
    embs = _embs(spark, sf_dir)
    query = embs.filter(F.col("vec_id") == 0)
    centroids = similarity.train_centroids(embs, by="label", vec_col="embedding")
    with_cells = similarity.assign_cells(embs, centroids, vec_col="embedding")
    return similarity.ivf_search(
        with_cells, centroids, query, k=10, nprobe=3, id_col="vec_id", vec_col="embedding"
    )


# ---------------------------------------------------------------------------
# multimodal columns
# ---------------------------------------------------------------------------


@register(
    "multimodal_metadata",
    sql="""
SELECT doc_id AS media_id, 'image' AS kind, 'image/x-fixture' AS mime,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       SHA256(text) AS sha256
FROM documents
""",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + engine-computed typed metadata.

    The fixture has no real image bytes, so the payload is the UTF-8
    encoding of the text column — the plumbing (binary column, length,
    content hash) is identical for real media.
    """
    docs = _docs(spark, sf_dir)
    media = multimodal.as_media(
        docs, id_col="doc_id", payload=F.encode("text", "UTF-8"),
        kind="image", mime="image/x-fixture",
    )
    return media.select(
        "media_id", "kind", F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.sha256").alias("sha256"),
    )


@register("multimodal_image_features", sql=None)  # decode step is stubbed
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas image feature extraction over binary payloads.

    The Arrow batch plumbing is real; the codec is the deterministic
    stand-in (fake=True) because the container has no imaging libs.
    """
    docs = _docs(spark, sf_dir)
    media = multimodal.as_media(
        docs, id_col="doc_id", payload=F.encode("text", "UTF-8"),
        kind="image", mime="image/x-fixture",
    )
    return multimodal.decode_image_features(media, fake=True)


@register("multimodal_frame_sample", sql=None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-offset sampling over 'video' payloads (pure expressions)."""
    docs = _docs(spark, sf_dir)
    media = multimodal.as_media(
        docs, id_col="doc_id", payload=F.encode("text", "UTF-8"),
        kind="video", mime="video/x-fixture",
    )
    return multimodal.sample_frames(media, every_n_bytes=64, max_frames=4)


@register("multimodal_audio_features", sql=None)  # decode step is stubbed
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas audio feature extraction (stubbed codec, real
    Arrow plumbing) — the audio twin of the image path."""
    docs = _docs(spark, sf_dir)
    media = multimodal.as_media(
        docs, id_col="doc_id", payload=F.encode("text", "UTF-8"),
        kind="audio", mime="audio/x-fixture",
    )
    return multimodal.decode_audio_features(media, fake=True)


@register("dedup_embedding_lsh", sql=None)  # recall<1 by design (scale path)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs restricted to sign-LSH buckets — the
    corpus-scale variant of dedup_embedding_cosine (within-bucket
    pairs only: candidate count scales with bucket size, not corpus²).
    Recall vs the exact pairs is asserted in tests/test_llm_ops.py.
    """
    embs = similarity.random_hyperplane_buckets(
        _embs(spark, sf_dir), vec_col="embedding", num_planes=4
    )
    a = embs.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"), "bucket"
    )
    b = embs.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"), "bucket"
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dedup.cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= 0.3)
        .select("id_a", "id_b", "cos")
    )

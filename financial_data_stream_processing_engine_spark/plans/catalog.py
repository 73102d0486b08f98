"""Operator/query catalog — the registry behind ``__spark_entry__.py``.

Each entry pairs a PySpark implementation with (where expressible) the
ANSI-SQL oracle DuckDB runs on the same parquet tables.  Registration
is declarative::

    @register("q_name", sql="SELECT ...")
    def q_name(spark, sf_dir):
        ...return DataFrame

Parity rules (SURVEY.md §7 hard part #2):

* Alias every computed column identically in Spark and SQL — the driver
  sorts columns by name before hashing.
* Floating-point aggregations must be **order-independent** to hash
  stably across engines: sums of doubles go through an exact DECIMAL
  accumulation (``functions.numeric.dsum``) and are cast back to DOUBLE;
  means are computed as exact-sum / count.  Sliding means use an
  explicit lag-chain so the IEEE summation order is identical in both
  engines.
* Timestamps: parquet ns → cast to µs TIMESTAMP on both sides.

Execution contract: a catalog function normally BUILDS a plan and
returns it unexecuted (the driver collects).  A few entries execute
eagerly inside the function by necessity — streaming entries run a
real StreamingQuery to a memory sink, round-trip entries write fixture
files, and invariant-report entries (e.g. ``dedup_embedding_lsh``)
run counts to build their report row.  Those entries return a small
materialized result; callers embedding catalog functions into larger
lazy pipelines should use the underlying ``operators.*`` functions
instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None => driver does rows-only check
    doc: str = ""


QUERIES: dict[str, CatalogQuery] = {}


def register(name: str, sql: str | None = None):
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = CatalogQuery(name=name, fn=fn, sql=sql, doc=fn.__doc__ or "")
        return fn

    return deco


#: Catalog presentation order. The driver's correctness gate walks
#: ``queries()`` in registration order with a bounded budget (50), so
#: the window rotates each round to keep every entry's newest green
#: CORRECTNESS row fresh. Rotation policy (every round): (1) entries
#: new this round; (2) entries whose behavior-relevant code changed
#: after their newest driver row — a changed entry must re-enter the
#: window before its old row counts; (3) the entries whose rows are
#: oldest. Entries not named here keep registration order at the
#: tail, so new operators are never silently dropped.
_PRIORITY: list[str] = [
    # --- round-12 window (first 50 = the driver's check budget) ---
    # Rotation: (1) the 5 entries new this round (the cap); (2) the 3 r11-built
    # entries still awaiting their FIRST driver row (VERDICT r11
    # next-step #1); (3) the 2 Louvain entries whose algorithm changed
    # after their r11 rows (multi-departure admission — rotation rule
    # 2); (4) ALL 28 remaining r7-era rows (VERDICT r11 next-step #2 —
    # after these, no driver row predates r8); (5) the 15
    # alphabetically-first r8-era rows with the remaining slots
    # (12 after the last three new entries took three).
    # new this round: the voiced/music/noise segment classifier
    # composing the short-time audio trio, and the near-dup community
    # capping pipeline (components seed -> Louvain refine -> per-
    # community contribution caps) promoted from the curation demo,
    # the exact-normal-equations OLS quality probe (shared Cramer
    # expression text, no driver linear algebra) with its R² fit
    # certificate, and frame-difference scene-cut detection over the
    # real MJPEG decode path
    "multimodal_audio_segments",
    "pipeline_neardup_communities",
    "text_quality_linear_probe",
    "text_quality_probe_fit",
    "multimodal_video_scene_cuts",
    # first driver rows pending (locally oracle-green since r11)
    "graph_louvain_level2",
    "graph_louvain_level2_modularity",
    "multimodal_audio_zcr",
    # re-entered after the multi-departure admission change (their
    # r11 rows predate it); level2/level2_modularity above cover the
    # same change for the chained entries, and the two index-maintain
    # entries changed by the semi-join fix re-enter via the r7 drain
    # below.  NOT re-entered: graph_truss_*/kcore/pagerank (only the
    # value-neutral System.gc() gating touched their shared module)
    # and the other dedup/text entries (dedup.py untouched).
    "graph_louvain_refine",
    "graph_community_coarsen",
    # the 28 remaining r7-era rows — the freshness-debt tail
    "multimodal_bmp_roundtrip",
    "multimodal_frame_sample",
    "multimodal_image_features",
    "multimodal_jpeg_progressive_roundtrip",
    "multimodal_jpeg_restart_roundtrip",
    "multimodal_jpeg_roundtrip",
    "multimodal_metadata",
    "multimodal_png_16bit_roundtrip",
    "multimodal_png_4bit_roundtrip",
    "multimodal_png_adam7_roundtrip",
    "multimodal_png_roundtrip",
    "pack_sequences_bpe",
    "python_datasource_sink_roundtrip",
    "python_datasource_ticks",
    "scd2_apply_changes",
    "similarity_cosine_topk",
    "similarity_index_maintain",
    "streaming_dedup_exact",
    "streaming_index_maintain",
    "streaming_late_data_metrics",
    "streaming_ma_rowcount",
    "streaming_session_windows",
    "streaming_sliding_mean",
    "streaming_stream_stream_join",
    "text_bpe_tokenize",
    "text_fingerprints",
    "text_language_id",
    "udtf_ngrams",
    # the 15 alphabetically-first r8-era rows (all equally old; the
    # other 34 r8-era rows are queued below for round 13)
    "agg_salted_skew",
    "agg_variance_exact",
    "chunk_documents",
    "clean_filter",
    "cohort_retention",
    "contamination_ngram_overlap",
    "dedup_paragraph_exact",
    "dedup_prefix_jaccard",
    "dedup_simhash",
    "funnel_conversion",
    "graph_clustering_coefficient",
    "graph_kcore_similarity",
    # --- driver check window boundary (first 50 above) ---
    # queued FIRST for round 13: the 37 remaining r8-era rows
    # (graph_triangle_count_similarity ... window_ewma_per_user,
    # alphabetical),
    # then the r9 block — the steady <=4-round freshness horizon
    "graph_triangle_count_similarity",
    "histogram_value_buckets",
    "join_full_outer_nation_activity",
    "join_interval_bursts",
    "join_proximity_binned",
    "ma_alerts",
    "mixture_sample_sources",
    "multimodal_audio_features",
    "multimodal_audio_spectrum",
    "multimodal_gif_roundtrip",
    "multimodal_video_frames_roundtrip",
    "multimodal_wav_roundtrip",
    "multimodal_wav_ulaw_roundtrip",
    "pii_redact_documents",
    "streaming_funnel_conversion",
    "streaming_lm_quality_gate",
    "streaming_tumbling_stats",
    "text_bpe_train",
    "text_bpe_train_tokenize",
    "text_lm_quality_score",
    "text_nb_lang_classifier",
    "text_stats",
    "text_token_counts",
    "tpch_q10_like_returned_items",
    "tpch_q13_like_order_distribution",
    "tpch_q14_like_promo_effect",
    "tpch_q15_like_top_supplier",
    "tpch_q17_like_small_quantity",
    "tpch_q18_like_large_orders",
    "tpch_q19_like_disjunctive",
    "tpch_q22_like_dormant_rich",
    "tpch_q4_like_priority_check",
    "tpch_q6_like_forecast_revenue",
    "tpch_q7_like_nation_volume",
    "tpch_q8_like_market_share",
    "tpch_q9_like_product_profit",
    "window_ewma_per_user",
    # then everything else (r9+-era rows) in registration order — the
    # load_all() tail rule keeps them enumerable without naming each
]


def load_all() -> None:
    """Import every module that registers catalog queries, then apply
    the priority presentation order (see ``_PRIORITY``)."""
    # Imported for their @register side effects.
    from financial_data_stream_processing_engine_spark.plans import (  # noqa: F401
        compat_queries,
        relational_queries,
        llm_queries,
        streaming_queries,
        curation_queries,
        finance_queries,
        tpch_derived,
    )

    # a typo in the hand-maintained rotation list would otherwise
    # silently demote an entry out of the driver's 50-slot check
    # window — fail loudly instead
    unknown = [n for n in _PRIORITY if n not in QUERIES]
    if unknown:
        raise AssertionError(f"_PRIORITY names not in QUERIES: {unknown}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)

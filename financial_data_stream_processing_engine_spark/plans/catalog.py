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
#: ``queries()`` in registration order with a bounded budget, so the
#: highest-signal entries go first: the reference-compat flagship
#: pipeline, then the LLM-data-pipeline family (dedup / similarity /
#: text / multimodal), streaming, the TPC-H shapes, and the remaining
#: relational inventory (each of which also holds a green
#: CORRECTNESS_r01 row). Entries not named here keep registration
#: order at the tail, so new operators are never silently dropped.
_PRIORITY: list[str] = [
    # reference-compat flagship (clean_filter / tpch_q1 hold green
    # CORRECTNESS_r01 rows and are unchanged since, so they yield their
    # window slots to this round's new operators)
    "ma_alerts",
    "pipeline_multisource",
    # LLM data-pipeline family
    "text_stats",
    "text_language_id",
    "text_fingerprints",
    "text_token_counts",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_cluster_canonical",
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "embedding_quantize_int8",
    "multimodal_metadata",
    "multimodal_image_features",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    # streaming (real StreamingQuery → memory sink)
    "streaming_ma_rowcount",
    "streaming_tumbling_stats",
    "streaming_session_windows",
    "streaming_sliding_mean",
    "streaming_stream_stream_join",
    "streaming_dedup_exact",
    # TPC-H shapes (q1/q3/q5 hold green CORRECTNESS_r01 rows already
    # and yield their window slots; they follow the boundary below)
    "tpch_q4_like_priority_check",
    "tpch_q6_like_forecast_revenue",
    "tpch_q7_like_nation_volume",
    "tpch_q8_like_market_share",
    "tpch_q9_like_product_profit",
    "tpch_q10_like_returned_items",
    "tpch_q13_like_order_distribution",
    "tpch_q14_like_promo_effect",
    "tpch_q15_like_top_supplier",
    "tpch_q17_like_small_quantity",
    "tpch_q18_like_large_orders",
    "tpch_q19_like_disjunctive",
    "tpch_q22_like_dormant_rich",
    # joins / sources / shapes first checked this round
    "join_asof_strict",
    "window_ewma_per_user",
    "lateral_top3_orders_per_customer",
    "python_datasource_ticks",
    "scd2_apply_changes",
    # agg entries whose oracles were reworked after round 1
    "agg_approx_distinct",
    "agg_approx_percentiles",
    "agg_collect_ordered",
    "agg_builtin_stats",
    # --- driver check window boundary (first 50 above) ---
    "join_interval_bursts",
    "join_full_outer_nation_activity",
    "json_to_map_explode",
    "clean_filter",
    "tpch_q1_pricing_summary",
    "histogram_value_buckets",
    "profile_events_table",
    "tpch_q3_like_shipping_priority",
    "tpch_q5_like_regional_volume",
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
    )

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)

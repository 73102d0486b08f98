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
#: CORRECTNESS row fresh. Round-3 window: first the 13 entries that
#: have never held a driver row, plus ``sessionization_gaps`` (its code
#: changed after its r1 row — an entry whose implementation changes
#: must re-enter the window before its old row counts); then new
#: operators added this round; then the round-1-era entries whose rows
#: are oldest. Entries not named here keep registration order at the
#: tail, so new operators are never silently dropped.
_PRIORITY: list[str] = [
    # never driver-checked before this round (local-oracle-green only)
    "agg_filter_clause",
    "histogram_value_buckets",
    "join_full_outer_nation_activity",
    "join_interval_bursts",
    "join_salted_skew",
    "json_to_map_explode",
    "multimodal_png_resize",
    "pipeline_pretraining_corpus",
    "profile_events_table",
    "quality_expectations_orders",
    "recursive_cte_month_spine",
    "sort_null_ordering_topn",
    "streaming_ewma",
    # changed after its r1 green row (µs-interval fix) — must re-earn
    "sessionization_gaps",
    # new this round: corpus-curation family
    "chunk_documents",
    "pack_sequences",
    "contamination_ngram_overlap",
    "mixture_sample_sources",
    "quota_per_lang",
    "pii_redact_documents",
    "text_repetition_stats",
    "corpus_select_token_budget",
    # behavior-relevant code changed this round (moving_average
    # uniqueness guard; MinHash hash family; connected_components
    # convergence guard) — old rows no longer count, re-earn now
    "ma_alerts",
    "pipeline_multisource",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "dedup_simhash",
    "similarity_ivf_topk",
    # new this round: baseline-JPEG codec roundtrip + batched ANN
    "multimodal_jpeg_roundtrip",
    "similarity_multiquery_ivf_topk",
    # new this round: financial-analytics family (the reference's
    # domain — candles, VWAP, volatility, bands, RSI, drawdown,
    # cross-symbol correlation, streaming candles)
    "fin_ohlc_daily",
    "fin_vwap_daily",
    "fin_volatility",
    "fin_bollinger_bands",
    "fin_max_drawdown",
    "fin_rsi_cutler",
    "fin_pairwise_correlation",
    "streaming_fin_ohlc",
    # new this round: split/tf-idf/segment-dedup curation ops
    "split_train_holdout",
    "tfidf_top_terms",
    "dedup_paragraph_exact",
    # new this round: 4:4:4 color JPEG decode path
    "multimodal_jpeg_color_roundtrip",
    # new this round: gap-fill resample + product analytics + upsert
    "fin_resample_ffill",
    "cohort_retention",
    "funnel_conversion",
    "merge_upsert_orders",
    # round-1-era entries, unchanged since r1, refreshing their rows
    "agg_distinct_stats",
    "agg_salted_skew",
    "agg_variance_exact",
    "clean_filter",
    # --- driver check window boundary (first 50 above) ---
    "join_anti_no_big_order",
    "join_asof_last_purchase",
    "join_left_customer_orders",
    "join_range_price_bands",
    "join_semi_active_customers",
    # r1-green entries displaced by the finance + curation additions
    # this round; their r1 rows stand (code unchanged since r1) and
    # current-code verification lives in tools/freshness_ledger.json
    "join_star_revenue_by_region",
    "tpch_q1_pricing_summary",
    "tpch_q3_like_shipping_priority",
    "tpch_q5_like_regional_volume",
    "udtf_ngrams",
    "window_distribution_funcs",
    "window_lag_lead_events",
    "window_range_frame",
    "window_rank_orders",
    "window_running_totals",
    "window_topk_per_group",
    # r1-green entries yielding their slots this round: simple scalar /
    # set / reshape shapes whose code is unchanged since r1 and whose
    # current-code verification lives in tools/freshness_ledger.json
    "math_functions",
    "string_functions",
    "date_functions",
    "date_arithmetic",
    "conditional_tiers",
    "roundtrip_csv",
    "roundtrip_json",
    "agg_string_concat",
    "cube_status_priority",
    "explode_tokens",
    "pivot_qty_by_status",
    "rollup_returnflag_status",
    "set_intersect_all",
    "set_ops_customers",
    "topn_orders_global",
    "unpivot_rates",
    "sample_hash_deterministic",
    "scalar_subquery_max_order",
    "json_extract_props",
    "agg_argminmax_bool_bit",
    "agg_percentiles",
    "array_functions_documents",
    "grouping_sets_events",
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

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)

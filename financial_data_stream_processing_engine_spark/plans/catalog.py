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
    # --- round-4 window (first 50 = the driver's check budget) ---
    # new this round: the five previously fixture-blocked TPC-H shapes
    # over derived partsupp / commit+receipt dates
    "tpch_q2_like_min_cost_supplier",
    "tpch_q11_like_important_stock",
    "tpch_q16_like_part_supplier_counts",
    "tpch_q20_like_surplus_suppliers",
    "tpch_q21_like_waiting_suppliers",
    # new this round: indicator family
    "fin_macd",
    "fin_atr",
    "fin_stochastic",
    "fin_rolling_sharpe",
    "fin_zscore_anomalies",
    # new this round: dedup strategies
    "dedup_semantic",
    "dedup_bloom_probe",
    "dedup_substring_spans",
    # new this round: streaming MACD twin, CDC diff + incremental view
    # maintenance, z-order layout, TWAP
    "streaming_fin_macd",
    "cdc_orders_diff",
    "ivm_orders_status_agg",
    "layout_morton_zorder",
    "fin_twap_daily",
    # new this round: table-maintenance pair
    "maintenance_compact_files",
    "schema_evolution_merge_read",
    # new this round: cleaning/outlier ops, streaming top-k, custom
    # sink, PageRank
    "text_unicode_normalize",
    "winsorize_events_value",
    "streaming_topk_users",
    "python_datasource_sink_roundtrip",
    "graph_pagerank_similarity",
    # new this round: integer-exact OBV + Donchian channels, streaming
    # z-score alert twin
    "fin_obv",
    "fin_donchian",
    "streaming_zscore_alerts",
    "fin_rolling_beta",
    # behavior-relevant code changed after their newest driver row, so
    # they re-enter the window: minhash signature family moved to the
    # token-hash pipeline (dedup_minhash_lsh, dedup_cluster_canonical);
    # pair ops moved to the Arrow pair-dot path and Jaccard gained the
    # PPJoin length filter (dedup_ngram_jaccard, dedup_embedding_cosine,
    # dedup_embedding_lsh)
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    # round-1-era entries refreshing their oldest rows (32 of 38; the
    # remaining 6 rotate in next round)
    "tpch_q1_pricing_summary",
    "tpch_q3_like_shipping_priority",
    "tpch_q5_like_regional_volume",
    "join_star_revenue_by_region",
    "join_asof_last_purchase",
    "join_left_customer_orders",
    "join_range_price_bands",
    "join_semi_active_customers",
    "window_rank_orders",
    "window_lag_lead_events",
    "window_range_frame",
    "window_running_totals",
    "window_topk_per_group",
    "window_distribution_funcs",
    "agg_argminmax_bool_bit",
    "agg_percentiles",
    # --- driver check window boundary (first 50 above) ---
    "agg_string_concat",
    "array_functions_documents",
    "grouping_sets_events",
    "cube_status_priority",
    "rollup_returnflag_status",
    "pivot_qty_by_status",
    "explode_tokens",
    "udtf_ngrams",
    "json_extract_props",
    "math_functions",
    "string_functions",
    "date_functions",
    "date_arithmetic",
    # r1-green entries yielding their slots until next round: simple
    # scalar/reshape/roundtrip shapes, code unchanged since r1, current-
    # code verification in tools/freshness_ledger.json
    "scalar_subquery_max_order",
    "set_ops_customers",
    "topn_orders_global",
    "conditional_tiers",
    "roundtrip_csv",
    "roundtrip_json",
    "sample_hash_deterministic",
    "set_intersect_all",
    "unpivot_rates",
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

"""Single merged view of every catalog module.

`ALL_QUERIES` / `ALL_ORACLES` are what __spark_entry__, the tests and
bench.py consume; add new catalog modules here and everywhere picks
them up. A name collision across modules is a bug — guarded at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (catalog, catalog_analytics, catalog_corpus, catalog_ext,
               catalog_multimodal, catalog_stream, catalog_ts, tpch)

_QUERY_PARTS = (
    catalog.SPARK_QUERIES,
    catalog_ext.SPARK_QUERIES_EXT,
    catalog_ts.SPARK_QUERIES_TS,
    tpch.SPARK_QUERIES_TPCH,
    catalog_stream.SPARK_QUERIES_STREAM,
    catalog_analytics.SPARK_QUERIES_ANALYTICS,
    catalog_corpus.SPARK_QUERIES_CORPUS,
    catalog_multimodal.SPARK_QUERIES_MULTIMODAL,
)
_ORACLE_PARTS = (
    catalog.ORACLE_SQL,
    catalog_ext.ORACLE_SQL_EXT,
    catalog_ts.ORACLE_SQL_TS,
    tpch.ORACLE_SQL_TPCH,
    catalog_stream.ORACLE_SQL_STREAM,
    catalog_analytics.ORACLE_SQL_ANALYTICS,
    catalog_corpus.ORACLE_SQL_CORPUS,
    catalog_multimodal.ORACLE_SQL_MULTIMODAL,
)

_MERGED: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _part in _QUERY_PARTS:
    for _name in _part:
        if _name in _MERGED:
            raise RuntimeError(f"duplicate catalog query name {_name!r}")
    _MERGED.update(_part)

# The external correctness driver hashes the FIRST 50 keys of `queries()`
# in insertion order.  Queries that never received a driver row in round
# 1 (plus any whose implementation changed since and therefore need a
# fresh row) are listed here so they land inside that window; round-1
# green rows for the rest stay on record in CORRECTNESS_r01.json.
_CHECK_FIRST = [
    # never driver-checked in round 1
    "candle_gaps", "retention_cohorts", "vwap", "bollinger", "stochastic",
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q10_returned_items", "q14_promo_effect", "q18_large_orders",
    "q19_discounted_revenue", "q8_market_share", "q9_product_profit",
    "q13_customer_distribution", "q15_top_supplier", "q17_small_quantity",
    "q22_global_sales_opportunity", "streaming_candles", "sessionize",
    # approx_distinct_users is rows-only (weakest driver signal) —
    # deferred behind the oracle-paired queries
    "daily_active_users", "price_quantiles",
    "ngram_doc_frequency", "candle_resample_salted", "range_join",
    "event_type_pivot", "volume_rollup", "funnel", "tfidf_top_terms",
    # red in round 1 (oracle type fix) — needs a fresh row
    "candle_rollup",
    # implementation changed in round 2 — needs a fresh row
    "dedup_embedding", "dedup_ngram_jaccard", "dedup_components",
    "dedup_minhash_lsh", "dedup_simhash_pairs", "clean_series",
    # new in round 2
    "grouped_scale", "model_score", "repetition_score", "dedup_keep",
    "streaming_dedup", "corpus_curation",
    "q2_min_cost_supplier", "q11_important_stock", "q12_priority_shipping",
    "q16_supplier_cnt", "q20_part_promotion", "q21_suppliers_kept_waiting",
    "doc_chunk", "token_packing",
    # (first-50 window now full. Round-3 window should front, in
    #  roughly this order: kmeans_assign, candle_upsert, decontaminate,
    #  pii_scrub, multimodal_meta, multimodal_frames, max_drawdown,
    #  rolling_correlation, streaming_late_candles, candle_grid_fill,
    #  cross_sectional_rank, mixture_resample, value_histogram,
    #  stratified_sample,
    #  text_normalize, corpus_stats, approx_distinct_users — everything
    #  added after the r2 window filled, all locally parity-green at
    #  sf0.001 and sf0.01.)
]

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _name in _CHECK_FIRST:
    if _name in _MERGED:
        ALL_QUERIES[_name] = _MERGED[_name]
for _name, _fn in _MERGED.items():
    if _name not in ALL_QUERIES:
        ALL_QUERIES[_name] = _fn

ALL_ORACLES: dict[str, str] = {}
for _part in _ORACLE_PARTS:
    ALL_ORACLES.update(_part)

_unknown = set(ALL_ORACLES) - set(ALL_QUERIES)
if _unknown:
    raise RuntimeError(f"oracle without query: {sorted(_unknown)}")

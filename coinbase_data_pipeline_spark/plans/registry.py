"""Single merged view of every catalog module.

`ALL_QUERIES` / `ALL_ORACLES` are what __spark_entry__, the tests and
bench.py consume; add new catalog modules here and everywhere picks
them up. A name collision across modules is a bug — guarded at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (catalog, catalog_analytics, catalog_corpus, catalog_ext,
               catalog_multimodal, catalog_pred, catalog_stream,
               catalog_ts, tpch)

_QUERY_PARTS = (
    catalog.SPARK_QUERIES,
    catalog_ext.SPARK_QUERIES_EXT,
    catalog_ts.SPARK_QUERIES_TS,
    tpch.SPARK_QUERIES_TPCH,
    catalog_stream.SPARK_QUERIES_STREAM,
    catalog_analytics.SPARK_QUERIES_ANALYTICS,
    catalog_corpus.SPARK_QUERIES_CORPUS,
    catalog_multimodal.SPARK_QUERIES_MULTIMODAL,
    catalog_pred.SPARK_QUERIES_PRED,
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
    catalog_pred.ORACLE_SQL_PRED,
)

_MERGED: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _part in _QUERY_PARTS:
    for _name in _part:
        if _name in _MERGED:
            raise RuntimeError(f"duplicate catalog query name {_name!r}")
    _MERGED.update(_part)

# The external correctness driver hashes the FIRST 50 keys of `queries()`
# in insertion order.  Rotation policy, by construction each round:
# (a) queries with NO driver row on current code go first, oldest debt
# first; (b) queries whose implementation or oracle changed this round
# go next; (c) everything else keeps its earlier green row on record in
# CORRECTNESS_r01..r04.json and stays out of the window.  Driver rounds
# r01..r04 map to the repo's work sessions 1..4 (one numbering scheme).
#
# ROUND-8 WINDOW (the rotation VERDICT r07 item #1 ordered): (a) the
# two queries whose code changed after their latest driver rows —
# streaming_upsert (sinks/tables.py marker atomicity, r07 change,
# last row r06) and streaming_candles (r06 replay plumbing, row still
# r02); (b) brand-new round-8 queries; (c) queries whose plans
# changed in round 8 — the link-mode dedup family (lazy-checkpoint
# rework of cap_hot_buckets/minhash_lsh_pairs_vs), the carry_masks
# parameter threading through every banded join (default plan
# identical, rows re-confirm the refactor is inert), and
# streaming_model_score (cross-chunk sort fix, ADVICE r07); (d) the
# remaining slots drain the OLDEST green rows first — the r01 ledger
# entries, then the r02 TPC-H/analytics block. Everything else keeps
# its green driver row from CORRECTNESS_r01..r07 on unchanged code.
_CHECK_FIRST = [
    # (a) changed-after-row debt, oldest first
    "streaming_candles", "streaming_upsert",
    # (b) new round-8 queries:
    # - walk-forward VALIDATION-scored Holt sweep (optimize_model.py
    #   scores trials on a held-out split; holt_param_sweep was the
    #   in-sample variant — pytest pins their argmin divergence).
    "holt_cv_sweep",
    # - service status/health report (prediction_service.py:324
    #   _health_check + :353 get_status): per (product, model) ages
    #   vs data-anchored now, scored/pending counts, is_healthy.
    "service_health",
    # - horizon-1 read path (predictor.py:280 predict_single_step),
    #   numerically identical to model_score's h=1 rows.
    "predict_single_step",
    # (c) round-8-changed plans: the lazy-checkpoint dedup family, the
    # carry_masks threading, the chunk-sort streaming fix — plus the
    # fuzz-found fixes (bpe fully-merged-word guard, text_normalize
    # oracle NULL→'' coalesce, dedup_embedding count semantics) and
    # ann_lsh's first-match-band candidate migration.
    "streaming_model_score",
    "dedup_minhash_lsh", "dedup_simhash_pairs", "knn_graph",
    "dedup_embedding", "dedup_incremental",
    "dedup_components", "dedup_keep", "dedup_keep_best",
    "corpus_curation",
    "bpe_train", "bpe_encode", "text_normalize", "ann_lsh",
    # (d) oldest-green-first refresh: the eleven r01 rows...
    "candle_parse", "macd_approx", "top_k", "dedup_exact",
    "prediction_horizon_eval", "scale_fit_transform",
    "embedding_centroids", "lang_id", "quality_score", "token_count",
    "doc_fingerprint",
    # ...then the r02 TPC-H block (unchanged code, six-round-old
    # evidence)...
    "q4_order_priority", "q10_returned_items", "q14_promo_effect",
    "q18_large_orders", "q8_market_share", "q9_product_profit",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_quantity", "q22_global_sales_opportunity",
    "q2_min_cost_supplier", "q11_important_stock",
    "q12_priority_shipping", "q16_supplier_cnt", "q20_part_promotion",
    "q21_suppliers_kept_waiting",
    # ...then the oldest r02 analytics/time-series rows up to the
    # driver's 50-slot window (the four r08-changed entries above
    # displaced retention_cohorts/bollinger/stochastic/
    # daily_active_users — unchanged code, their r02 rows stand).
    "clean_series", "candle_rollup", "grouped_scale", "candle_gaps",
]

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ALL_ORACLES: dict[str, str] = {}
for _part in _ORACLE_PARTS:
    ALL_ORACLES.update(_part)

for _name in _CHECK_FIRST:
    # a typo here would silently burn a driver-check slot; rows-only
    # queries (no oracle) would burn one with `err: no_oracle`
    if _name not in _MERGED:
        raise RuntimeError(f"_CHECK_FIRST name not in catalog: {_name!r}")
    if _name not in ALL_ORACLES:
        raise RuntimeError(f"_CHECK_FIRST name is rows-only: {_name!r}")
    ALL_QUERIES[_name] = _MERGED[_name]
# oracle-paired queries fill the rest of the driver window...
for _name, _fn in _MERGED.items():
    if _name not in ALL_QUERIES and _name in ALL_ORACLES:
        ALL_QUERIES[_name] = _fn
# ...and rows-only queries (approx_distinct_users, ann_ivf — the two
# with no oracle by declared design) sit STRUCTURALLY last — they can
# never occupy a slot in the driver's first-50 window regardless of
# catalog ordering.
for _name, _fn in _MERGED.items():
    if _name not in ALL_QUERIES:
        ALL_QUERIES[_name] = _fn

_unknown = set(ALL_ORACLES) - set(ALL_QUERIES)
if _unknown:
    raise RuntimeError(f"oracle without query: {sorted(_unknown)}")

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
# ROUND-9 WINDOW (the consolidation rotation VERDICT r08 ordered):
# (a) the two new round-9 queries — prediction_cadence (the
# prediction_worker/force_prediction cadence audit) and
# curriculum_dropout (the data loader's deterministic feature-dropout
# relation); (b) every query whose plan or oracle changed in round 9 —
# service_health (minute-truncated age semantics, ADVICE r08),
# validate_input (numeric-domain audit columns), ann_lsh (carry_masks
# threading through lsh_topk — default plan identical, the row
# re-confirms the refactor is inert), funnel (broadcast hints), and
# the three stateful replay layouts that now thread REPLAY_CUTS
# through _time_buckets (default path plan-identical);
# (c) the 26 stale r02/r03 rows VERDICT r08 listed — unchanged code,
# five-to-six-round-old driver evidence, the only ledger gap left;
# (d) the oldest r04 rows for the remaining slots. Everything else
# keeps its green driver row from CORRECTNESS_r01..r08 on unchanged
# code.
_CHECK_FIRST = [
    # (a) new round-9 queries
    "prediction_cadence", "curriculum_dropout",
    # (b) round-9-changed plans/oracles (event_paths: the top-K
    # TakeOrdered rewrite of the old unpartitioned rank window)
    "service_health", "validate_input", "ann_lsh", "funnel",
    "streaming_sessionize", "streaming_kmv", "streaming_model_score",
    "event_paths", "q15_top_supplier", "kmv_set_ops",
    # (c) the 26 stale r02/r03 rows (funnel already above): r02 first
    "bollinger", "stochastic", "retention_cohorts",
    "daily_active_users", "price_quantiles", "ngram_doc_frequency",
    "candle_resample_salted", "event_type_pivot", "volume_rollup",
    "tfidf_top_terms", "repetition_score", "doc_chunk",
    # ...then r03
    "sessionize", "range_join", "value_histogram", "max_drawdown",
    "rolling_correlation", "candle_grid_fill", "multimodal_meta",
    "multimodal_frames", "pii_scrub", "decontaminate",
    "stratified_sample", "mixture_resample", "corpus_stats",
    # (d) oldest r04 rows fill the remaining slots of the 50-window
    "acf", "approx_quantiles_hist", "association_rules",
    "bm25_search", "candle_patterns", "csv_ingest",
    "dataset_manifest", "donchian_channel", "drawdown_durations",
    "dsir_select", "dsir_weights", "embedding_quantize",
    "fixed_k_sample",
    # (gopher_quality/hopping_volume/keltner_channel displaced by the
    # event_paths/q15/kmv_set_ops changed-code slots; their r04 rows
    # stand on unchanged code)
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

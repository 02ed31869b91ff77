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
# ROUND-7 WINDOW (the rotation VERDICT r06 item #1 ordered): (a) the
# queries whose implementation changed in round 6 but whose latest
# driver row predates that change — candle_upsert (merge path
# refactored in operators/candles.py, last row r03) and the streaming
# replay family (streaming/pipelines.py and catalog_stream.py were
# reworked in r06; only streaming_upsert got an r06 row); (b) queries
# changed in round 7; (c) brand-new round-7 queries. Everything else
# keeps its green driver row from CORRECTNESS_r01..r06 on unchanged
# code and stays out of the window.
_CHECK_FIRST = [
    # (a) r06-changed code owing a current-code driver row. All were
    # green in the r06 session's full parity sweep; only the driver's
    # own ledger lags. Oldest debt (candle_upsert, r03) first.
    "candle_upsert",
    "streaming_late_candles", "streaming_sessionize",
    "streaming_sessionize_watermark", "streaming_dedup",
    "streaming_dedup_watermark", "streaming_hopping",
    "streaming_touch_join", "streaming_kmv",
    "streaming_corpus_scores", "streaming_classifier_scores",
    # (b) changed in round 7:
    # - the banded-join consumers gained the optional strong-recall
    #   mask mode (dedup.CARRY_MASKS, ADVICE r06). The DEFAULT mode
    #   compiles to the same plan as r06 (masks off: identical window,
    #   identical predicate), so these rows re-confirm the refactor is
    #   semantically inert on the catalog path.
    "dedup_minhash_lsh", "dedup_simhash_pairs", "knn_graph",
    "dedup_embedding", "dedup_incremental",
    # - the keeper/component decision queries now consume
    #   link_capped=True minhash pairs (star links keep >cap
    #   duplicate families connected; discovered because the sf0.1
    #   corpus has a ~2400-doc family vs the 512 cap). No-op at the
    #   driver's sf0.01 (no bucket binds) but the plan changed.
    "dedup_components", "dedup_keep", "dedup_keep_best",
    "corpus_curation",
    # (c) brand-new round-7 queries are appended below as they land.
    # - inverse-scaler denormalization (reference predictor.py:239
    #   _denormalize_predictions): invert fitted robust/minmax stats
    #   back to price space on model_score output.
    "denormalize_predictions",
    # - prediction-store retention (reference data_writer.py:290
    #   cleanup_old_predictions): partition-pruned age-out + audit.
    "prediction_retention",
    # - per-(product, model) prediction-stats rollup (reference
    #   data_writer.py:315 get_prediction_stats).
    "prediction_stats",
    # - distributed Holt/Holt-Winters (α, β) grid sweep scored by MAE,
    #   argmin per product (reference optimize_model.py's Optuna loop
    #   re-expressed as a deterministic grid).
    "holt_param_sweep",
    # - model_metrics table rows (reference data_writer.py:189
    #   write_model_metrics): per (product, model, horizon)
    #   MAE/RMSE/MAPE/dir-acc/sample_count, fixed-point sums.
    "model_metrics",
    # - trailing-24h LIMIT-1000 read (reference data_writer.py:242
    #   get_recent_predictions) via WindowGroupLimit.
    "recent_predictions",
    # - per-product temporal train/test split (reference
    #   data_loader.py:284, split_idx = int(len * train_ratio)).
    "train_test_split",
    # - predictor input gate as a per-product validation report
    #   (reference predictor.py:346 validate_input_data).
    "validate_input",
    # - expanding-window walk-forward CV fold manifest (the
    #   optimize_model.py evaluation harness; K rows per product, not
    #   K data copies).
    "walk_forward_splits",
    # - the prediction loop ON the stream: per-product ring-buffer
    #   state (applyInPandasWithState), bit-identical to the batch
    #   model_score oracle (shared verbatim).
    "streaming_model_score",
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

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
# in insertion order.  STANDING ROTATION RULE (VERDICT r10 #8, also
# emitted into SURVEY §4 by tools/gen_index.py, which prints the
# due-for-rotation list on every regen): each round's window is
# (a) queries with NO driver row ever, (b) queries whose compute or
# oracle changed this round, (c) everything else OLDEST-EVIDENCE-
# FIRST — so no oracle-paired query's driver evidence ages past 5
# rounds (amended from 4 in r12 per ADVICE r11: 204 queries over 50
# slots is a 4.1-round cycle, and (a)/(b) preemption makes 5 the
# honest worst case the old text understated). Driver rounds
# r01..r04 map to the repo's work sessions 1..4 (one numbering
# scheme).
#
# ROUND-12 WINDOW: (a) none — every oracle-paired query has a driver
# row as of r11;
# (b) compute changed in round 12 — the streaming replay fixed-cost
# work (VERDICT r11 #1): streaming_sessionize +
# streaming_sessionize_watermark (columnar emit, 16 state
# partitions), streaming_kmv + streaming_model_score (16 state
# partitions; model_score also swaps its serve-side alignment gate
# from a full-sink dense_rank to a collect_set cutoff join —
# hash-verified identical in-session), streaming_touch_join (4 state
# partitions), streaming_upsert (one on-time cycle + the late cycle;
# anti-join merge path), streaming_late_candles (one on-time batch +
# the late batch — in the r07 block below); dedup_ngram_jaccard
# (candidate generation rewritten from length buckets to the lossless
# prefix-prefix filter — output-identical by construction, 36-config
# fuzz + sf0.001/0.01 hash parity in-session, but the driver gate is
# the evidence that counts); dedup_containment (corpus-scale join
# sides guarded from static broadcast after the two-decade probe
# OOMed them at 500k docs — since session 3 via the measured-bytes
# _corpus_join_hint, broadcast under 16 MB of text, shuffle_hash
# beyond — output unchanged, plan changed);
# (c) the 11 r07 rows (exactly 5 rounds old — the amended bound's
# worst case), then 32 of the remaining 45 r08 rows alphabetically;
# the 13 r08 leftovers rotate in r13 at age 5.
_CHECK_FIRST = [
    # (b) round-12-changed compute (replay fixed-cost work + the
    # ngram prefix-filter rewrite)
    "streaming_sessionize", "streaming_sessionize_watermark",
    "streaming_kmv", "streaming_model_score", "streaming_upsert",
    "dedup_ngram_jaccard", "dedup_containment",
    # (c) oldest evidence first: the r07 block (includes the
    # r12-changed streaming_late_candles and streaming_touch_join)
    "streaming_dedup_watermark", "streaming_hopping",
    "streaming_late_candles", "streaming_touch_join", "ticker_parse",
    "time_features", "time_range_fetch", "train_test_split",
    "volatility", "volume_features", "walk_forward_splits",
    # r08 rows (first 32 alphabetically; the 13 leftovers rotate r13)
    "bpe_encode", "bpe_train", "candle_gaps", "candle_parse",
    "candle_rollup", "clean_series", "corpus_curation",
    "dedup_components", "dedup_embedding", "dedup_exact",
    "dedup_incremental", "dedup_keep", "dedup_keep_best",
    "dedup_minhash_lsh", "dedup_simhash_pairs", "doc_fingerprint",
    "embedding_centroids", "grouped_scale", "holt_cv_sweep",
    "knn_graph", "lang_id", "macd_approx", "predict_single_step",
    "prediction_horizon_eval", "q10_returned_items",
    "q11_important_stock", "q12_priority_shipping",
    "q13_customer_distribution", "q14_promo_effect",
    "q16_supplier_cnt", "q17_small_quantity", "q18_large_orders",
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
# ...and rows-only queries (approx_distinct_users — the one with no
# oracle by declared design) sit STRUCTURALLY last — they can
# never occupy a slot in the driver's first-50 window regardless of
# catalog ordering.
for _name, _fn in _MERGED.items():
    if _name not in ALL_QUERIES:
        ALL_QUERIES[_name] = _fn

_unknown = set(ALL_ORACLES) - set(ALL_QUERIES)
if _unknown:
    raise RuntimeError(f"oracle without query: {sorted(_unknown)}")
